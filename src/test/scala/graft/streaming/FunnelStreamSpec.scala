package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Funnel, FunnelEvent}

/** s18 invariants: the streamed funnel's sealed-prefix DP must agree
  * with the batch DP when chains SPAN micro-batches and when the
  * watermark has already sealed the chain's early steps. (End-to-end
  * parity with x49's oracle is the driver's hash check; these pin the
  * cross-batch mechanics on controlled fixtures.) */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = 3600L * 1000000L
  private val steps = Seq("view", "click", "purchase")

  /** Drive the streamed funnel over explicit micro-batches; returns the
    * final level per user (levels are monotone, so max == last). */
  private def run(name: String, tws: Boolean = false)
                 (batches: Seq[FunnelEvent]*): Map[Long, Int] = {
    val input = MemoryStream[FunnelEvent](spark)
    val withTime = input.toDS()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "10 seconds")
      .as[FunnelEvent]
    val levels =
      if (tws) Funnel.streamFunnelTws(withTime, steps, W)
      else Funnel.streamFunnel(withTime, steps, W)
    val q = levels
      .toDF("user_id", "funnel_level")
      .writeStream.outputMode("update")
      .format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory(s"ck_$name").toString)
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      spark.table(name).groupBy("user_id").agg(max("funnel_level").as("lvl"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    } finally q.stop()
  }

  /** Run `f` with the RocksDB state store provider (transformWithState
    * requires it), restoring the previous provider afterwards. */
  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def sec(s: Long) = s * 1000000L

  test("s18: chain spanning micro-batches completes after the anchor is sealed") {
    // Batch 1: the view, plus a far-future event from another user that
    // drags the watermark PAST the view — so by batch 2 the view has
    // been folded into the sealed anchors and the buffer is empty.
    // Batch 2: click + purchase extend the SEALED anchor within its
    // 1-hour window.
    val lv = run("s18_span")(
      Seq(FunnelEvent(1L, sec(1000), 1L, "view"),
          FunnelEvent(9L, sec(2000), 2L, "view")),
      Seq(FunnelEvent(1L, sec(1200), 3L, "click"),
          FunnelEvent(1L, sec(1400), 4L, "purchase")))
    assert(lv(1L) == 3, s"sealed anchor did not extend across batches: $lv")
    assert(lv(9L) == 1)
  }

  test("s18: provisional emissions are monotone and the last equals the batch DP") {
    // Same user's steps drip-fed one per batch.
    val lv = run("s18_drip")(
      Seq(FunnelEvent(1L, sec(100), 1L, "view")),
      Seq(FunnelEvent(1L, sec(200), 2L, "click")),
      Seq(FunnelEvent(1L, sec(300), 3L, "purchase")))
    assert(lv(1L) == 3)
    val emitted = spark.table("s18_drip").filter(col("user_id") === 1L)
      .select("funnel_level").as[Int].collect().sorted
    assert(emitted.sameElements(Array(1, 2, 3)), "levels must grow 1→2→3 across batches")
  }

  test("s18: expired-window chain stays incomplete across batches") {
    // click arrives 2 h after the only view — crosses batches but must
    // NOT complete (window is 1 h); a second view then rescues it.
    val lv = run("s18_exp")(
      Seq(FunnelEvent(1L, sec(0), 1L, "view")),
      Seq(FunnelEvent(1L, sec(7200), 2L, "click")),
      Seq(FunnelEvent(1L, sec(7300), 3L, "view")),
      Seq(FunnelEvent(1L, sec(7400), 4L, "click")))
    assert(lv(1L) == 2)
  }

  test("s18: out-of-order WITHIN the watermark horizon is re-sorted") {
    // Both events in one batch, reversed arrival order; the buffer sort
    // must restore (ts, id) order so the chain completes.
    val lv = run("s18_ooo")(
      Seq(FunnelEvent(1L, sec(200), 2L, "click"),
          FunnelEvent(1L, sec(100), 1L, "view")))
    assert(lv(1L) == 2)
  }

  test("s18: transformWithState engine matches flatMapGroupsWithState across batches") {
    // Same WATERMARK-CONFORMANT drip through BOTH engines (TWS in
    // EventTime mode enforces the late-drop the watermark promises, so
    // parity is defined over conformant streams) — cross-batch sealed
    // chains and an expired chain must agree exactly.
    def drive(tws: Boolean) = run(s"s18_eng_$tws", tws)(
      Seq(FunnelEvent(1L, sec(1000), 1L, "view"),
          FunnelEvent(9L, sec(1010), 2L, "view")),
      Seq(FunnelEvent(1L, sec(1015), 3L, "click")),
      Seq(FunnelEvent(1L, sec(1020), 4L, "purchase"),
          FunnelEvent(2L, sec(1030), 5L, "view")),
      Seq(FunnelEvent(2L, sec(1030 + 7200), 6L, "click"))) // 2 h later: expired
    val viaFmgws = drive(tws = false)
    val viaTws = withRocksDb { drive(tws = true) }
    assert(viaFmgws == viaTws, s"engines diverge: fmgws=$viaFmgws tws=$viaTws")
    assert(viaFmgws(1L) == 3 && viaFmgws(9L) == 1 && viaFmgws(2L) == 1)
  }

  test("s18: stragglers below the key's sealed boundary are dropped by BOTH engines") {
    // Batch 1: u9 drags the watermark to ~19990 s while u1's view waits
    // in the buffer. Batch 2: u1 is processed at the high watermark —
    // the view seals, u1's seal boundary advances to 19990 s. Batch 3:
    // a click@1200 s straggler arrives BELOW that boundary. Folding it
    // would resurrect the view→click chain AFTER the view was sealed
    // past it (silent order corruption); the transition must drop it —
    // matching the drop transformWithState performs at the engine.
    def drive(tws: Boolean) = run(s"s18_late_$tws", tws)(
      Seq(FunnelEvent(1L, sec(1000), 1L, "view"),
          FunnelEvent(9L, sec(20000), 2L, "view")),
      Seq(FunnelEvent(1L, sec(25000), 3L, "click")), // >1 h after view: no chain
      Seq(FunnelEvent(1L, sec(1200), 4L, "click")))  // below u1's sealed boundary
    val viaFmgws = drive(tws = false)
    val viaTws = withRocksDb { drive(tws = true) }
    assert(viaFmgws == viaTws, s"late-drop policy diverges: $viaFmgws vs $viaTws")
    assert(viaFmgws(1L) == 1, "straggler below the seal boundary must be dropped")
  }

  test("funnelStep property: buffer stays (ts,id)-sorted and the final level equals the batch DP") {
    // The O(B+A) merge in funnelStep RELIES on the buffer being sorted
    // across triggers (it only sorts arrivals). Drive the transition
    // directly with seeded-random trigger partitions and adversarial
    // within-trigger order; after every step assert the invariant, and
    // at the end assert parity with the one-pass batch DP.
    val stepArr = steps.toArray
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 0 until 25) {
      val n = 40 + rnd.nextInt(60)
      val events = (0 until n).map { i =>
        FunnelEvent(1L, sec(rnd.nextInt(10000)).abs, i.toLong,
          stepArr(rnd.nextInt(stepArr.length)))
      }

      // streamed: random trigger slicing, shuffled within trigger, with
      // the watermark trailing the max event time seen so far. Arrivals
      // at/before the trigger's sealed boundary are LATE and dropped by
      // funnelStep (the engine contract) — track the accepted set, the
      // batch reference runs over exactly those.
      var st = Funnel.emptyStreamState(stepArr.length)
      var maxSeen = Long.MinValue
      val accepted = scala.collection.mutable.Buffer[FunnelEvent]()
      val shuffled = rnd.shuffle(events)
      val cuts = (0 until rnd.nextInt(6)).map(_ => rnd.nextInt(n)).sorted
      val triggers = (Seq(0) ++ cuts ++ Seq(n)).distinct.sliding(2)
        .map { case Seq(a, b) => shuffled.slice(a, b) }.toSeq
      triggers.foreach { trig =>
        accepted ++= trig.filter(_.ts_us > st.sealedUs)
        maxSeen = math.max(maxSeen, (trig.map(_.ts_us) :+ maxSeen).max)
        val wm = maxSeen - sec(10) // 10s-trailing watermark, like the query
        val (st2, _) = Funnel.funnelStep(st, trig.iterator, wm, stepArr, W)
        // invariant: the kept buffer is sorted by (ts, id)
        val pairs = st2.bufTs.zip(st2.bufId).toSeq
        assert(pairs == pairs.sortBy(identity),
          s"trial $trial: buffer lost sort order: $pairs")
        assert(st2.bufTs.forall(_ > wm), s"trial $trial: sealed event left in buffer")
        st = st2
      }
      // flush: advance the watermark past everything
      val (_, fin) = Funnel.funnelStep(st, Iterator.empty, maxSeen + 1, stepArr, W)

      // batch reference: the accepted events in full (ts, id) order
      // through the same DP kernel
      val anchors = Array.fill(stepArr.length)(Long.MinValue)
      accepted.sortBy(e => (e.ts_us, e.event_id))
        .foreach(e => Funnel.applyEvent(anchors, stepArr, e.ts_us, e.event_type, W))
      val expected = Funnel.level(anchors)
      assert(fin == expected,
        s"trial $trial: streamed=$fin batch=$expected over ${accepted.length} accepted")
    }
  }

  test("s19: a late-arriving earlier day retro-actively re-assigns the cohort") {
    import graft.operators.{DayEvent, Funnel}
    val day = 86400L * 1000000L
    val input = MemoryStream[DayEvent](spark)
    val q = Funnel.streamRetention(input.toDS())
      .toDF("user_id", "cohort_idx", "day_idx")
      .writeStream.outputMode("update")
      .format("memory").queryName("s19_retro")
      .option("checkpointLocation", Files.createTempDirectory("ck_s19").toString)
      .start()
    try {
      // batch 1: user active on days 10 and 12 → cohort 10
      input.addData(DayEvent(1L, 10 * day), DayEvent(1L, 12 * day))
      q.processAllAvailable()
      val first = spark.table("s19_retro")
        .select("cohort_idx", "day_idx").as[(Long, Long)].collect().toSet
      assert(first == Set((10L, 10L), (10L, 12L)))
      // batch 2: day 7 arrives late → cohort becomes 7 and the snapshot
      // re-emits EVERY day under the new cohort
      input.addData(DayEvent(1L, 7 * day))
      q.processAllAvailable()
      val latest = spark.table("s19_retro")
        .select("cohort_idx", "day_idx").as[(Long, Long)].collect()
        .groupBy(_._1)(7L).toSet
      assert(latest == Set((7L, 7L), (7L, 10L), (7L, 12L)),
        "second snapshot must carry all days under the re-assigned cohort")
    } finally q.stop()
  }
}
