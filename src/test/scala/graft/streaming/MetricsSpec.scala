package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.ReferenceQueries

/** The self-metrics surface (PipelineMetrics) and the continuous-trigger
  * run mode: per-batch listener capture, latency-methodology parity with
  * q02, multi-trigger continuous operation and checkpointed restart. */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jsonClick(eventId: String, user: String, tsMs: Long, page: String): String =
    s"""{"event_id":"$eventId","user_id":"$user","ts":$tsMs,"page":"$page","referrer":"/","country":"US","device":"mobile"}"""

  private val t0 = 1704110400000L // 2024-01-01 12:00:00 UTC

  test("MetricsListener records per-batch rows, duration, watermark, state") {
    val listener = new PipelineMetrics.MetricsListener
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[String](spark)
      val q = ClickPipeline.minuteUserGrain(
          ClickPipeline.withEventTime(ClickPipeline.parse(input.toDF())))
        .writeStream.outputMode("append")
        .format("memory").queryName("metrics_test")
        .option("checkpointLocation", Files.createTempDirectory("ck_metrics").toString)
        .start()
      try {
        input.addData(jsonClick("e1", "u1", t0, "/"), jsonClick("e2", "u2", t0 + 1000, "/"))
        q.processAllAvailable()
        input.addData(jsonClick("e3", "u3", t0 + 120000, "/"))
        q.processAllAvailable()
        q.stop(); q.awaitTermination()
        listener.awaitTerminated(n = 1)
      } finally if (q.isActive) q.stop()

      val bm = listener.batches.filter(_.query_id == q.id.toString)
      assert(bm.nonEmpty)
      // every input row is accounted for exactly once across batches
      assert(bm.map(_.input_rows).sum == 3)
      assert(bm.forall(_.batch_duration_ms >= 0))
      // the watermark is real and tracks max event time − 10 s delay
      assert(bm.flatMap(_.watermark_ms).nonEmpty)
      assert(bm.flatMap(_.watermark_ms).max == t0 + 120000 - 10000)
      // windowed user-grain state is live
      assert(bm.map(_.state_rows).max > 0)
      // and the snapshot relation round-trips the same numbers
      val snap = listener.snapshot(spark).filter(col("query_id") === q.id.toString)
      assert(snap.agg(sum("input_rows")).head.getLong(0) == 3)
    } finally spark.streams.removeListener(listener)
  }

  test("latencyStats matches an independent computation (q02 methodology)") {
    val clicks = Tables.clicks(spark, TestSpark.Sf0001)
    val got = PipelineMetrics.latencyStats(clicks).head()

    // independent oracle: collect the latencies, compute avg / exact
    // linear-interpolation percentiles / max by hand
    val lat = clicks
      .select((unix_millis(col("created_at")) - unix_millis(col("ts"))).as("l"))
      .as[Long].collect().sorted
    def pct(p: Double): Double = {
      val rank = p * (lat.length - 1)
      val lo = rank.toInt; val frac = rank - lo
      if (lo + 1 < lat.length) lat(lo) + frac * (lat(lo + 1) - lat(lo))
      else lat(lo).toDouble
    }
    assert(math.abs(got.getDouble(0) - lat.map(_.toDouble).sum / lat.length) < 1e-6)
    assert(math.abs(got.getDouble(1) - pct(0.95)) < 1e-6)
    assert(math.abs(got.getDouble(2) - pct(0.99)) < 1e-6)
    assert(got.getLong(3) == lat.max)
    assert(got.getLong(4) == lat.length)
  }

  test("q02 and the self-metrics latency surface are one code path") {
    // q2 must produce exactly latencyStats' schema — the reference's
    // metrics_queries.sql methodology has a single implementation
    val q2cols = ReferenceQueries.q2(spark, TestSpark.Sf0001).columns.toSeq
    val lsCols = PipelineMetrics.latencyStats(
      Tables.clicks(spark, TestSpark.Sf0001)).columns.toSeq
    assert(q2cols == lsCols)
  }

  test("m01 self-metrics entry: gauges are present and self-consistent") {
    val rows = PipelineMetrics.selfMetrics(spark, TestSpark.Sf0001)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("input_rows_total") > 0)
    assert(rows("micro_batches") >= 1)
    assert(rows("sink_rows") == rows("input_rows_total"))
    assert(rows("watermark_ms_last") > 0)
    // replayed 2024 events ingested now: avg ≤ p95 ≤ p99 ≤ max, all huge
    assert(rows("latency_avg_ms") <= rows("latency_p95_ms"))
    assert(rows("latency_p95_ms") <= rows("latency_p99_ms"))
    assert(rows("latency_p99_ms") <= rows("latency_max_ms"))
    assert(rows("latency_avg_ms") > 0)
  }

  test("continuous trigger: >=3 micro-batches, clean stop, checkpointed restart") {
    val work = Files.createTempDirectory("cont_trigger").toString
    val inDir = s"$work/in"; val outDir = s"$work/out"; val ck = s"$work/ck"
    new java.io.File(inDir).mkdirs()

    val input = MemoryStream[String](spark)
    val parsed = ClickPipeline.parse(input.toDF())
    val q = ClickPipeline.startContinuous(parsed, outDir, ck, "50 milliseconds")
    try {
      input.addData(jsonClick("e1", "u1", t0, "/"))
      q.processAllAvailable()
      input.addData(jsonClick("e2", "u2", t0 + 1000, "/cart"))
      q.processAllAvailable()
      input.addData(jsonClick("e3", "u3", t0 + 2000, "/"))
      q.processAllAvailable()
      assert(q.lastProgress.batchId >= 2, "expected >= 3 micro-batches")
      ClickPipeline.stopWhenIdle(q)
      assert(!q.isActive)
    } finally if (q.isActive) q.stop()

    // restart from the same checkpoint: only new data is processed, and
    // nothing already written is re-emitted or lost
    val q2 = ClickPipeline.startContinuous(parsed, outDir, ck, "50 milliseconds")
    try {
      input.addData(jsonClick("e4", "u4", t0 + 3000, "/help"))
      q2.processAllAvailable()
      ClickPipeline.stopWhenIdle(q2)
    } finally if (q2.isActive) q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == 4)
    assert(out.select("event_id").as[String].collect().sorted.toSeq ==
      Seq("e1", "e2", "e3", "e4"))
  }

  test("m03 durable metrics table: survives a second run, unions by run_id") {
    import graft.streaming.PipelineMetrics.BatchMetric
    val metricsDir =
      Files.createTempDirectory("graft_m03_spec_").toFile.getAbsolutePath + "/metrics"
    def bm(batch: Long, rows: Long, durMs: Long, wm: Option[Long], wall: Long) =
      BatchMetric("q-1", batch, rows, durMs, rows * 1000.0 / durMs,
        rows * 1000.0 / durMs, wm, 0L, wall)

    // run 1: two batches; run 2 APPENDS — table must keep both
    PipelineMetrics.persistRun(spark, Seq(
      bm(0, 100, 50, None, 1000), bm(1, 300, 100, Some(900), 2000)),
      metricsDir, "run-001")
    PipelineMetrics.persistRun(spark, Seq(
      bm(0, 40, 20, Some(2500), 3000)), metricsDir, "run-002")

    val table = spark.read.parquet(metricsDir)
    assert(table.count() == 3)
    assert(table.select("run_id").distinct().as[String].collect().sorted.toSeq ==
      Seq("run-001", "run-002"))

    val summary = PipelineMetrics.runSummary(spark, metricsDir)
      .collect().map(r => r.getAs[String]("run_id") -> r).toMap
    assert(summary("run-001").getAs[Long]("batches") == 2)
    assert(summary("run-001").getAs[Long]("rows_total") == 400L)
    // 400 rows / 150 ms -> 2666.67 rows/s
    assert(math.abs(summary("run-001").getAs[Double]("rows_per_sec") - 400 * 1000.0 / 150) < 1e-9)
    // lag is computed only where a watermark exists: run-001's is batch 1's
    assert(summary("run-001").getAs[Long]("max_watermark_lag_ms") == 2000L - 900L)
    assert(summary("run-002").getAs[Long]("rows_total") == 40L)
    assert(summary("run-002").getAs[Long]("max_watermark_lag_ms") == 3000L - 2500L)
  }

  test("m03 retention: expireRuns drops old day partitions, keeps recent") {
    import graft.streaming.PipelineMetrics.BatchMetric
    val metricsDir =
      Files.createTempDirectory("graft_m03_exp_").toFile.getAbsolutePath + "/metrics"
    def bm(wall: Long) =
      BatchMetric("q-1", 0L, 10L, 10L, 1000.0, 1000.0, None, 0L, wall)

    val day = 86400000L
    // run-old lands on day 19700101, run-new on 19700301 (epoch + 59 days)
    PipelineMetrics.persistRun(spark, Seq(bm(1000L)), metricsDir, "run-old")
    PipelineMetrics.persistRun(spark, Seq(bm(59 * day + 1000L)), metricsDir, "run-new")

    val dropped = PipelineMetrics.expireRuns(spark, metricsDir,
      new java.sql.Timestamp(59 * day), retainDays = 30)
    assert(dropped == Seq("19700101"), s"expected the old day dropped, got $dropped")

    val left = PipelineMetrics.runSummary(spark, metricsDir)
      .select("run_id").as[String].collect().toSeq
    assert(left == Seq("run-new"), s"recent run must survive retention: $left")
  }

  test("m03 bench adjudication history: two runs append, the rollup counts out-of-band and canary trips, and a per-entry regression point-query works") {
    import graft.streaming.PipelineMetrics.{BenchCanary, BenchEntryVerdict}
    val root =
      Files.createTempDirectory("graft_m03_bench_").toFile.getAbsolutePath + "/metrics"
    def ev(entry: String, sec: Double, lo: Double, hi: Double, idx: Int,
           wall: Long) =
      BenchEntryVerdict(entry, sec, sec * 0.9, lo, hi, has_band = true,
        in_band = sec >= lo && sec <= hi, sweep_idx = idx,
        wall_time_ms = wall)

    // run 1: everything in band, quiet canaries; run 2: x43 regresses
    // out of band and one io canary trips
    PipelineMetrics.persistBenchRun(spark, root, "r-001",
      Seq(ev("q01", 1.0, 0.5, 2.0, 0, 1000L),
          ev("x43", 3.0, 1.5, 6.0, 1, 1000L)),
      Seq(BenchCanary(-1, 42.0, 310.0, 1000L)))
    PipelineMetrics.persistBenchRun(spark, root, "r-002",
      Seq(ev("q01", 1.1, 0.5, 2.0, 0, 2000L),
          ev("x43", 9.0, 1.5, 6.0, 1, 2000L)),
      Seq(BenchCanary(-1, 40.0, 950.0, 2000L)))

    val hist = PipelineMetrics.benchHistory(spark, root)
      .collect().map(r => r.getAs[String]("run_id") -> r).toMap
    assert(hist("r-001").getAs[Long]("n_entries") == 2)
    assert(hist("r-001").getAs[Long]("n_out_of_band") == 0)
    assert(hist("r-002").getAs[Long]("n_out_of_band") == 1)
    assert(hist("r-001").getAs[Long]("over_io") == 0)
    assert(hist("r-002").getAs[Long]("over_io") == 1,
      "the 950 ms io canary (> 2x 300 ms ref) must count as a trip")

    // "when did x43 get slow?" — one query over the table
    val slow = spark.read.parquet(s"$root/bench_entries")
      .filter(col("entry") === "x43" && col("has_band") && !col("in_band"))
      .select("run_id").as[String].collect().toSeq
    assert(slow == Seq("r-002"), s"regression point-query returned $slow")
  }

  test("m03 entry produces a one-run summary with positive throughput") {
    val out = PipelineMetrics.metricsHistory(spark, TestSpark.Sf0001).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("run_id") == "run-001")
    assert(r.getAs[Long]("batches") >= 2)
    assert(r.getAs[Long]("rows_total") > 0)
    assert(r.getAs[Double]("rows_per_sec") > 0.0)
  }
}
