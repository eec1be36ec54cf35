package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the streamed funnel wire. */
case class FunnelEvent(user_id: Long, ts_us: Long, event_id: Long,
                       event_type: String)

/** Streamed funnel state: the DP anchors over the SEALED prefix (events
  * at or before the watermark as of the last trigger — no later arrival
  * can precede them, so their fold is final) plus the sorted buffer of
  * unsealed events. Parallel primitive arrays for cheap ser/de. */
case class FunnelStreamState(anchors: Array[Long], sealedUs: Long,
                             bufTs: Array[Long], bufId: Array[Long],
                             bufTpe: Array[String])

/** One event on the streamed retention wire — only the key and time. */
case class DayEvent(user_id: Long, ts_us: Long)

/** Streamed retention state: the user's distinct active epoch-days,
  * sorted ascending (head = cohort day). Bounded by STREAM AGE in
  * calendar days, not by event count. */
case class RetentionState(days: Array[Long])

/** Event-sequence analytics over the click stream — the ClickHouse
  * `windowFunnel` / retention family (the reference's OLAP store is
  * ClickHouse, `sql/clickhouse_tables.sql:1-108`; these are the standard
  * event-analytics capabilities an operator of that store reaches for,
  * re-expressed Spark-first).
  *
  * Scale posture shared by both operators: ONE shuffle on `user_id`
  * (the natural analysis key), bounded per-user state, no per-user
  * collect — a hot user with millions of events streams through the
  * funnel scan in O(steps) memory.
  */
object Funnel {

  /** Per-user funnel level: the longest prefix of `steps` completed by a
    * chain of events with strictly increasing (ts, event_id) where every
    * chain member falls within `windowMicros` of the chain's FIRST event
    * (the ClickHouse `windowFunnel(window)(ts, cond...)` contract, with
    * the (ts, event_id) tuple order making the result deterministic
    * under timestamp ties — ClickHouse's default is order-dependent
    * there).
    *
    * Physical shape: repartition by user, sort within partitions by
    * (user, ts, event_id), then a single streaming pass. The greedy DP
    * keeps, per funnel level, the LATEST possible anchor (first-step
    * timestamp) of any chain reaching that level — extension feasibility
    * `ts - anchor <= window` is monotone in the anchor, so the latest
    * anchor dominates all others and existence of a level-k chain is
    * decided exactly. State per user: one long per step.
    *
    * Output: (user_id, funnel_level) for every user present in `events`,
    * level in 0..steps.length.
    */
  def windowFunnel(events: DataFrame, steps: Seq[String],
                   windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val n = steps.length
    val stepArr = steps.toArray
    val sorted = events
      .select(col("user_id").cast("long"),
              unix_micros(col("ts")).as("ts_us"),
              col("event_id").cast("long"),
              col("event_type"))
      .as[(Long, Long, Long, String)]
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts_us", "event_id")
    sorted.mapPartitions { it =>
      val in = it.buffered
      new Iterator[(Long, Int)] {
        override def hasNext: Boolean = in.hasNext
        override def next(): (Long, Int) = {
          val user = in.head._1
          // anchor(k) = latest first-step ts over chains completing step k
          val anchor = Array.fill(n)(Long.MinValue)
          while (in.hasNext && in.head._1 == user) {
            val (_, ts, _, tpe) = in.next()
            applyEvent(anchor, stepArr, ts, tpe, windowMicros)
          }
          (user, level(anchor))
        }
      }
    }.toDF("user_id", "funnel_level")
  }

  /** One DP transition: fold the next event (in (ts, event_id) order)
    * into the per-level anchor array. Mutates `anchor` in place.
    * Shared by the batch scan above and the streamed twin's sealed-prefix
    * fold ([[graft.streaming.StreamingQueries]] s18). */
  private[graft] def applyEvent(anchor: Array[Long], steps: Array[String],
                                ts: Long, tpe: String,
                                windowMicros: Long): Unit = {
    // High-to-low so an event never extends a chain through itself
    // (relevant only if a type appears at multiple levels).
    var k = steps.length - 1
    while (k >= 0) {
      if (steps(k) == tpe) {
        if (k == 0) { if (ts > anchor(0)) anchor(0) = ts }
        else if (anchor(k - 1) != Long.MinValue &&
                 ts - anchor(k - 1) <= windowMicros &&
                 anchor(k - 1) > anchor(k)) anchor(k) = anchor(k - 1)
      }
      k -= 1
    }
  }

  /** Completed level = longest non-empty anchor prefix. */
  private[graft] def level(anchor: Array[Long]): Int = {
    var lvl = 0
    while (lvl < anchor.length && anchor(lvl) != Long.MinValue) lvl += 1
    lvl
  }

  /** Streamed twin of [[windowFunnel]]: per-user funnel levels over an
    * unbounded stream, exact and state-bounded.
    *
    * The batch DP is order-sensitive, so a streaming version must decide
    * what to do about out-of-order arrival. The watermark decides: events
    * at or before the current watermark can never gain a new predecessor
    * (arrivals older than the seal boundary are dropped by the
    * transition itself — see [[funnelStep]]), so
    * the (ts, event_id)-sorted prefix up to the watermark is folded into
    * the sealed anchor array — O(steps) longs, final forever. Events
    * beyond the watermark wait in a sorted buffer bounded by
    * watermark lag × arrival rate. Each trigger emits the user's
    * PROVISIONAL level (sealed fold + buffer fold): adding events never
    * lowers a funnel level, so the last emission per user equals the
    * batch answer over the same data.
    *
    * Emission is Update-mode: one (user_id, funnel_level) row per user
    * per trigger in which the user has events. */
  private[graft] def emptyStreamState(n: Int): FunnelStreamState =
    FunnelStreamState(Array.fill(n)(Long.MinValue), Long.MinValue,
      Array.emptyLongArray, Array.emptyLongArray, Array.empty[String])

  /** One trigger's transition, shared by both streaming engines:
    * merge buffer + arrivals in (ts, id) order, fold the ≤-watermark
    * prefix into the sealed anchors, buffer the rest, and return the
    * new state plus the provisional level over sealed + buffered.
    *
    * Arrivals at or before the PREVIOUS seal boundary are dropped here:
    * events up to that boundary were already folded, so a straggler
    * older than it cannot enter the DP in (ts, id) order — folding it
    * late would silently corrupt chain order. transformWithState in
    * EventTime mode performs this drop at the engine; doing it in the
    * transition makes flatMapGroupsWithState (which still delivers late
    * rows) behave identically, so the late-data policy is the
    * operator's, not the engine's. */
  private[graft] def funnelStep(st: FunnelStreamState,
                                rows: Iterator[FunnelEvent], wmUs: Long,
                                steps: Array[String], windowMicros: Long)
      : (FunnelStreamState, Int) = {
    // The buffer is kept sorted by (ts, id) across triggers (it is always
    // a suffix of the previous trigger's sorted merge), so one trigger
    // costs O(A log A + B + A) — only the ARRIVALS are sorted. A hot user
    // far behind the watermark no longer pays an O(B log B) re-sort of
    // its whole buffer on every trigger, including arrival-free ones.
    val arr = rows.filter(_.ts_us > st.sealedUs)
      .map(e => (e.ts_us, e.event_id, e.event_type))
      .toArray.sortBy(t => (t._1, t._2))
    val nb = st.bufTs.length
    val merged = new Array[(Long, Long, String)](nb + arr.length)
    var i = 0; var j = 0; var k = 0
    while (i < nb && j < arr.length) {
      val before = st.bufTs(i) < arr(j)._1 ||
        (st.bufTs(i) == arr(j)._1 && st.bufId(i) <= arr(j)._2)
      if (before) { merged(k) = (st.bufTs(i), st.bufId(i), st.bufTpe(i)); i += 1 }
      else        { merged(k) = arr(j); j += 1 }
      k += 1
    }
    while (i < nb) { merged(k) = (st.bufTs(i), st.bufId(i), st.bufTpe(i)); i += 1; k += 1 }
    while (j < arr.length) { merged(k) = arr(j); j += 1; k += 1 }
    val anchors = st.anchors.clone()
    val (sealNow, keep) = merged.partition(_._1 <= wmUs)
    sealNow.foreach { case (ts, _, tpe) =>
      applyEvent(anchors, steps, ts, tpe, windowMicros) }
    val prov = anchors.clone()
    keep.foreach { case (ts, _, tpe) =>
      applyEvent(prov, steps, ts, tpe, windowMicros) }
    (FunnelStreamState(anchors, wmUs,
      keep.map(_._1).toArray, keep.map(_._2).toArray,
      keep.map(_._3).toArray), level(prov))
  }

  def streamFunnel(events: Dataset[FunnelEvent], steps: Seq[String],
                   windowMicros: Long): Dataset[(Long, Int)] = {
    val n = steps.length
    val stepArr = steps.toArray
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelStreamState]) =>
          val st = state.getOption.getOrElse(emptyStreamState(n))
          val (st2, lvl) = funnelStep(st, rows,
            state.getCurrentWatermarkMs() * 1000L, stepArr, windowMicros)
          state.update(st2)
          Iterator.single((user, lvl))
      }
  }

  /** [[streamFunnel]]'s StatefulProcessor implementation for Spark 4's
    * `transformWithState` (requires the RocksDB state store provider);
    * identical transition via the shared [[funnelStep]], parity-tested
    * in FunnelStreamSpec — the same dual-engine posture as
    * [[graft.streaming.AnomalyDetector]]. One engine difference, by
    * design: in EventTime mode transformWithState DROPS below-watermark
    * arrivals before the processor sees them (the strict watermark
    * contract), where flatMapGroupsWithState still delivers them and the
    * sorted merge absorbs them. On watermark-conformant streams the two
    * agree exactly; on late data TWS enforces the drop the watermark
    * already promised. */
  class FunnelProcessor(steps: Array[String], windowMicros: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, FunnelEvent, (Long, Int)] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TTLConfig, TimeMode, ValueState}
    @transient private var state: ValueState[FunnelStreamState] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelStreamState]("funnel",
        org.apache.spark.sql.Encoders.product[FunnelStreamState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[FunnelEvent],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[(Long, Int)] = {
      val st = if (state.exists()) state.get() else emptyStreamState(steps.length)
      val wmUs = math.max(timerValues.getCurrentWatermarkInMs(), 0L) * 1000L
      val (st2, lvl) = funnelStep(st, rows, wmUs, steps, windowMicros)
      state.update(st2)
      Iterator.single((user, lvl))
    }
  }

  /** transformWithState flavor of [[streamFunnel]]. */
  def streamFunnelTws(events: Dataset[FunnelEvent], steps: Seq[String],
                      windowMicros: Long): Dataset[(Long, Int)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(steps.toArray, windowMicros),
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Update)
  }

  /** Streamed twin of [[retentionMatrix]]'s per-user core. Unlike the
    * funnel DP, retention state is fully ORDER-INSENSITIVE (a min and a
    * distinct-set are commutative), so no watermark sealing is needed —
    * the subtlety is instead that a user's COHORT can change
    * retroactively: an earlier first-day arriving in a later batch
    * re-assigns every previously-emitted (cohort, offset) pair. Each
    * trigger therefore emits the user's full current SNAPSHOT
    * (user, cohort_day_idx, active_day_idx)*, and the reader keeps only
    * each user's LAST snapshot — stale cohort assignments die with the
    * superseded batch. (At production scale the chatty snapshot would be
    * replaced by changed-rows + retractions; the snapshot keeps the
    * bounded-replay harness idempotent.) State per user: one long per
    * distinct active day — bounded by stream age in days. */
  def streamRetention(events: Dataset[DayEvent]): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[DayEvent], state: GroupState[RetentionState]) =>
          val prev = state.getOption.map(_.days).getOrElse(Array.emptyLongArray)
          val days = (prev.iterator ++
            rows.map(e => Math.floorDiv(e.ts_us, 86400000000L)))
            .toArray.distinct.sorted
          state.update(RetentionState(days))
          val cohort = days.head
          days.iterator.map(d => (user, cohort, d))
      }
  }

  /** Retention cohort matrix: users bucketed by first-seen day (the
    * cohort), then distinct active users per (cohort_day, day_offset).
    *
    * Shape: first-seen is a partial-aggregable min over the user shuffle;
    * the join back is co-partitioned on user_id (the first-seen side is
    * |users| rows — at 100 TB still a shuffle join, never broadcast);
    * the final distinct-count shuffles (cohort, offset, user) once.
    * Day arithmetic is integer epoch-day so no float or timezone hazard;
    * cohort_day is emitted as a yyyy-MM-dd string for engine-neutral
    * comparison. */
  def retentionMatrix(events: DataFrame): DataFrame = {
    // Integral DIV, not `/`: epoch-micros exceed double's exact range
    // (same hazard documented at Tables.events' ns→µs truncation).
    val days = events.select(
      col("user_id").cast("long"),
      expr("unix_micros(ts) DIV 86400000000").as("day_idx"))
    val first = days.groupBy("user_id").agg(min("day_idx").as("cohort_idx"))
    days.join(first, "user_id")
      .groupBy(col("cohort_idx"), (col("day_idx") - col("cohort_idx")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(
        date_format(timestamp_seconds(col("cohort_idx") * 86400L), "yyyy-MM-dd")
          .as("cohort_day"),
        col("day_offset"), col("n_users"))
  }
}
