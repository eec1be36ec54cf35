package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
            // High-to-low so an event never extends a chain through itself
            // (relevant only if a type appears at multiple levels).
            var k = n - 1
            while (k >= 0) {
              if (stepArr(k) == tpe) {
                if (k == 0) { if (ts > anchor(0)) anchor(0) = ts }
                else if (anchor(k - 1) != Long.MinValue &&
                         ts - anchor(k - 1) <= windowMicros &&
                         anchor(k - 1) > anchor(k)) anchor(k) = anchor(k - 1)
              }
              k -= 1
            }
          }
          var lvl = 0
          while (lvl < n && anchor(lvl) != Long.MinValue) lvl += 1
          (user, lvl)
        }
      }
    }.toDF("user_id", "funnel_level")
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
