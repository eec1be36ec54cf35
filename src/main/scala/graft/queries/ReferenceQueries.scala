package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** The reference's declared analytic query surface, Q1–Q17 (SURVEY.md §2.C),
  * re-expressed as Catalyst-friendly DataFrame plans with a DuckDB oracle
  * per query.
  *
  * Determinism conventions (FIXTURES.md §3):
  *  - `now()` is parameterized as [[Tables.AsOf]]; the reference's
  *    minutes/hours intervals are widened to days so each query returns a
  *    meaningful row set over the 30-day fixture span (operator shape is
  *    unchanged: range filter on a timestamp).
  *  - every timestamp output column is emitted as epoch **milliseconds**
  *    (bigint) on both sides — sidesteps ns-vs-µs precision and
  *    formatting differences between Spark and DuckDB.
  *  - every result has a total-order ORDER BY (all key columns as
  *    tie-breakers) in both the Spark plan and the oracle SQL.
  *
  * Scale posture: all queries are single-pass scan→filter→partial-agg→
  * final-agg plans. Filters sit directly on scan columns (or on columns
  * derived from scan columns by pure row-local expressions), so Catalyst
  * pushes what it can into the parquet reader and the rest stays inside
  * one WholeStageCodegen stage; the only shuffle is the aggregation
  * exchange, which always runs map-side partial aggregation first.
  */
object ReferenceQueries {

  private val asOf = s"TIMESTAMP '${Tables.AsOf}'"

  /** DuckDB-side derived-column CTE, kept in lock-step with Tables.clicks. */
  private def withClicks(body: String): String =
    s"WITH clicks AS (${Tables.clicksSql}) $body"

  private def clicks(s: SparkSession, dir: String): DataFrame =
    Tables.clicks(s, dir)

  /** The canonical per-minute aggregate (the reference's page_minute_agg
    * table / page_stats_mv materialized view, clickhouse_tables.sql:75-85).
    * Single aggregation path — intentionally fixes the reference's
    * double-insert quirk (SURVEY.md §2.B B4/B7 note). */
  def minuteAgg(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .groupBy(
        date_trunc("minute", col("ts")).as("window_start"),
        col("page"), col("country"))
      .agg(count("*").as("cnt"), count_distinct(col("user_id")).as("unique_users"))
      .withColumn("window_end", col("window_start") + expr("INTERVAL 1 MINUTE"))

  private val minuteAggSql: String =
    """SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS window_start,
      |       date_trunc('minute', CAST(ts AS TIMESTAMP)) + INTERVAL 1 MINUTE AS window_end,
      |       page, country,
      |       COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS unique_users
      |FROM clicks GROUP BY 1, 2, 3, 4""".stripMargin

  // ---------------------------------------------------------------------
  // Q1 — throughput: events + unique users per minute (metrics_queries.sql:4-12)
  // ---------------------------------------------------------------------
  def q1(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("created_at") >= expr(s"$asOf - INTERVAL 7 DAYS"))
      .groupBy(date_trunc("minute", col("created_at")).as("minute"))
      .agg(count("*").as("events_per_minute"),
           count_distinct(col("user_id")).as("unique_users_per_minute"))
      .select(unix_millis(col("minute")).as("minute_ms"),
              col("events_per_minute"), col("unique_users_per_minute"))
      .orderBy(desc("minute_ms"))

  val q1Sql: String = withClicks(
    s"""SELECT epoch_ms(date_trunc('minute', created_at)) AS minute_ms,
       |       COUNT(*) AS events_per_minute,
       |       COUNT(DISTINCT user_id) AS unique_users_per_minute
       |FROM clicks WHERE created_at >= $asOf - INTERVAL 7 DAY
       |GROUP BY 1 ORDER BY minute_ms DESC""".stripMargin)

  // ---------------------------------------------------------------------
  // Q2 — end-to-end latency avg/p95/p99/max (metrics_queries.sql:14-22)
  // ---------------------------------------------------------------------
  def q2(s: SparkSession, dir: String): DataFrame =
    // one methodology, two consumers: the dashboard query (this, DuckDB
    // hash-checked) and the engine's self-metrics (PipelineMetrics.m01)
    graft.streaming.PipelineMetrics.latencyStats(
      clicks(s, dir)
        .filter(col("created_at") >= expr(s"$asOf - INTERVAL 5 DAYS")))

  val q2Sql: String = withClicks(
    s"""SELECT AVG(latency_ms) AS avg_latency_ms,
       |       quantile_cont(latency_ms, 0.95) AS p95_latency_ms,
       |       quantile_cont(latency_ms, 0.99) AS p99_latency_ms,
       |       MAX(latency_ms) AS max_latency_ms,
       |       COUNT(*) AS total_events
       |FROM (SELECT epoch_ms(created_at) - epoch_ms(CAST(ts AS TIMESTAMP)) AS latency_ms
       |      FROM clicks WHERE created_at >= $asOf - INTERVAL 5 DAY)""".stripMargin)

  /** Q2's scale-out twin: the reference's ClickHouse `quantile()` is
    * APPROXIMATE (reservoir, metrics_queries.sql:17-18) — q2 pins exact
    * percentiles for the deterministic oracle; this variant is the
    * sketch-based (GK) form whose memory is bounded regardless of group
    * size — the right default at 100 TB. Rows-only driver check
    * (approximate ⇒ not DuckDB-hashable); accuracy bounded in tests via
    * the exact result. */
  def q2approx(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("created_at") >= expr(s"$asOf - INTERVAL 5 DAYS"))
      .withColumn("latency_ms", unix_millis(col("created_at")) - unix_millis(col("ts")))
      .agg(
        avg(col("latency_ms")).as("avg_latency_ms"),
        expr("approx_percentile(latency_ms, 0.95, 10000)").as("p95_latency_ms"),
        expr("approx_percentile(latency_ms, 0.99, 10000)").as("p99_latency_ms"),
        max(col("latency_ms")).as("max_latency_ms"),
        count("*").as("total_events"))

  // ---------------------------------------------------------------------
  // Q3 — rows inserted per minute (metrics_queries.sql:24-31)
  // ---------------------------------------------------------------------
  def q3(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("created_at") >= expr(s"$asOf - INTERVAL 10 DAYS"))
      .groupBy(date_trunc("minute", col("created_at")).as("minute"))
      .agg(count("*").as("rows_inserted"))
      .select(unix_millis(col("minute")).as("minute_ms"), col("rows_inserted"))
      .orderBy(desc("minute_ms"))

  val q3Sql: String = withClicks(
    s"""SELECT epoch_ms(date_trunc('minute', created_at)) AS minute_ms,
       |       COUNT(*) AS rows_inserted
       |FROM clicks WHERE created_at >= $asOf - INTERVAL 10 DAY
       |GROUP BY 1 ORDER BY minute_ms DESC""".stripMargin)

  // ---------------------------------------------------------------------
  // Q4 — data freshness (metrics_queries.sql:33-40)
  // ---------------------------------------------------------------------
  def q4(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("created_at") >= expr(s"$asOf - INTERVAL 30 DAYS"))
      .agg(min(col("created_at")).as("oldest"), max(col("created_at")).as("newest"))
      .select(
        unix_millis(col("oldest")).as("oldest_data_ms"),
        unix_millis(col("newest")).as("newest_data_ms"),
        (unix_millis(col("newest")) - unix_millis(col("oldest"))).as("data_span_ms"),
        (lit(java.sql.Timestamp.valueOf(Tables.AsOf).getTime) - unix_millis(col("newest")))
          .as("data_lag_ms"))

  val q4Sql: String = withClicks(
    s"""SELECT epoch_ms(MIN(created_at)) AS oldest_data_ms,
       |       epoch_ms(MAX(created_at)) AS newest_data_ms,
       |       epoch_ms(MAX(created_at)) - epoch_ms(MIN(created_at)) AS data_span_ms,
       |       epoch_ms($asOf) - epoch_ms(MAX(created_at)) AS data_lag_ms
       |FROM clicks WHERE created_at >= $asOf - INTERVAL 30 DAY""".stripMargin)

  // ---------------------------------------------------------------------
  // Q5 — pipeline health: raw vs aggregate freshness, UNION ALL
  // (metrics_queries.sql:42-57)
  // ---------------------------------------------------------------------
  def q5(s: SparkSession, dir: String): DataFrame = {
    val raw = clicks(s, dir)
      .filter(col("created_at") >= expr(s"$asOf - INTERVAL 5 DAYS"))
      .agg(count("*").as("row_count"), unix_millis(max(col("created_at"))).as("latest_timestamp_ms"))
      .select(lit("raw_events").as("table_name"), col("row_count"), col("latest_timestamp_ms"))
    val agg = minuteAgg(s, dir)
      .filter(col("window_end") >= expr(s"$asOf - INTERVAL 5 DAYS"))
      .agg(count("*").as("row_count"), unix_millis(max(col("window_end"))).as("latest_timestamp_ms"))
      .select(lit("aggregations").as("table_name"), col("row_count"), col("latest_timestamp_ms"))
    raw.unionAll(agg).orderBy("table_name")
  }

  val q5Sql: String = withClicks(
    s"""SELECT * FROM (
       |  SELECT 'raw_events' AS table_name, COUNT(*) AS row_count,
       |         epoch_ms(MAX(created_at)) AS latest_timestamp_ms
       |  FROM clicks WHERE created_at >= $asOf - INTERVAL 5 DAY
       |  UNION ALL
       |  SELECT 'aggregations' AS table_name, COUNT(*) AS row_count,
       |         epoch_ms(MAX(window_end)) AS latest_timestamp_ms
       |  FROM ($minuteAggSql) WHERE window_end >= $asOf - INTERVAL 5 DAY
       |) ORDER BY table_name""".stripMargin)

  // ---------------------------------------------------------------------
  // Q6 — throughput summary (metrics_queries.sql:59-67)
  // ---------------------------------------------------------------------
  def q6(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("created_at") >= expr(s"$asOf - INTERVAL 5 DAYS"))
      .agg(
        (count("*") / 5).as("avg_events_per_minute"),
        (count("*") / 300).as("avg_events_per_second"),
        count_distinct(col("user_id")).as("unique_users"),
        count_distinct(col("page")).as("unique_pages"),
        count_distinct(col("country")).as("unique_countries"))

  val q6Sql: String = withClicks(
    s"""SELECT COUNT(*) / 5 AS avg_events_per_minute,
       |       COUNT(*) / 300 AS avg_events_per_second,
       |       COUNT(DISTINCT user_id) AS unique_users,
       |       COUNT(DISTINCT page) AS unique_pages,
       |       COUNT(DISTINCT country) AS unique_countries
       |FROM clicks WHERE created_at >= $asOf - INTERVAL 5 DAY""".stripMargin)

  // ---------------------------------------------------------------------
  // Q7 — per-page real-time metrics (MONITORING_SETUP.md:113-122)
  // ---------------------------------------------------------------------
  def q7(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("ts") >= expr(s"$asOf - INTERVAL 5 DAYS"))
      .groupBy(col("page"))
      .agg(count("*").as("events"), count_distinct(col("user_id")).as("unique_users"))
      .orderBy(desc("events"), col("page"))

  val q7Sql: String = withClicks(
    s"""SELECT page, COUNT(*) AS events, COUNT(DISTINCT user_id) AS unique_users
       |FROM clicks WHERE CAST(ts AS TIMESTAMP) >= $asOf - INTERVAL 5 DAY
       |GROUP BY page ORDER BY events DESC, page""".stripMargin)

  // ---------------------------------------------------------------------
  // Q8 — traffic trend per minute (MONITORING_SETUP.md:125-134)
  // ---------------------------------------------------------------------
  def q8(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("ts") >= expr(s"$asOf - INTERVAL 7 DAYS"))
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count("*").as("events"), count_distinct(col("user_id")).as("unique_users"))
      .select(unix_millis(col("minute")).as("minute_ms"), col("events"), col("unique_users"))
      .orderBy("minute_ms")

  val q8Sql: String = withClicks(
    s"""SELECT epoch_ms(date_trunc('minute', CAST(ts AS TIMESTAMP))) AS minute_ms,
       |       COUNT(*) AS events, COUNT(DISTINCT user_id) AS unique_users
       |FROM clicks WHERE CAST(ts AS TIMESTAMP) >= $asOf - INTERVAL 7 DAY
       |GROUP BY 1 ORDER BY minute_ms""".stripMargin)

  // ---------------------------------------------------------------------
  // Q9 — geographic analysis w/ conditional AVG (MONITORING_SETUP.md:137-147)
  // ---------------------------------------------------------------------
  def q9(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("ts") >= expr(s"$asOf - INTERVAL 30 DAYS"))
      .groupBy(col("country"))
      .agg(
        count("*").as("events"),
        count_distinct(col("user_id")).as("unique_users"),
        avg(when(col("referrer") === "/", 0).otherwise(1)).as("external_traffic_ratio"))
      .orderBy(desc("events"), col("country"))

  val q9Sql: String = withClicks(
    s"""SELECT country, COUNT(*) AS events, COUNT(DISTINCT user_id) AS unique_users,
       |       AVG(CASE WHEN referrer = '/' THEN 0 ELSE 1 END) AS external_traffic_ratio
       |FROM clicks WHERE CAST(ts AS TIMESTAMP) >= $asOf - INTERVAL 30 DAY
       |GROUP BY country ORDER BY events DESC, country""".stripMargin)

  // ---------------------------------------------------------------------
  // Q10 — device analytics (MONITORING_SETUP.md:150-160)
  // ---------------------------------------------------------------------
  def q10(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("ts") >= expr(s"$asOf - INTERVAL 30 DAYS"))
      .groupBy(col("device"))
      .agg(count("*").as("events"),
           count_distinct(col("user_id")).as("unique_users"),
           count_distinct(col("page")).as("pages_visited"))
      .orderBy(desc("events"), col("device"))

  val q10Sql: String = withClicks(
    s"""SELECT device, COUNT(*) AS events, COUNT(DISTINCT user_id) AS unique_users,
       |       COUNT(DISTINCT page) AS pages_visited
       |FROM clicks WHERE CAST(ts AS TIMESTAMP) >= $asOf - INTERVAL 30 DAY
       |GROUP BY device ORDER BY events DESC, device""".stripMargin)

  // ---------------------------------------------------------------------
  // Q11 — top-10 (page, country) by clicks (superset/README.md:120-131)
  // ---------------------------------------------------------------------
  def q11(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("ts") >= expr(s"$asOf - INTERVAL 30 DAYS"))
      .groupBy(col("page"), col("country"))
      .agg(count("*").as("clicks"), count_distinct(col("user_id")).as("unique_users"))
      .orderBy(desc("clicks"), col("page"), col("country"))
      .limit(10)

  val q11Sql: String = withClicks(
    s"""SELECT page, country, COUNT(*) AS clicks, COUNT(DISTINCT user_id) AS unique_users
       |FROM clicks WHERE CAST(ts AS TIMESTAMP) >= $asOf - INTERVAL 30 DAY
       |GROUP BY page, country ORDER BY clicks DESC, page, country LIMIT 10""".stripMargin)

  // ---------------------------------------------------------------------
  // Q12 — window-aggregation rollup status (superset/README.md:134-144)
  // ---------------------------------------------------------------------
  def q12(s: SparkSession, dir: String): DataFrame =
    minuteAgg(s, dir)
      .filter(col("window_start") >= expr(s"$asOf - INTERVAL 7 DAYS"))
      .groupBy(col("window_start"))
      .agg(count("*").as("windows"), sum(col("cnt")).as("total_clicks"),
           sum(col("unique_users")).as("total_unique_users"))
      .select(unix_millis(col("window_start")).as("window_start_ms"),
              col("windows"), col("total_clicks"), col("total_unique_users"))
      .orderBy(desc("window_start_ms"))

  val q12Sql: String = withClicks(
    s"""SELECT epoch_ms(window_start) AS window_start_ms, COUNT(*) AS windows,
       |       CAST(SUM(cnt) AS BIGINT) AS total_clicks,
       |       CAST(SUM(unique_users) AS BIGINT) AS total_unique_users
       |FROM ($minuteAggSql) WHERE window_start >= $asOf - INTERVAL 7 DAY
       |GROUP BY 1 ORDER BY window_start_ms DESC""".stripMargin)

  // ---------------------------------------------------------------------
  // Q13 — recent_activity view (clickhouse_tables.sql:88-99)
  // ---------------------------------------------------------------------
  def q13(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .filter(col("ts") >= expr(s"$asOf - INTERVAL 15 DAYS"))
      .groupBy(col("page"), col("country"), col("device"))
      .agg(count("*").as("total_clicks"),
           count_distinct(col("user_id")).as("unique_users"),
           unix_millis(max(col("ts"))).as("last_seen_ms"))
      .orderBy(desc("total_clicks"), col("page"), col("country"), col("device"))

  val q13Sql: String = withClicks(
    s"""SELECT page, country, device, COUNT(*) AS total_clicks,
       |       COUNT(DISTINCT user_id) AS unique_users,
       |       epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS last_seen_ms
       |FROM clicks WHERE CAST(ts AS TIMESTAMP) >= $asOf - INTERVAL 15 DAY
       |GROUP BY page, country, device
       |ORDER BY total_clicks DESC, page, country, device""".stripMargin)

  // ---------------------------------------------------------------------
  // Q14 — the per-minute aggregation itself (MV page_stats_mv,
  // clickhouse_tables.sql:75-85): the batch shape of the streaming agg.
  // ---------------------------------------------------------------------
  def q14(s: SparkSession, dir: String): DataFrame =
    minuteAgg(s, dir)
      .select(unix_millis(col("window_start")).as("window_start_ms"),
              unix_millis(col("window_end")).as("window_end_ms"),
              col("page"), col("country"), col("cnt"), col("unique_users"))
      .orderBy("window_start_ms", "page", "country")

  val q14Sql: String = withClicks(
    s"""SELECT epoch_ms(window_start) AS window_start_ms,
       |       epoch_ms(window_end) AS window_end_ms,
       |       page, country, cnt, unique_users
       |FROM ($minuteAggSql)
       |ORDER BY window_start_ms, page, country""".stripMargin)

  // ---------------------------------------------------------------------
  // Q15 — 5-minute rollup by page (rt.page_5min_agg schema,
  // clickhouse_tables.sql:40-54; declared but writer-less in the reference).
  // Uses Spark's native tumbling window() operator; the oracle reproduces
  // its epoch-aligned [start, end) bucketing arithmetically.
  // ---------------------------------------------------------------------
  def q15(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("page"))
      .agg(count("*").as("cnt"),
           count_distinct(col("user_id")).as("unique_users"),
           count_distinct(col("country")).as("unique_countries"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
              unix_millis(col("w.end")).as("window_end_ms"),
              col("page"), col("cnt"), col("unique_users"), col("unique_countries"))
      .orderBy("window_start_ms", "page")

  val q15Sql: String = withClicks(
    s"""SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 300000) * 300000 AS window_start_ms,
       |       (epoch_ms(CAST(ts AS TIMESTAMP)) // 300000) * 300000 + 300000 AS window_end_ms,
       |       page, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS unique_users,
       |       COUNT(DISTINCT country) AS unique_countries
       |FROM clicks GROUP BY 1, 2, 3 ORDER BY window_start_ms, page""".stripMargin)

  // ---------------------------------------------------------------------
  // Q16 — hourly rollup by (page, country, device) (rt.page_hourly_agg,
  // clickhouse_tables.sql:57-72; declared but writer-less in the reference).
  // ---------------------------------------------------------------------
  def q16(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"),
               col("page"), col("country"), col("device"))
      .agg(count("*").as("cnt"), count_distinct(col("user_id")).as("unique_users"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
              unix_millis(col("w.end")).as("window_end_ms"),
              col("page"), col("country"), col("device"), col("cnt"), col("unique_users"))
      .orderBy("window_start_ms", "page", "country", "device")

  val q16Sql: String = withClicks(
    s"""SELECT (epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000) * 3600000 AS window_start_ms,
       |       (epoch_ms(CAST(ts AS TIMESTAMP)) // 3600000) * 3600000 + 3600000 AS window_end_ms,
       |       page, country, device, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS unique_users
       |FROM clicks GROUP BY 1, 2, 3, 4, 5
       |ORDER BY window_start_ms, page, country, device""".stripMargin)

  // ---------------------------------------------------------------------
  // Q17 — anomaly detection, batch shape (StreamJob.java:130-191).
  // Exact Welford parity: stats INCLUDE the current window (update precedes
  // the test), sample stddev M2/(n-1), gate n > 5, threshold z > 2.5.
  // Cumulative avg/var_samp over an ordered per-key frame ≡ Welford's
  // running (mean, M2) — same math, numerically stable on both engines.
  // The streaming twin (graft.streaming.AnomalyDetector) runs the literal
  // Welford recurrence in keyed state.
  // ---------------------------------------------------------------------
  def q17(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("page"), col("country"))
      .orderBy(col("window_start"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    minuteAgg(s, dir)
      .withColumn("n", count("*").over(w))
      .withColumn("mean", avg(col("cnt")).over(w))
      .withColumn("stddev", sqrt(var_samp(col("cnt")).over(w)))
      .withColumn("z_score",
        when(col("n") > 5 && col("stddev") > 0,
             abs(col("cnt") - col("mean")) / col("stddev")).otherwise(0.0))
      .withColumn("is_anomaly", col("z_score") > 2.5)
      .select(unix_millis(col("window_start")).as("window_start_ms"),
              col("page"), col("country"), col("cnt"), col("n"),
              col("mean"), col("z_score"), col("is_anomaly"))
      .orderBy("page", "country", "window_start_ms")
  }

  val q17Sql: String = withClicks(
    s"""SELECT epoch_ms(window_start) AS window_start_ms, page, country, cnt,
       |       COUNT(*) OVER w AS n,
       |       AVG(cnt) OVER w AS mean,
       |       CASE WHEN COUNT(*) OVER w > 5
       |                  AND sqrt(var_samp(cnt) OVER w) > 0
       |            THEN abs(cnt - AVG(cnt) OVER w) / sqrt(var_samp(cnt) OVER w)
       |            ELSE 0.0 END AS z_score,
       |       CASE WHEN COUNT(*) OVER w > 5
       |                  AND sqrt(var_samp(cnt) OVER w) > 0
       |            THEN abs(cnt - AVG(cnt) OVER w) / sqrt(var_samp(cnt) OVER w) > 2.5
       |            ELSE FALSE END AS is_anomaly
       |FROM ($minuteAggSql)
       |WINDOW w AS (PARTITION BY page, country ORDER BY window_start
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY page, country, window_start_ms""".stripMargin)

  /** Registry: name → (query fn, oracle SQL). */
  /** Entries without a DuckDB oracle (approximate results). */
  val allNoOracle: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] = Seq(
    "q02a_latency_approx" -> ((q2approx _, None)),
  )

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "q01_events_per_minute"  -> ((q1 _, q1Sql)),
    "q02_latency_stats"      -> ((q2 _, q2Sql)),
    "q03_rows_per_minute"    -> ((q3 _, q3Sql)),
    "q04_freshness"          -> ((q4 _, q4Sql)),
    "q05_pipeline_health"    -> ((q5 _, q5Sql)),
    "q06_throughput_summary" -> ((q6 _, q6Sql)),
    "q07_top_pages"          -> ((q7 _, q7Sql)),
    "q08_traffic_trend"      -> ((q8 _, q8Sql)),
    "q09_geo_analysis"       -> ((q9 _, q9Sql)),
    "q10_device_analytics"   -> ((q10 _, q10Sql)),
    "q11_top_page_country"   -> ((q11 _, q11Sql)),
    "q12_agg_rollup_status"  -> ((q12 _, q12Sql)),
    "q13_recent_activity"    -> ((q13 _, q13Sql)),
    "q14_minute_agg"         -> ((q14 _, q14Sql)),
    "q15_5min_agg"           -> ((q15 _, q15Sql)),
    "q16_hourly_agg"         -> ((q16 _, q16Sql)),
    "q17_anomaly_batch"      -> ((q17 _, q17Sql)),
  )
}
