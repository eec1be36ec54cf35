package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loaders over the driver-provided parquet fixtures.
  *
  * The `events` table plays the role of the reference's `rt.clicks_raw`
  * (see /root/reference/sql/clickhouse_tables.sql:5-20 and FIXTURES.md §2):
  * `event_type` stands in for `page`, and deterministic derivations of
  * `user_id`/`event_id` stand in for the reference's `country`, `device`
  * and ingest-time (`created_at`) columns so that every reference query
  * keeps its exact operator shape (multi-dim group-by, conditional agg,
  * latency percentiles) while remaining reproducible in the DuckDB oracle.
  *
  * Scale posture: all loaders are plain `spark.read.parquet` scans —
  * Catalyst pushes filters and prunes columns into the scan, so callers
  * never pre-materialize. At 100 TB the same code reads a partitioned
  * warehouse directory (see [[graft.store.EventStore]]).
  */
object Tables {

  /** events.parquet carries ns-precision timestamps, which Spark's parquet
    * reader rejects (PARQUET_TYPE_ILLEGAL). We read ns as Long
    * (spark.sql.legacy.parquet.nanosAsLong — set in [[GraftSession]]) and
    * truncate to µs-precision TimestampType, matching DuckDB's ns→µs cast.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.types.LongType
    // ns → µs must be INTEGRAL division: `/` on longs is double division,
    // and epoch-nanos (~1.7e18) exceed double's 2^53 exact range — the
    // ~256 ns representation error can flip a timestamp across an exact
    // millisecond boundary and break ms-level parity with the oracle's
    // exact truncation (caught by x19's session durations).
    val tsCol =
      if (raw.schema("ts").dataType == LongType)
        timestamp_micros(expr("ts DIV 1000"))
      // timestamp[us] without a zone surfaces as TIMESTAMP_NTZ, which
      // unix_millis/unix_micros reject — normalize to session-zone
      // TIMESTAMP. The session zone is pinned to UTC (GraftSession), so
      // the cast is value-preserving and DuckDB's naive read agrees.
      else col("ts").cast("timestamp")
    raw.withColumn("ts", tsCol)
  }

  /** events + the derived reference-role columns. Derivations are pure
    * functions of stored columns, so they stay inside whole-stage codegen
    * and cost no shuffle:
    *  - page       = event_type                      (11-value categorical in the reference)
    *  - country    = 'c' || user_id % 8              (8-value categorical, produce.py:40-49)
    *  - device     = 3-value categorical of user_id  (produce.py:52-56)
    *  - lat_ms     = (event_id * 7919) % 10000       (deterministic ingest jitter)
    *  - created_at = ts + lat_ms                     (ingest-time column, clickhouse_tables.sql:14)
    */
  def clicks(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .withColumn("page", col("event_type"))
      .withColumn("country", concat(lit("c"), (col("user_id") % 8).cast("string")))
      .withColumn("device",
        when(col("user_id") % 3 === 0, "mobile")
          .when(col("user_id") % 3 === 1, "desktop")
          .otherwise("tablet"))
      .withColumn("referrer",
        when(col("event_id") % 4 === 0, "/")
          .otherwise(concat(lit("/p"), (col("event_id") % 4).cast("string"))))
      .withColumn("lat_ms", (col("event_id") * 7919L) % 10000L)
      .withColumn("created_at", timestamp_millis(unix_millis(col("ts")) + col("lat_ms")))

  /** SQL fragment computing the same derived columns for the DuckDB oracle.
    * MUST stay semantically identical to [[clicks]]. */
  val clicksSql: String =
    """SELECT *,
      |  event_type AS page,
      |  'c' || CAST(user_id % 8 AS VARCHAR) AS country,
      |  CASE CAST(user_id % 3 AS INT) WHEN 0 THEN 'mobile' WHEN 1 THEN 'desktop' ELSE 'tablet' END AS device,
      |  CASE WHEN event_id % 4 = 0 THEN '/' ELSE '/p' || CAST(event_id % 4 AS VARCHAR) END AS referrer,
      |  (event_id * 7919) % 10000 AS lat_ms,
      |  epoch_ms(epoch_ms(CAST(ts AS TIMESTAMP)) + (event_id * 7919) % 10000) AS created_at
      |FROM events""".stripMargin

  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/customer.parquet")
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/supplier.parquet")
  def part(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/part.parquet")
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/nation.parquet")
  def region(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/region.parquet")
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Fixed `now()` substitute (reference queries use now()-relative
    * predicates, metrics_queries.sql:10,22,29). Data spans
    * 2024-01-01 .. 2024-01-30 UTC at every SF. */
  val AsOf = "2024-01-31 00:00:00"
}
