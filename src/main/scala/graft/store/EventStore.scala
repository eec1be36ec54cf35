package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The storage layer (SURVEY.md §2.B B1–B5 / §4 O1–O3): partitioned,
  * sorted, bloom-indexed parquet standing in for the reference's MergeTree
  * layout (clickhouse_tables.sql:16-19,105-108).
  *
  *  - B2/O1: Hive-style time partitions (`PARTITION BY toYYYYMM(ts)`,
  *    sql:17) → `partitionBy(<grain>)`; Catalyst prunes partitions from
  *    any predicate on the partition column — asserted in StoreSpec.
  *    The grain is parameterized: `month` matches the reference's
  *    multi-year retention design; `day` is for short-spanning data
  *    (the 30-day fixture would otherwise land in ONE partition and
  *    pruning would be untestable).
  *  - O2: `sortWithinPartitions(ts)` at write time mirrors the MergeTree
  *    primary ORDER BY (ts, …) (sql:18): parquet row-group min/max stats
  *    on ts become selective, so time-range scans skip row groups.
  *  - B5/O3: parquet bloom filters on `user_id` and `page` mirror the two
  *    bloom_filter skip indexes (sql:105-108) for point lookups.
  *  - B3: TTL retention (sql:19,36,53,71) as partition drops — the
  *    scalable equivalent of row TTL: a partition is removed only when
  *    its entire grain is past the cutoff, so no surviving row is lost.
  */
object EventStore {

  val MonthGrain = "month"
  val DayGrain = "day"

  private def grainCol(grain: String) = grain match {
    case MonthGrain => date_format(col("ts"), "yyyyMM")
    case DayGrain   => date_format(col("ts"), "yyyyMMdd")
    case g => throw new IllegalArgumentException(s"unknown grain: $g")
  }

  /** Write the clicks relation as a partitioned warehouse table. One
    * shuffle (repartition by the partition value) so each partition is
    * written by one task as few, large, ts-sorted files — the layout that
    * survives a 1000-executor write without small-file explosion. */
  def write(clicks: DataFrame, warehouseDir: String,
            grain: String = MonthGrain, mode: String = "overwrite"): Unit =
    clicks
      .withColumn(grain, grainCol(grain))
      .repartition(col(grain))
      .sortWithinPartitions(col("ts"))
      .write.mode(mode)
      .partitionBy(grain)
      .option("parquet.bloom.filter.enabled#user_id", "true")
      .option("parquet.bloom.filter.enabled#page", "true")
      .parquet(warehouseDir)

  /** Scan the warehouse. Partition pruning and filter pushdown are
    * Catalyst's — callers just filter on the partition column / ts. */
  def read(spark: SparkSession, warehouseDir: String): DataFrame =
    spark.read.parquet(warehouseDir)

  /** B3: drop whole partitions whose entire grain is older than
    * `retainDays` before `asOf`. Conservative by construction: a
    * partition that straddles the cutoff is kept. Returns dropped
    * partition values. */
  def expire(spark: SparkSession, warehouseDir: String, grain: String,
             asOf: Timestamp, retainDays: Int): Seq[String] = {
    val fmt = new java.text.SimpleDateFormat(
      if (grain == MonthGrain) "yyyyMM" else "yyyyMMdd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val cutoff = fmt.format(new java.util.Date(
      asOf.getTime - retainDays * 86400000L))
    val root = new java.io.File(warehouseDir)
    val expired = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .filter(_.getName.startsWith(s"$grain="))
      .filter { d =>
        val value = d.getName.substring(grain.length + 1)
        // month=202312 is entirely expired iff its grain value sorts
        // strictly below the cutoff's grain value (same fixed-width fmt)
        value < cutoff
      }
    expired.foreach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(d)
    }
    expired.map(_.getName.substring(grain.length + 1)).toSeq
  }
}
