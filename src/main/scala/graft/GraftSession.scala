package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory — every entry point (Verify, Bench,
  * tests, user code) gets the same scale-oriented defaults.
  *
  * Settings rationale (local[32] test box standing in for a 1000-executor
  * cluster — partitioning choices must survive the scale-up):
  *  - shuffle.partitions sized to cores locally; on a real cluster AQE
  *    coalesces post-shuffle partitions so the static number matters less.
  *  - AQE on: runtime re-planning (skew-join splitting, partition
  *    coalescing, broadcast-join demotion) is the single highest-leverage
  *    setting at 100 TB.
  *  - nanosAsLong: the events fixture stores ns-precision timestamps,
  *    which the vectorized parquet reader otherwise rejects.
  */
object GraftSession {
  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", cores)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // bucketed scans report their sortBy ordering (only ever applied
    // when a bucket is a single file — the writeBucketedBy invariant),
    // so stream-static joins against the s36-style store tables skip
    // the per-micro-batch re-sort of the corpus-sized side
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]"), cores.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
