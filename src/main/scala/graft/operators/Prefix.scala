package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT prefix sums — the primitive behind "assign each
  * document a position in a global token stream" (shard writers,
  * curriculum orderings, quota cutoffs).
  *
  * The naive formulation — one window over the whole relation ordered by
  * the key — serializes the entire dataset through a SINGLE task (an
  * un-partitioned Window is Spark's quietest scale cliff: it plans, runs,
  * and silently becomes the job). This is the classic two-phase scan
  * instead:
  *
  *   1. bucket the key space (`floor(order / bucketWidth)`), sum each
  *      bucket — a partial-agg'd bucket-grain aggregation;
  *   2. prefix-sum the BUCKET TOTALS — a window over the bucket-grain
  *      relation, thousands of rows where the data has billions;
  *   3. broadcast-join the per-bucket offsets back and window WITHIN
  *      each bucket — parallel across buckets, bounded per bucket.
  *
  * Cost: one bucket aggregation + one bounded window, no single-task
  * stage anywhere. Exactness: integer arithmetic throughout; the result
  * equals the one-window formulation row for row (spec-asserted).
  */
object Prefix {

  /** Adds `running` = inclusive prefix sum of `value` in ascending
    * `order` (a non-negative numeric key; ties forbidden — pre-aggregate
    * to unique keys first, same contract as [[graft.store.Scd2]]). */
  def runningSum(df: DataFrame, order: Column, value: Column,
                 bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val bucketed = df.withColumn("__bkt", floor(order / bucketWidth).cast("long"))
      .withColumn("__v", value.cast("long"))
      .withColumn("__ord", order)
    val bucketTotals = bucketed.groupBy("__bkt").agg(sum("__v").as("__bsum"))
    // prefix over bucket totals: bucket-grain, window is fine here —
    // this relation is |key space| / bucketWidth rows
    val offsets = bucketTotals
      .withColumn("__off",
        coalesce(sum(col("__bsum")).over(
          Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__bkt", "__off")
    val inBucket = Window.partitionBy("__bkt").orderBy("__ord")
    bucketed.join(broadcast(offsets), "__bkt")
      .withColumn("running", col("__off") + sum(col("__v")).over(inBucket))
      .drop("__bkt", "__v", "__ord", "__off")
  }
}
