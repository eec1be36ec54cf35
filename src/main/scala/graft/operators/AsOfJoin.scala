package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to every left row the single
  * LATEST right row with the same key and `right.ts <= left.ts` — the
  * enrich-events-with-most-recent-state primitive (market data, feature
  * stores, "what did the aggregate look like when this event arrived").
  *
  * Spark has no native as-of join, and the naive encodings collapse at
  * scale: a theta-join on `l.ts >= r.ts` plans a
  * BroadcastNestedLoopJoin (per-left-row rescans of the right timeline),
  * and "join all earlier rows then keep the max" materializes O(n·m)
  * intermediates per key. This implementation is a TAGGED UNION + ONE
  * WINDOW PASS instead:
  *
  *   1. normalize both sides onto one schema, tag right rows 0 / left
  *      rows 1;
  *   2. one hash shuffle on the key, one sort on (ts, tag) per key —
  *      right rows sort BEFORE left rows at equal ts, giving `>=`
  *      (inclusive) match semantics;
  *   3. `last(payload, ignoreNulls) over rows unbounded-preceding..current`
  *      carries the most recent right payload forward to each left row.
  *
  * Total cost: one shuffle + one sort over |L|+|R| rows, no join node in
  * the plan at all (asserted in AsOfJoinSpec), independent of how many
  * right rows precede each left row. At 100 TB this is the same plan
  * shape as any windowed aggregation — the key's timeline is never
  * re-scanned.
  *
  * Contract: left/right timestamp columns must union-compatibly share an
  * orderable type; right (key, ts) duplicates are matched arbitrarily
  * among the duplicates (pre-aggregate the right side if that matters);
  * right payload columns are emitted as `<rightPrefix><name>` (nulls
  * where no right row precedes), the matched right timestamp rides along
  * as `<rightPrefix><rightTs>`.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String = "ts", rightTs: String = "ts",
           payload: Seq[String], rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equality key")
    val pcols = (payload :+ rightTs).distinct
    val lSchema = left.schema
    val rSchema = right.schema
    val leftData = lSchema.fieldNames.toSeq.filterNot(keys.contains)
    leftData.intersect(pcols.map(rightPrefix + _)).foreach { c =>
      throw new IllegalArgumentException(s"left column '$c' collides with a prefixed right payload column")
    }

    val lNorm = left.select(
      keys.map(col) ++
      Seq(col(leftTs).as("__t"), lit(1).as("__side")) ++
      leftData.map(col) ++
      pcols.map(p => lit(null).cast(rSchema(p).dataType).as(rightPrefix + p)): _*)
    val rNorm = right.select(
      keys.map(col) ++
      Seq(col(rightTs).as("__t"), lit(0).as("__side")) ++
      leftData.map(c => lit(null).cast(lSchema(c).dataType).as(c)) ++
      pcols.map(p => col(p).as(rightPrefix + p)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.union(rNorm)
      .select(
        keys.map(col) ++ Seq(col("__side")) ++ leftData.map(col) ++
        pcols.map(p =>
          last(col(rightPrefix + p), ignoreNulls = true).over(w).as(rightPrefix + p)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
