package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — the warehouse MERGE
  * shape (Kimball SCD2; Delta/Iceberg `MERGE INTO` semantics) the rest
  * of the store family lacks: attribute history as half-open validity
  * intervals `[valid_from, valid_to)` with an open (`valid_to IS NULL`)
  * current version per key.
  *
  * Two operations:
  *  - [[fromObservations]]: initial load — collapse an observation
  *    stream (key, ts, attr) into versions (consecutive equal attrs are
  *    one version). One shuffle on key; windows run inside each key
  *    whose observation count is bounded (days, not corpus size).
  *  - [[merge]]: apply a LATER observation batch incrementally. Only
  *    the open versions of keys present in the batch are rebuilt;
  *    closed history and untouched keys pass through WITHOUT entering
  *    the rebuild shuffle — the cost is ∝ batch + touched open rows,
  *    never ∝ accumulated history, which is what makes nightly dim
  *    maintenance viable when the history table is itself huge.
  *
  * Correctness contract (and the s27 oracle): merging batches
  * incrementally must be EXACTLY equivalent to rebuilding from the full
  * concatenated stream — the DuckDB oracle computes the from-scratch
  * history while the entry computes initial-load + merge, so the hash
  * match proves incremental ≡ batch rebuild, the invariant incremental
  * view maintenance lives or dies on (same posture as s16).
  */
object Scd2 {

  /** Observation stream → SCD2 history. Input must be unique per
    * (key, ts) — pre-aggregate multi-observations (s27 takes the min
    * attr per day) so the run-length window has a total order. */
  def fromObservations(obs: DataFrame): DataFrame = {
    val byTs = Window.partitionBy("key").orderBy("ts")
    val runs = obs
      .withColumn("prev", lag(col("attr"), 1).over(byTs))
      .withColumn("chg", when(col("prev").isNull || col("prev") =!= col("attr"), 1L)
                           .otherwise(0L))
      .withColumn("run", sum(col("chg")).over(byTs))
    // attr is constant within a run; min is the cheapest combiner
    val ver = runs.groupBy(col("key"), col("run"))
      .agg(min(col("attr")).as("attr"), min(col("ts")).as("valid_from"))
    ver
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(Window.partitionBy("key").orderBy("valid_from")))
      .withColumn("is_current", col("valid_to").isNull)
      .select("key", "attr", "valid_from", "valid_to", "is_current")
  }

  /** Apply `obs` (all observations strictly later, per key, than
    * anything already in `dim`) to an existing history. The open version
    * of each touched key re-enters the run-length build as a pseudo
    * observation anchored at its own `valid_from`, so an unchanged
    * attribute EXTENDS the version (original valid_from survives) while
    * a changed one closes it at the change timestamp — exactly the
    * from-scratch semantics. */
  def merge(dim: DataFrame, obs: DataFrame): DataFrame = {
    val touched = broadcast(obs.select("key").distinct())
    val openAsObs = dim.filter(col("is_current"))
      .join(touched, Seq("key"), "left_semi")
      .select(col("key"), col("valid_from").as("ts"), col("attr"))
    val rebuilt = fromObservations(openAsObs.unionByName(obs))
    val untouched = dim.join(touched, Seq("key"), "left_anti")
    val closedTouched = dim.filter(!col("is_current"))
      .join(touched, Seq("key"), "left_semi")
    untouched.unionByName(closedTouched).unionByName(rebuilt)
  }
}
