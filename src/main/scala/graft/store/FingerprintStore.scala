package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Durable cross-run exact-dedup state: the "dedup today's crawl
  * against all history" operator a continuously-ingesting training-data
  * pipeline needs. History is represented by its content FINGERPRINTS
  * alone, persisted as a parquet relation — at 100 TB of text the
  * fingerprint store is ~32 bytes/doc (three orders of magnitude
  * smaller than the corpus), so each new batch pays one left-anti
  * semi-join against the store instead of ever rescanning history text.
  *
  * Contract: `dedupAgainst` keeps the lowest-id row per fingerprint
  * WITHIN the batch (same keeper rule as [[graft.operators.Dedup.exact]])
  * and drops rows whose fingerprint is already stored, then appends the
  * SURVIVORS' fingerprints — so calling it again with overlapping data
  * drops everything previously admitted, across JVM restarts. Appends
  * are distinct-per-batch, not globally distinct: the store may hold a
  * fingerprint more than once after concurrent ingests and the
  * left-anti join is indifferent to that; `compact` rewrites it
  * distinct when the file count grows.
  */
object FingerprintStore {

  private def fpCol(textCol: String) = TF.fingerprint(col(textCol)).as("fp")

  /** Append the distinct fingerprints of `docs` (no survivors returned —
    * seed/bootstrap path for corpora that are already deduped). */
  def ingest(docs: DataFrame, store: String, textCol: String = "text"): Unit =
    docs.select(fpCol(textCol)).distinct()
      .write.mode("append").parquet(store)

  /** The stored fingerprint relation; empty (not an error) for a store
    * that does not exist yet — a first batch dedups against nothing. */
  def known(spark: SparkSession, store: String): DataFrame = {
    val p = new Path(store)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(store).select(col("fp"))
    else spark.range(0).select(lit("").as("fp")).limit(0)
  }

  /** Admit `batch` against the store: keep the lowest-`idCol` row per
    * fingerprint within the batch, drop fingerprints already stored,
    * append the survivors' fingerprints, return the surviving rows
    * (original columns + `fp`).
    *
    * The survivor relation is pinned with `localCheckpoint` BEFORE the
    * append: the returned frame must keep answering from the pre-append
    * store view, not silently anti-join itself away when re-collected
    * after its own fingerprints land. */
  def dedupAgainst(spark: SparkSession, store: String, batch: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val cols = batch.columns
    val withFp = batch.withColumn("fp", TF.fingerprint(col(textCol)))
    val firstPer = withFp
      .groupBy(col("fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__r"))
      .select(col("fp") +: cols.map(c => col(s"__r.`$c`").as(c)): _*)
    val survivors = firstPer.join(known(spark, store), Seq("fp"), "left_anti")
      .localCheckpoint()
    survivors.select(col("fp")).write.mode("append").parquet(store)
    survivors.select(cols.map(col) :+ col("fp"): _*)
  }

  /** Rewrite the store distinct (file-count + duplicate-fp hygiene after
    * many appends). Same overwrite-via-staging shape as
    * [[EventStore.compact]]: never leaves the store half-written. */
  def compact(spark: SparkSession, store: String): Unit = {
    val staging = store + ".compact"
    spark.read.parquet(store).select(col("fp")).distinct()
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val p = new Path(store); val st = new Path(staging)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.delete(p, true) || !fs.rename(st, p))
      throw new IllegalStateException(s"compact failed for $store")
  }
}
