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

  /** Finish or clear a [[compact]] interrupted mid-swap — called before
    * every read or write of the store. compact's swap is
    * write-staging → delete-store → rename-staging; a crash between the
    * last two leaves the store ABSENT with all history only in
    * `<store>.compact`, and without recovery `known()` would read that
    * as an empty store and silently re-admit every previously-seen
    * document. Resolution mirrors EventStore.compact's recover-or-clear:
    *  - staging complete (parquet `_SUCCESS`) + store absent → finish
    *    the rename;
    *  - store present → the crash was before the delete; staging is a
    *    dead (possibly partial) rewrite → clear it;
    *  - staging INCOMPLETE + store absent → unrecoverable state that a
    *    crashing compact cannot produce (the store is only deleted after
    *    staging is fully written) → fail loudly rather than guess. */
  private def recoverStaging(spark: SparkSession, store: String): Unit = {
    val p = new Path(store); val st = new Path(store + ".compact")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(st)) return
    val complete = fs.exists(new Path(st, "_SUCCESS"))
    if (fs.exists(p)) {
      fs.delete(st, true)
    } else if (complete) {
      if (!fs.rename(st, p))
        throw new IllegalStateException(
          s"could not finish interrupted compact: rename $st -> $p failed")
    } else {
      throw new IllegalStateException(
        s"fingerprint store $store is absent and staging $st is incomplete " +
        "(no _SUCCESS) — refusing to treat history as empty")
    }
  }

  /** Append the distinct fingerprints of `docs` (no survivors returned —
    * seed/bootstrap path for corpora that are already deduped). */
  def ingest(docs: DataFrame, store: String, textCol: String = "text"): Unit = {
    // recover BEFORE appending: an append that recreates a store deleted
    // by a crashed compact would make the staging dir look like a dead
    // rewrite and lose all pre-compact history on the next recovery
    recoverStaging(docs.sparkSession, store)
    docs.select(fpCol(textCol)).distinct()
      .write.mode("append").parquet(store)
  }

  /** The stored fingerprint relation; empty (not an error) for a store
    * that does not exist yet — a first batch dedups against nothing. A
    * store left mid-compact by a crash is recovered first (see
    * [[recoverStaging]]); only a store with neither data nor staging
    * reads as empty. */
  def known(spark: SparkSession, store: String): DataFrame = {
    recoverStaging(spark, store)
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
    * many appends). Overwrite-via-staging: the distinct rewrite is fully
    * materialized at `<store>.compact` before the store is touched, and
    * a crash anywhere in the swap is repaired by [[recoverStaging]] on
    * the next read or write — the store is never silently half-written
    * OR silently empty. */
  def compact(spark: SparkSession, store: String): Unit = {
    recoverStaging(spark, store)
    val staging = store + ".compact"
    spark.read.parquet(store).select(col("fp")).distinct()
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val p = new Path(store); val st = new Path(staging)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.delete(p, true) || !fs.rename(st, p))
      throw new IllegalStateException(s"compact failed for $store")
  }
}
