package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** LSM-style durable delta+base store: the incremental-maintenance
  * discipline behind s40's serving indexes, generalizing the
  * [[FingerprintStore]] staging-swap compaction to stores whose rows
  * arrive from an at-least-once streaming sink.
  *
  * Layout under `root`:
  * {{{
  *   base/              compacted relation (writeBase layout) + _FOLDED_UPTO
  *   base.compact/      compaction staging (+ _FOLDED_UPTO, then _STAGED)
  *   delta/batch=<id>/  one per-micro-batch append (writeDelta layout)
  * }}}
  *
  * Exactly-once under foreachBatch replay: a delta is keyed by its
  * micro-batch id and written overwrite-mode, so a replayed batch
  * rewrites the same rows instead of double-appending; once a
  * compaction folds batch ids ≤ `_FOLDED_UPTO` into the base, a replay
  * of a folded id is SKIPPED (its rows are already in the base — the
  * delta-dir-presence idempotency no longer holds after the fold, so
  * the watermark takes over).
  *
  * Compaction is staged exactly like [[FingerprintStore.compact]]:
  * merge(base ∪ deltas) is fully written to `base.compact` (data, then
  * the `_FOLDED_UPTO` watermark, then the `_STAGED` completeness
  * marker) before the store is touched; the swap is
  * delete-base → rename-staging → delete-folded-deltas. [[recover]]
  * repairs a crash at ANY point — staging without `_STAGED` is a dead
  * rewrite (base + deltas untouched) and is cleared; staging WITH
  * `_STAGED` holds the complete merged relation and is rolled forward;
  * folded deltas surviving a crash mid-sweep are re-swept from the
  * base's watermark — and runs before every read, append, and compact
  * (the FingerprintStore discipline), so no caller can observe a
  * half-swapped store.
  *
  * At 100 TB the appends stay batch-sized (an append never reads the
  * store) and compaction is the only store-sized job, scheduled every
  * `compactEvery` batches by the caller — the standard LSM amortization.
  */
final class DeltaStore(
    val root: String,
    schema: StructType,
    /** layout of the compacted base (e.g. partitionBy / sortWithinPartitions)
      * — must write `mode("overwrite")` parquet at the given path */
    writeBase: (DataFrame, String) => Unit,
    /** layout of a per-batch delta — must write `mode("overwrite")` */
    writeDelta: (DataFrame, String) => Unit,
    /** fold rows at compaction (identity for row-grain stores, a
      * key-sum for algebraic-partial stores) */
    merge: DataFrame => DataFrame) {

  private val basePath = s"$root/base"
  private val stagingPath = s"$root/base.compact"
  private val deltaRoot = s"$root/delta"
  private val FoldedMarker = "_FOLDED_UPTO"
  private val StagedMarker = "_STAGED"

  private def fs(s: SparkSession) =
    new Path(root).getFileSystem(s.sessionState.newHadoopConf())

  private def deltaDir(id: Long) = s"$deltaRoot/batch=$id"

  private def deltaIds(s: SparkSession): Seq[Long] = {
    val h = fs(s); val p = new Path(deltaRoot)
    if (!h.exists(p)) Seq.empty
    else h.listStatus(p).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("batch=") => n.drop(6).toLong }
      .sorted
  }

  private def readMarker(s: SparkSession, dir: String): Long = {
    val h = fs(s); val p = new Path(dir, FoldedMarker)
    if (!h.exists(p)) -1L
    else {
      val in = h.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeMarkerFile(s: SparkSession, dir: String, name: String,
                              content: String): Unit = {
    val out = fs(s).create(new Path(dir, name), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Highest micro-batch id already folded into the base (-1 if none) —
    * appends at or below it are replays of folded batches and are
    * skipped. */
  def foldedUpto(s: SparkSession): Long = readMarker(s, basePath)

  /** Highest batch id this store can serve a consistent reader-side
    * view at: max(effective base's folded watermark, newest live
    * delta); -1 for an empty store. Reader-side (no recover) — the
    * effective base resolves a completed-but-unswapped staging exactly
    * like [[readOnly]]. A group of stores written by one owner stream
    * agrees on a COMMON as-of point at `min` over their values
    * (the gateway's torn-read fix, ADVICE r17). */
  def readOnlyMaxBatch(s: SparkSession): Long = {
    val h = fs(s); val st = new Path(stagingPath)
    val staged = h.exists(st) && h.exists(new Path(st, StagedMarker))
    val effBase = if (staged) stagingPath else basePath
    val ids = deltaIds(s)
    math.max(readMarker(s, effBase), if (ids.isEmpty) -1L else ids.max)
  }

  /** Repair a compaction interrupted at any point; called before every
    * read/append/compact. See the class doc for the case analysis. */
  def recover(s: SparkSession): Unit = {
    val h = fs(s); val st = new Path(stagingPath)
    if (h.exists(st)) {
      if (h.exists(new Path(st, StagedMarker))) {
        // staging is the complete merged relation — roll the swap forward
        h.delete(new Path(basePath), true)
        if (!h.rename(st, new Path(basePath)))
          throw new IllegalStateException(
            s"DeltaStore $root: could not finish interrupted compact " +
              s"(rename $stagingPath -> $basePath failed)")
      } else {
        // dead rewrite: base and deltas were never touched
        h.delete(st, true)
      }
    }
    // re-sweep deltas the fold consumed (crash mid-sweep, or the
    // roll-forward above); watermark lives in the base
    val upto = foldedUpto(s)
    if (upto >= 0)
      deltaIds(s).filter(_ <= upto)
        .foreach(id => h.delete(new Path(deltaDir(id)), true))
  }

  /** Append one micro-batch's rows. Overwrite-per-batch-dir makes a
    * replayed batch idempotent; a batch already folded into the base is
    * skipped entirely. */
  def append(s: SparkSession, batchId: Long, rows: DataFrame): Unit = {
    recover(s)
    if (batchId > foldedUpto(s)) writeDelta(rows, deltaDir(batchId))
  }

  /** The current store relation: base ∪ live deltas, read with the
    * explicit schema (partition-column types included — discovery would
    * narrow them). Empty store reads as an empty relation. */
  def read(s: SparkSession): DataFrame = {
    recover(s)
    val h = fs(s)
    val parts =
      (if (h.exists(new Path(basePath)))
         Seq(s.read.schema(schema).parquet(basePath)) else Seq.empty) ++
      deltaIds(s).map(id => s.read.schema(schema).parquet(deltaDir(id)))
    val cols = schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq
    if (parts.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else parts.map(_.select(cols: _*)).reduce(_.unionByName(_))
  }

  /** The current store relation WITHOUT repairing anything — the
    * READER-side twin of [[read]] for processes that do not own the
    * store (the gateway serving a live index while a maintenance stream
    * writes it). [[recover]] mutates (it deletes dead staging, rolls
    * forward completed swaps, re-sweeps folded deltas), so a non-owner
    * calling [[read]] could destroy a writer's in-progress compaction
    * staging. This method instead RESOLVES every crash/in-flight state
    * read-only:
    *  - staging WITHOUT `_STAGED` is a dead or in-progress rewrite —
    *    ignored (base + deltas are untouched and authoritative);
    *  - staging WITH `_STAGED` is the complete merged relation — it is
    *    the base-elect, and is read AS the base (covers the window
    *    where the owner has deleted the old base but not finished the
    *    rename);
    *  - deltas at or below the effective base's `_FOLDED_UPTO`
    *    watermark are already folded into it (crash mid-sweep) —
    *    excluded, so nothing double-counts.
    * The one inconsistency window is file-grain: a scan planned against
    * a delta dir the owner deletes mid-read can fail transiently — the
    * caller retries; nothing is ever silently wrong.
    *
    * `asOf` (default unbounded) excludes deltas ABOVE the given batch
    * id, so a reader of several stores written by one owner stream can
    * pin them all to one corpus as-of point (`min` of their
    * [[readOnlyMaxBatch]]s) instead of seeing a torn cross-store state
    * where one store already carries a batch another does not (ADVICE
    * r17). The base cannot be rewound — callers must pass
    * asOf ≥ this store's folded watermark, enforced loudly here. */
  def readOnly(s: SparkSession, asOf: Long = Long.MaxValue): DataFrame = {
    val h = fs(s); val st = new Path(stagingPath)
    val staged = h.exists(st) && h.exists(new Path(st, StagedMarker))
    val effBase = if (staged) stagingPath else basePath
    val upto = readMarker(s, effBase)
    require(asOf >= upto,
      s"DeltaStore $root: readOnly asOf=$asOf precedes the base's folded " +
        s"watermark $upto — a compacted base cannot be rewound; re-derive " +
        "the common as-of point and retry")
    val parts =
      (if (h.exists(new Path(effBase)))
         Seq(s.read.schema(schema).parquet(effBase)) else Seq.empty) ++
      deltaIds(s).filter(id => id > upto && id <= asOf)
        .map(id => s.read.schema(schema).parquet(deltaDir(id)))
    val cols = schema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq
    if (parts.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else parts.map(_.select(cols: _*)).reduce(_.unionByName(_))
  }

  /** Fold all live deltas (and the current base) into a fresh base via
    * the staged swap. No-op when no deltas exist unless `force` (a
    * retention pass must be able to expire base rows with no new data —
    * the ClickHouse TTL-at-merge posture, s46).
    *
    * `extra` composes AFTER the store's merge fn — the retention hook:
    * a caller-supplied filter applied to the fully merged relation at
    * the one point the store is already being rewritten, so expiry
    * costs nothing beyond the compaction that was happening anyway
    * (the B3 `EventStore.dropOlderThan` semantic at the index layer). */
  def compact(s: SparkSession, extra: DataFrame => DataFrame = identity,
              force: Boolean = false): Unit = {
    recover(s)
    if (deltaIds(s).isEmpty && !force) return
    rebase(s, extra(merge(read(s))))
  }

  /** Replace the base with `rows` via the same staged swap, folding all
    * live deltas' ids into the watermark — the compaction form for
    * DERIVED stores: a store whose exact post-expiry value is a
    * function of ANOTHER store's retained rows (s46's df/stats, which
    * are integer sums over expired-doc contributions that a row filter
    * cannot subtract) rebases onto the re-derived relation instead of
    * folding its own rows. Crash-recoverable at every point exactly
    * like [[compact]] — same staging, markers, swap, and sweep. */
  def rebase(s: SparkSession, rows: DataFrame): Unit = {
    recover(s)
    val ids = deltaIds(s)
    val upto = math.max(foldedUpto(s), ids.foldLeft(-1L)(math.max))
    val h = fs(s)
    // stage the full replacement relation first — the store is not
    // touched until the staging carries its completeness marker
    writeBase(rows, stagingPath)
    writeMarkerFile(s, stagingPath, FoldedMarker, upto.toString)
    writeMarkerFile(s, stagingPath, StagedMarker, "")
    h.delete(new Path(basePath), true)
    if (!h.rename(new Path(stagingPath), new Path(basePath)))
      throw new IllegalStateException(
        s"DeltaStore $root: compact rename $stagingPath -> $basePath failed")
    ids.foreach(id => h.delete(new Path(deltaDir(id)), true))
  }
}
