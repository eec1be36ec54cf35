package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable store for a fitted model relation (the x125 quality
  * classifier's weights) plus a fingerprint of the corpus it was fitted
  * on — the FingerprintStore discipline applied to trained artifacts:
  * the expensive fit is paid once per corpus refresh, and every
  * consumer (x133's sampler, the gateway's `model=trained` scoring)
  * LOADS instead of refitting, with a staleness guard that refuses to
  * serve weights against a corpus they were not fitted on (VERDICT r17
  * task 3 — "never silently stale").
  *
  * Layout under `root`:
  * {{{
  *   weights/        parquet (j INT, w DOUBLE); j = dim is the bias row
  *   _FP             fingerprint marker — written LAST, so a crash
  *                   mid-save leaves no marker and the next consumer
  *                   refits instead of loading a torn model
  * }}}
  * The model is O(model) rows by construction (16^QcHexLen + 1), so
  * save/load are driver-trivial at any corpus scale.
  */
object ModelStore {

  private val FpMarker = "_FP"
  private val MetaMarker = "_FP_META"

  /** Count of full-corpus fingerprint scans this JVM has run — the
    * spec hook for the O(metadata) steady-state contract (a counter,
    * not behavior). */
  private[graft] val fpScans = new java.util.concurrent.atomic.AtomicLong(0)

  private def fs(s: SparkSession, root: String) =
    new Path(root).getFileSystem(s.sessionState.newHadoopConf())

  /** Exact integer fingerprint of a (doc_id, text) corpus: row count
    * plus the wrapping long sum of per-row crc32s — order-free (integer
    * sums commute) and cheap (one map-side-combined aggregate). A
    * wrapped sum is still a deterministic fingerprint; only collision
    * resistance is sacrificed, and a 2⁻³² accidental collision is not
    * the failure mode this guards (it guards serving LAST refresh's
    * weights against THIS refresh's corpus). */
  def corpusFingerprint(docs: DataFrame): String = {
    fpScans.incrementAndGet()
    val r = docs
      .agg(count(lit(1)).as("n"),
        coalesce(sum(crc32(concat_ws(":", col("doc_id"), col("text")))),
          lit(0L)).as("s"))
      .collect()(0)
    s"${r.getLong(0)}:${r.getLong(1)}"
  }

  /** O(metadata) staleness tier (VERDICT r18 task 4): a fingerprint of
    * the corpus's UNDERLYING FILES — sorted (path, length, mtime)
    * triples, driver-side FS listing only, no Spark job, no row scan.
    *
    * CONTRACT (ADVICE r19): the equivalence "unchanged (path, length,
    * mtime) list ⇒ unchanged corpus" requires an IMMUTABLE-FILE layout
    * — writers create fresh file names and never rewrite a path in
    * place. Spark/Hive parquet writers satisfy this (part-files carry
    * fresh UUIDs every commit). Do NOT point this at sources that
    * mutate files in place (CSV drops, manually-edited files): mtime
    * granularity is a full second on several stores, so a same-path
    * same-length in-place rewrite inside that window would silently
    * serve a stale model — the exact failure the row fingerprint
    * exists to prevent. When in doubt, skip this tier; a changed list
    * already falls back to the row-level [[corpusFingerprint]].
    *
    * Listing is BATCHED per parent directory (ADVICE r19): one
    * `listStatus` RPC per directory instead of one `getFileStatus` per
    * file — at the many-thousand-part-file scale this tier exists for,
    * per-file round trips against a namenode/object store would erode
    * the very saving it was added for. None for relations with no file
    * lineage (in-memory test frames) — those always take the full-scan
    * path. */
  def metaFingerprint(docs: DataFrame): Option[String] = {
    val files = docs.inputFiles
    if (files.isEmpty) None
    else {
      val s = docs.sparkSession
      val conf = s.sessionState.newHadoopConf()
      // normalize through Path: inputFiles says file:///x, a qualified
      // FileStatus path says file:/x — compare one canonical form
      val wanted = files.map(f => new Path(f).toString).toSet
      // one listStatus per parent directory; keep only the lineage's
      // own files (a directory may hold other writers' output)
      val stats = files.map(f => new Path(f)).groupBy(_.getParent)
        .flatMap { case (dir, _) =>
          dir.getFileSystem(conf).listStatus(dir).toSeq
            .filter(st => wanted.contains(st.getPath.toString))
        }
      val crc = new java.util.zip.CRC32()
      stats.toSeq.sortBy(_.getPath.toString).foreach { st =>
        crc.update(
          s"${st.getPath}:${st.getLen}:${st.getModificationTime};"
            .getBytes("UTF-8"))
      }
      // count the files the LINEAGE names, not the listing: a file the
      // lineage references but the listing missed (renamed mid-probe)
      // must change the fingerprint rather than vanish silently
      if (stats.size != files.length) None
      else Some(s"${files.length}:${crc.getValue}")
    }
  }

  /** The stored meta-fingerprint, if the last save/refresh recorded
    * one. */
  def loadMeta(s: SparkSession, root: String): Option[String] = {
    val h = fs(s, root)
    val mk = new Path(root, MetaMarker)
    if (!h.exists(mk)) None
    else {
      val in = h.open(mk)
      try Some(scala.io.Source.fromInputStream(in).mkString.trim)
      finally in.close()
    }
  }

  /** Record (or refresh) the meta-fingerprint — written AFTER the row
    * fingerprint marker, so a crash between the two only costs the next
    * consumer one full-scan validation, never a stale load. */
  def saveMeta(s: SparkSession, root: String, meta: Option[String]): Unit = {
    val h = fs(s, root)
    h.delete(new Path(root, MetaMarker), false)
    meta.foreach { m =>
      val out = h.create(new Path(root, MetaMarker), true)
      try out.write(m.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Persist (weights, bias, fingerprint). Crash-safe ordering: the old
    * marker is deleted FIRST (readers refit rather than load a model
    * mid-rewrite), the weight relation is rewritten, the marker lands
    * last. */
  def save(s: SparkSession, root: String, w: Array[Double], b: Double,
           fp: String, meta: Option[String] = None): Unit = {
    import s.implicits._
    val h = fs(s, root)
    h.delete(new Path(root, FpMarker), false)
    h.delete(new Path(root, MetaMarker), false)
    (w.zipWithIndex.map { case (v, j) => (j, v) } :+ (w.length, b))
      .toSeq.toDF("j", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/weights")
    val out = h.create(new Path(root, FpMarker), true)
    try out.write(fp.getBytes("UTF-8")) finally out.close()
    saveMeta(s, root, meta)
  }

  /** Load (weights, bias, fingerprint); None when absent or torn (no
    * marker). The caller compares the fingerprint against the serving
    * corpus and refits on mismatch. */
  def load(s: SparkSession, root: String): Option[(Array[Double], Double, String)] = {
    val h = fs(s, root)
    val mk = new Path(root, FpMarker)
    if (!h.exists(mk) || !h.exists(new Path(s"$root/weights"))) None
    else {
      val in = h.open(mk)
      val fp = try scala.io.Source.fromInputStream(in).mkString.trim
               finally in.close()
      val rows = s.read.parquet(s"$root/weights")
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val dim = rows.keys.max
      require((0 to dim).forall(rows.contains),
        s"model store $root: weight relation has gaps (0..$dim expected)")
      Some((Array.tabulate(dim)(rows(_)), rows(dim), fp))
    }
  }
}
