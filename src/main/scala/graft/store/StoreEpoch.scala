package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The STORE-GROUP retention epoch — a seqlock over a group of
  * DeltaStores maintained by one owner stream (the s40/s46/s50 serving
  * roots).
  *
  * Why it exists (ADVICE r18 → VERDICT r19 task 2): one retention pass
  * compacts tf/ivf at the new watermark BEFORE df and the corpus stats
  * are rebased from the retained postings. Batch ids do not change
  * across that window, so the cross-store as-of pin (min over
  * [[DeltaStore.readOnlyMaxBatch]]s) cannot detect it — a non-owner
  * reader landing between the tf compact and the df rebase would serve
  * retained postings against PRE-expiry idf/avgdl. The epoch makes the
  * whole pass observable, the same way the batch-id watermark makes
  * appends observable:
  *
  *  - the OWNER brackets every retention pass with [[begin]] (counter →
  *    odd) and [[end]] (counter → even), stamped at the store-group
  *    root via the same tmp-file + atomic-rename protocol as the
  *    DeltaStore markers;
  *  - a READER takes [[read]] before assembling its views and again
  *    after: the assembly is consistent iff both reads are the SAME
  *    EVEN value (no pass in progress, no pass started meanwhile).
  *    An odd value means mid-merge — refuse and retry, never serve
  *    skewed scores.
  *
  * At 100 TB this is one ~16-byte file read per request against the
  * store root's filesystem — O(1), no scan, no lock held by readers.
  * A store root that predates the epoch (or was never retention-merged)
  * reads as 0, which is even: plain append-only owners need no changes.
  */
object StoreEpoch {
  private val EpochFile = "_RETENTION_EPOCH"

  private def fs(s: SparkSession, root: String) =
    new Path(root).getFileSystem(s.sessionState.newHadoopConf())

  /** Current epoch; 0 when the root or marker does not exist (even =
    * consistent — a never-merged store group is always serveable). */
  def read(s: SparkSession, root: String): Long = {
    val h = fs(s, root)
    val p = new Path(root, EpochFile)
    if (!h.exists(p)) 0L
    else {
      val in = h.open(p)
      try {
        val txt = scala.io.Source.fromInputStream(in).mkString.trim
        if (txt.isEmpty) 0L else txt.toLong
      } finally in.close()
    }
  }

  private def write(s: SparkSession, root: String, v: Long): Unit = {
    val h = fs(s, root)
    val tmp = new Path(root, s".$EpochFile.tmp")
    val dst = new Path(root, EpochFile)
    val out = h.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    h.delete(dst, false)
    if (!h.rename(tmp, dst))
      throw new IllegalStateException(
        s"StoreEpoch: could not publish epoch $v at $root")
  }

  /** Owner-side: mark a retention pass OPEN (idempotent — a crashed
    * pass leaves the epoch odd, and the resumed pass re-begins on the
    * same odd value rather than double-incrementing). */
  def begin(s: SparkSession, root: String): Unit = {
    val v = read(s, root)
    if (v % 2 == 0) write(s, root, v + 1)
  }

  /** Owner-side: mark the pass COMPLETE (idempotent likewise). */
  def end(s: SparkSession, root: String): Unit = {
    val v = read(s, root)
    if (v % 2 == 1) write(s, root, v + 1)
  }
}
