package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate flowing into the top-k heap. */
case class Scored(score: Double, id: Long)

/** Aggregation buffer: parallel arrays sorted by (score desc, id asc),
  * length ≤ k. Parallel primitive arrays rather than an array of structs
  * so the buffer ser/de between partial and final aggregation is two
  * flat copies, no per-element boxing. */
case class TopKState(scores: Array[Double], ids: Array[Long])

/** Bounded-heap per-group top-k — the partial-aggregable replacement for
  * `row_number().over(Window.partitionBy(group))` + `filter(rank <= k)`.
  *
  * Why this exists: a rank window must SHUFFLE the full scored relation
  * (n·|Q| rows for the ANN operators) so each group lands on one task —
  * at 10⁹ items that shuffle, not the scan, is the job, and each group's
  * rows collapse into a single partition (global serialization per
  * group). A typed `Aggregator` plans as ObjectHashAggregate with a
  * partial stage: every map task keeps a size-k heap per group and emits
  * at most k rows per group into the exchange, so the shuffle is
  * O(groups·k) regardless of n, and no single task ever sees a whole
  * group's candidates.
  *
  * Ordering is the strict total order (score desc, id asc) — ids are
  * unique within a group, so the result is deterministic regardless of
  * partial-merge order, exactly matching the window+row_number tie-break
  * it replaces (x10's oracle hash is the proof).
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, TopKState, Array[Scored]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: TopKState =
    TopKState(Array.emptyDoubleArray, Array.emptyLongArray)

  override def reduce(b: TopKState, a: Scored): TopKState = {
    val n = b.ids.length
    // O(1) rejection once the heap is full — the common case on a scan
    if (n >= k && !beats(a.score, a.id, b.scores(n - 1), b.ids(n - 1))) b
    else {
      var p = 0 // insertion point; linear scan is fine at small k
      while (p < n && !beats(a.score, a.id, b.scores(p), b.ids(p))) p += 1
      val m = math.min(n + 1, k)
      val ss = new Array[Double](m); val is = new Array[Long](m)
      System.arraycopy(b.scores, 0, ss, 0, p)
      System.arraycopy(b.ids, 0, is, 0, p)
      ss(p) = a.score; is(p) = a.id
      if (p + 1 < m) {
        System.arraycopy(b.scores, p, ss, p + 1, m - p - 1)
        System.arraycopy(b.ids, p, is, p + 1, m - p - 1)
      }
      TopKState(ss, is)
    }
  }

  override def merge(x: TopKState, y: TopKState): TopKState =
    if (y.ids.isEmpty) x
    else if (x.ids.isEmpty) y
    else {
      val m = math.min(x.ids.length + y.ids.length, k)
      val ss = new Array[Double](m); val is = new Array[Long](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeX = j >= y.ids.length ||
          (i < x.ids.length && beats(x.scores(i), x.ids(i), y.scores(j), y.ids(j)))
        if (takeX) { ss(o) = x.scores(i); is(o) = x.ids(i); i += 1 }
        else       { ss(o) = y.scores(j); is(o) = y.ids(j); j += 1 }
        o += 1
      }
      TopKState(ss, is)
    }

  override def finish(b: TopKState): Array[Scored] =
    Array.tabulate(b.ids.length)(i => Scored(b.scores(i), b.ids(i)))

  override def bufferEncoder: ExpressionEncoder[TopKState] =
    ExpressionEncoder[TopKState]()
  override def outputEncoder: ExpressionEncoder[Array[Scored]] =
    ExpressionEncoder[Array[Scored]]()
}

object TopKAggregator {
  /** `topk(k)(scoreCol, idCol)` → `array<struct<score,id>>` sorted by
    * (score desc, id asc), length ≤ k. Explode with `posexplode` and the
    * position + 1 is the rank. */
  def topk(k: Int): UserDefinedFunction =
    udaf(new TopKAggregator(k), Encoders.product[Scored])

  /** String-id flavor: `topkStr(k)(scoreCol, idCol)`. Same ordering
    * contract — (score desc, id asc, lexicographic). */
  def topkStr(k: Int): UserDefinedFunction =
    udaf(new TopKStringAggregator(k), Encoders.product[ScoredS])
}

/** One (score, string-id) candidate — the token/term flavor of
  * [[Scored]] for vocab-keyed top-k (TF-IDF terms, heavy hitters). */
case class ScoredS(score: Double, id: String)

/** String-id buffer; same parallel-array layout as [[TopKState]]. */
case class TopKStateS(scores: Array[Double], ids: Array[String])

/** [[TopKAggregator]] with String ids — identical bounded-heap
  * semantics and (score desc, id asc) total order, with the id
  * comparison lexicographic (matches `ORDER BY score DESC, id ASC` on
  * a string column in both Spark and DuckDB, which is what lets the
  * hash-checked entries swap their rank windows for this). Caveat:
  * Java compareTo is UTF-16 code-unit order while SQL engines compare
  * UTF-8 bytes — identical on ASCII; rank only ASCII-tokenized ids
  * here (x24/x33 tokens are `[a-z0-9]+`). */
class TopKStringAggregator(k: Int)
    extends Aggregator[ScoredS, TopKStateS, Array[ScoredS]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  private def beats(s1: Double, i1: String, s2: Double, i2: String): Boolean =
    s1 > s2 || (s1 == s2 && i1.compareTo(i2) < 0)

  override def zero: TopKStateS =
    TopKStateS(Array.emptyDoubleArray, Array.empty[String])

  override def reduce(b: TopKStateS, a: ScoredS): TopKStateS = {
    val n = b.ids.length
    if (n >= k && !beats(a.score, a.id, b.scores(n - 1), b.ids(n - 1))) b
    else {
      var p = 0
      while (p < n && !beats(a.score, a.id, b.scores(p), b.ids(p))) p += 1
      val m = math.min(n + 1, k)
      val ss = new Array[Double](m); val is = new Array[String](m)
      System.arraycopy(b.scores, 0, ss, 0, p)
      System.arraycopy(b.ids, 0, is, 0, p)
      ss(p) = a.score; is(p) = a.id
      if (p + 1 < m) {
        System.arraycopy(b.scores, p, ss, p + 1, m - p - 1)
        System.arraycopy(b.ids, p, is, p + 1, m - p - 1)
      }
      TopKStateS(ss, is)
    }
  }

  override def merge(x: TopKStateS, y: TopKStateS): TopKStateS =
    if (y.ids.isEmpty) x
    else if (x.ids.isEmpty) y
    else {
      val m = math.min(x.ids.length + y.ids.length, k)
      val ss = new Array[Double](m); val is = new Array[String](m)
      var i = 0; var j = 0; var o = 0
      while (o < m) {
        val takeX = j >= y.ids.length ||
          (i < x.ids.length && beats(x.scores(i), x.ids(i), y.scores(j), y.ids(j)))
        if (takeX) { ss(o) = x.scores(i); is(o) = x.ids(i); i += 1 }
        else       { ss(o) = y.scores(j); is(o) = y.ids(j); j += 1 }
        o += 1
      }
      TopKStateS(ss, is)
    }

  override def finish(b: TopKStateS): Array[ScoredS] =
    Array.tabulate(b.ids.length)(i => ScoredS(b.scores(i), b.ids(i)))

  override def bufferEncoder: ExpressionEncoder[TopKStateS] =
    ExpressionEncoder[TopKStateS]()
  override def outputEncoder: ExpressionEncoder[Array[ScoredS]] =
    ExpressionEncoder[Array[ScoredS]]()
}
