package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Misra-Gries summary: ≤ k (key, counter) pairs. Parallel arrays for
  * flat ser/de, same layout rationale as [[TopKState]].
  *
  * `idx` is a lazily (re)built token→slot hash index so the per-token
  * probe in [[MisraGriesAggregator.reduce]] is O(1), not an O(k) array
  * scan — at k = 10⁴ (the "top-10k vocab" regime the sketch exists for)
  * the linear probe made reduce quadratic. It is a body field, not a
  * constructor param, so the buffer encoder never serializes it; after
  * ser/de it is null and rebuilt on first probe. */
case class MGState(keys: Array[String], counts: Array[Long]) {
  @transient private[functions] var idx: java.util.HashMap[String, Integer] = _
}

/** Misra-Gries / space-saving APPROXIMATE heavy hitters — the mergeable
  * sketch for "top tokens" when the vocabulary itself is too large to
  * shuffle (the scale regime where even x24's partial-aggregated exact
  * count is a vocabulary-sized exchange).
  *
  * Contract (Misra-Gries 1982; merge per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): after summarizing n items with k counters,
  * every item's estimated count is an UNDER-estimate short by at most
  * n/(k+1) — so any item with true frequency > n/(k+1) is guaranteed
  * present in the summary. Merging two summaries preserves the bound
  * over the combined stream (add counters, then subtract the (k+1)-th
  * largest and drop non-positive).
  *
  * Scale shape: each map task reduces its partition into a k-entry
  * summary; the exchange carries O(tasks · groups · k) — independent of
  * both corpus and vocabulary size. The survivors' exact counts can be
  * recovered afterwards with one semi-join (candidate set is k·groups
  * rows), which is what the registry entry does for a deterministic
  * output.
  *
  * Eviction ties make the SURVIVOR SET order-dependent in general (any
  * MG sketch is); the guarantee above is order-independent, and the
  * spec asserts exactly that.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, MGState, Array[ScoredS]] {
  require(k > 0, s"Misra-Gries needs k > 0, got $k")

  override def zero: MGState =
    MGState(Array.empty[String], Array.emptyLongArray)

  /** O(1) hash probe for `token`'s slot, (re)building the transient
    * index on first use after construction or ser/de. */
  private def slotOf(b: MGState, token: String): Int = {
    if (b.idx == null) {
      val m = new java.util.HashMap[String, Integer](math.max(8, b.keys.length * 2))
      var i = 0
      while (i < b.keys.length) { m.put(b.keys(i), i); i += 1 }
      b.idx = m
    }
    val v = b.idx.get(token)
    if (v == null) -1 else v.intValue
  }

  override def reduce(b: MGState, token: String): MGState = {
    val idx = slotOf(b, token)
    if (idx >= 0) { b.counts(idx) += 1; b }
    else if (b.keys.length < k) {
      val nb = MGState(b.keys :+ token, b.counts :+ 1L)
      // carry the live index over: slotOf(b, _) above guarantees non-null
      b.idx.put(token, b.keys.length)
      nb.idx = b.idx
      nb
    } else {
      // full and unseen: decrement every counter, compact zeros — the
      // classic MG step charging one occurrence of each tracked key.
      // O(k), but it fires at most n/(k+1) times over a partition, so
      // it amortizes to O(1) per token.
      var i = 0; var survivors = 0
      while (i < k) { b.counts(i) -= 1; if (b.counts(i) > 0) survivors += 1; i += 1 }
      if (survivors == k) b // keys unchanged: the index stays valid
      else {
        val ks = new Array[String](survivors); val cs = new Array[Long](survivors)
        var j = 0; i = 0
        while (i < k) {
          if (b.counts(i) > 0) { ks(j) = b.keys(i); cs(j) = b.counts(i); j += 1 }
          i += 1
        }
        MGState(ks, cs) // idx left null — lazily rebuilt for the survivors
      }
    }
  }

  override def merge(x: MGState, y: MGState): MGState =
    if (y.keys.isEmpty) x
    else if (x.keys.isEmpty) y
    else {
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      var i = 0
      while (i < x.keys.length) { m(x.keys(i)) = x.counts(i); i += 1 }
      i = 0
      while (i < y.keys.length) {
        m(y.keys(i)) = m.getOrElse(y.keys(i), 0L) + y.counts(i); i += 1
      }
      if (m.size <= k) MGState(m.keys.toArray, m.values.toArray)
      else {
        // subtract the (k+1)-th largest count, keep strictly positive —
        // deterministic given the combined map (sort by count desc then
        // key asc before cutting)
        val sorted = m.toArray.sortBy { case (key, c) => (-c, key) }
        val cut = sorted(k)._2
        val kept = sorted.iterator.map { case (key, c) => (key, c - cut) }
          .filter(_._2 > 0).toArray
        MGState(kept.map(_._1), kept.map(_._2))
      }
    }

  /** (token, estimate) sorted by (estimate desc, token asc). */
  override def finish(b: MGState): Array[ScoredS] =
    b.keys.indices.map(i => ScoredS(b.counts(i).toDouble, b.keys(i)))
      .sortBy(s => (-s.score, s.id)).toArray

  override def bufferEncoder: ExpressionEncoder[MGState] =
    ExpressionEncoder[MGState]()
  override def outputEncoder: ExpressionEncoder[Array[ScoredS]] =
    ExpressionEncoder[Array[ScoredS]]()
}

object MisraGriesAggregator {
  /** `mg(k)(tokenCol)` → `array<struct<score,id>>`: ≤ k (estimate, token)
    * pairs, estimate an under-count short by at most n/(k+1). */
  def mg(k: Int): UserDefinedFunction =
    udaf(new MisraGriesAggregator(k), Encoders.STRING)
}
