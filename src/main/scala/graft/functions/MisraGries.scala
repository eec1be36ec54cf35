package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Misra-Gries summary: ≤ k (key, counter) pairs in parallel arrays with
  * an explicit `used` watermark. The arrays are CAPACITY-managed (grown
  * by doubling up to k, then mutated in place): the previous
  * `keys :+ token` grow-by-copy made every new-key insert O(k), and the
  * steady state after each decrement-compaction re-admits thousands of
  * keys — measured 30× slower per token at k = 10⁴ than k = 10²
  * (caught by the relative probe guard in MisraGriesSpec). With in-place
  * inserts the kernel is amortized O(1) per token as the algorithm
  * promises. Slots at index ≥ used are garbage; every consumer reads
  * only [0, used).
  *
  * `idx` is a lazily (re)built token→slot hash index so the per-token
  * probe is O(1); a body field, never serialized, rebuilt after ser/de.
  */
case class MGState(keys: Array[String], counts: Array[Long], used: Int) {
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
    MGState(Array.empty[String], Array.emptyLongArray, 0)

  /** O(1) hash probe for `token`'s slot, (re)building the transient
    * index on first use after construction or ser/de. */
  private def slotOf(b: MGState, token: String): Int = {
    if (b.idx == null) {
      val m = new java.util.HashMap[String, Integer](math.max(8, b.used * 2))
      var i = 0
      while (i < b.used) { m.put(b.keys(i), i); i += 1 }
      b.idx = m
    }
    val v = b.idx.get(token)
    if (v == null) -1 else v.intValue
  }

  override def reduce(b: MGState, token: String): MGState = {
    val idx = slotOf(b, token)
    if (idx >= 0) { b.counts(idx) += 1; b }
    else if (b.used < b.keys.length) {
      // free capacity: in-place append, O(1)
      b.keys(b.used) = token
      b.counts(b.used) = 1L
      b.idx.put(token, b.used)
      val nb = MGState(b.keys, b.counts, b.used + 1)
      nb.idx = b.idx
      nb
    } else if (b.keys.length < k) {
      // grow by doubling (amortized O(1) per insert), capped at k
      val cap = math.min(k, math.max(8, b.keys.length * 2))
      val nk = java.util.Arrays.copyOf(b.keys, cap)
      val nc = java.util.Arrays.copyOf(b.counts, cap)
      nk(b.used) = token
      nc(b.used) = 1L
      val nb = MGState(nk, nc, b.used + 1)
      b.idx.put(token, b.used) // index maps token→slot; slots unchanged
      nb.idx = b.idx
      nb
    } else {
      // full and unseen: decrement every counter, compact IN PLACE — the
      // classic MG step charging one occurrence of each tracked key.
      // O(k), but it fires at most n/(k+1) times over a partition, so it
      // amortizes to O(1) per token.
      var i = 0; var j = 0
      while (i < k) {
        b.counts(i) -= 1
        if (b.counts(i) > 0) {
          if (j != i) { b.keys(j) = b.keys(i); b.counts(j) = b.counts(i) }
          j += 1
        }
        i += 1
      }
      if (j == k) b // nothing evicted: keys and index unchanged
      else {
        // the buffer encoder serializes the FULL arrays (there is no
        // pre-shuffle hook on an Aggregator), so garbage past `used`
        // ships with every partial. Keep it bounded and string-free:
        // shrink when under half-full (O(k), amortized free — the
        // compaction that got us here is already O(k)), otherwise null
        // the stale slots. Capacity never exceeds ~2× used, so the
        // serialized waste is < 2× payload with zero dead strings.
        val cap = math.max(8, 2 * j)
        val nb =
          if (cap < b.keys.length) {
            val nk = java.util.Arrays.copyOf(b.keys, cap)
            val nc = java.util.Arrays.copyOf(b.counts, cap)
            java.util.Arrays.fill(nk.asInstanceOf[Array[AnyRef]], j, cap, null)
            java.util.Arrays.fill(nc, j, cap, 0L)
            MGState(nk, nc, j)
          } else {
            java.util.Arrays.fill(b.keys.asInstanceOf[Array[AnyRef]], j, b.keys.length, null)
            java.util.Arrays.fill(b.counts, j, b.counts.length, 0L)
            MGState(b.keys, b.counts, j)
          }
        nb.idx = null // slots moved — lazily rebuilt for the survivors
        nb
      }
    }
  }

  override def merge(x: MGState, y: MGState): MGState =
    if (y.used == 0) x
    else if (x.used == 0) y
    else {
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      var i = 0
      while (i < x.used) { m(x.keys(i)) = x.counts(i); i += 1 }
      i = 0
      while (i < y.used) {
        m(y.keys(i)) = m.getOrElse(y.keys(i), 0L) + y.counts(i); i += 1
      }
      if (m.size <= k) MGState(m.keys.toArray, m.values.toArray, m.size)
      else {
        // subtract the (k+1)-th largest count, keep strictly positive —
        // deterministic given the combined map (sort by count desc then
        // key asc before cutting)
        val sorted = m.toArray.sortBy { case (key, c) => (-c, key) }
        val cut = sorted(k)._2
        val kept = sorted.iterator.map { case (key, c) => (key, c - cut) }
          .filter(_._2 > 0).toArray
        MGState(kept.map(_._1), kept.map(_._2), kept.length)
      }
    }

  /** (token, estimate) sorted by (estimate desc, token asc). */
  override def finish(b: MGState): Array[ScoredS] =
    (0 until b.used).map(i => ScoredS(b.counts(i).toDouble, b.keys(i)))
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
