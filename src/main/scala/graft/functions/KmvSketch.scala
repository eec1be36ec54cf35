package graft.functions

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** KMV buffer: the k smallest DISTINCT hash values seen so far, sorted
  * ascending. A flat long array for cheap tungsten ser/de, same layout
  * rationale as [[MGState]]. */
case class KmvState(vs: Array[Long])

/** K-Minimum-Values ("bottom-k" / theta) distinct sketch — the mergeable
  * summary for SET OPERATIONS over distinct counts that HLL (x39) cannot
  * do: two KMV sketches over the same hash function support union AND
  * intersection estimates, so "how many daily visitors do pages A and B
  * share" needs no re-scan and no pairwise distinct join.
  *
  * Contract (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007): hash
  * each element uniformly into [0, 2^48) and keep the k smallest distinct
  * values. If fewer than k distinct values were seen the sketch IS the
  * distinct set (estimates below are exact); otherwise the unbiased
  * distinct estimate is (k-1) * 2^48 / v_k where v_k is the k-th smallest
  * hash. Two same-k sketches combine losslessly into a union sketch
  * (k smallest of the merged values); the intersection estimate is
  * rho * D_union with rho = |K(A∪B) ∩ A ∩ B| / k (Beyer et al. §4).
  * Relative error is ~1/sqrt(k-2) per sketch (≈6% at k=256).
  *
  * Scale shape: each map task reduces its partition to ≤ k longs per
  * group, so the exchange carries O(tasks · groups · k) — independent of
  * row count and of the distinct cardinality itself. The pairwise
  * overlap matrix is then computed on GROUP-GRAIN sketch rows (array
  * ops on ≤ k-element arrays), never by re-joining the fact table:
  * the ClickHouse analogue is uniqTheta + intersect/union at query time.
  *
  * Reduce cost: O(log k) binary-search probe per row; an O(k) insertion
  * copy only when the value is accepted, which happens ~k·ln(n)/n of the
  * time once the buffer is full — amortized O(1) per row.
  */
class KmvAggregator(k: Int) extends Aggregator[Long, KmvState, Array[Long]] {
  require(k > 1, s"KMV needs k > 1, got $k")

  override def zero: KmvState = KmvState(Array.emptyLongArray)

  override def reduce(b: KmvState, v: Long): KmvState = {
    val vs = b.vs
    val pos = java.util.Arrays.binarySearch(vs, v)
    if (pos >= 0) b // duplicate hash: a KMV sketch is a distinct set
    else {
      val ins = -pos - 1
      if (vs.length < k) {
        val nv = new Array[Long](vs.length + 1)
        System.arraycopy(vs, 0, nv, 0, ins)
        nv(ins) = v
        System.arraycopy(vs, ins, nv, ins + 1, vs.length - ins)
        KmvState(nv)
      } else if (ins < k) {
        // full and v beats the current k-th minimum: shift the tail
        // right by one inside a fresh copy, dropping the old maximum
        val nv = new Array[Long](k)
        System.arraycopy(vs, 0, nv, 0, ins)
        nv(ins) = v
        System.arraycopy(vs, ins, nv, ins + 1, k - ins - 1)
        KmvState(nv)
      } else b // v larger than everything tracked
    }
  }

  override def merge(x: KmvState, y: KmvState): KmvState =
    if (y.vs.isEmpty) x
    else if (x.vs.isEmpty) y
    else {
      // merge two sorted distinct arrays, keep the k smallest
      val a = x.vs; val b = y.vs
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val t = a(i); i += 1; t }
          else { val t = b(j); j += 1; t }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      KmvState(if (n == out.length) out else java.util.Arrays.copyOf(out, n))
    }

  override def finish(b: KmvState): Array[Long] = b.vs

  override def bufferEncoder: ExpressionEncoder[KmvState] =
    ExpressionEncoder[KmvState]()
  override def outputEncoder: ExpressionEncoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object KmvAggregator {
  /** Hash domain: the first 12 hex digits of md5, i.e. [0, 2^48) — 48
    * bits keeps every value exactly representable as a double in BOTH
    * engines (2^48 < 2^53), so the estimate arithmetic is bit-identical
    * between Spark and the DuckDB oracle. */
  val HashBits = 48
  val HashSpace: Long = 1L << HashBits

  /** `kmv(k)(hashCol)` → sorted `array<bigint>` of the ≤ k smallest
    * distinct hash values. */
  def kmv(k: Int): UserDefinedFunction =
    udaf(new KmvAggregator(k), Encoders.scalaLong)
}
