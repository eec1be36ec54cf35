package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew salting for shuffle joins — the technique for the case
  * AQE's skew-join split cannot fix: a HOT KEY on the probe side of a
  * shuffle join lands that key's entire volume on one reducer. Salting
  * widens the key: the large side gets a deterministic salt in [0, k),
  * the small side is replicated k times, and the join key becomes
  * (key, salt) — the hot key's rows spread over k reducers at the cost
  * of k-replicating the small side's matching rows.
  *
  * When to use which (documented contract, spec-asserted equivalence):
  *  - small side fits in memory → `broadcast()` (no shuffle at all);
  *  - small side too big to broadcast, keys uniform → plain shuffle join;
  *  - small side too big to broadcast, keys skewed → THIS (or AQE, which
  *    can only split a skewed partition when its build side is local).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, salted k ways. `saltBy` must be
    * a deterministic per-row expression on the large side (an id column;
    * NOT rand() — resubmitted tasks must re-derive the same salt or a
    * retried stage double-counts). Result is row-identical to the
    * unsalted join. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltBy: Column, k: Int = 8): DataFrame = {
    require(k > 0, s"salt fan-out must be positive, got $k")
    val salted = large.withColumn("__salt", pmod(xxhash64(saltBy), lit(k)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(k - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
