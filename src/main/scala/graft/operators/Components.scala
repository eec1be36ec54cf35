package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the dedup-group
  * RESOLUTION step every near-dup operator in [[Dedup]] feeds: pair
  * relations (id_a, id_b) say "these two are duplicates", but a pipeline
  * keeps ONE document per transitive group, so the pairs must become
  * (doc, component) labels with a canonical representative (the minimum
  * id of the group).
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
  * and Beyond", SoCC'14). Each round is two groupBy+join passes over the
  * edge relation; the edge set provably shrinks toward a forest of stars
  * whose centers are the component minima, converging in O(log² n)
  * rounds (O(log n) in practice) REGARDLESS of graph diameter — unlike
  * naive label propagation, whose round count is the diameter (a 10⁶-long
  * chain of near-identical crawl snapshots would need 10⁶ rounds).
  *
  * Scale shape (the 100 TB posture):
  *  - per round: one partial-aggregated groupBy(min) + one equi-join —
  *    both hash-shuffles on the node id, never anything quadratic;
  *  - `localCheckpoint` after every round truncates the lineage, so the
  *    plan stays O(1) deep instead of O(rounds) (the standard Spark
  *    iterative-algorithm pattern — GraphFrames does the same);
  *  - convergence is detected by a constant-size signature aggregate
  *    (edge count + order-free hash sum), one cheap job per round;
  *  - non-convergence inside `maxIter` throws rather than returning a
  *    silently-partial labeling.
  */
object Components {

  /** (node → component-minimum) for every node that appears in `pairs`.
    * Output columns: (`doc_id`, `component`), both long; `component` is
    * the smallest id in the node's connected component. Ids must be
    * integral (same contract as the near-dup operators that produce the
    * pairs). Self-pairs are ignored; duplicate pairs are fine. */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 50): DataFrame = {
    // canonical directed representation: every edge points big → small
    var edges = pairs
      .select(col(idA).cast("long").as("x"), col(idB).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("src"),
              least(col("x"), col("y")).as("dst"))
      .distinct()
      .localCheckpoint()

    // large-star: every neighbor v > u links to min(Γ(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("src"), col("dst"))
        .union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src"))
        .agg(least(min(col("dst")), col("src")).as("m"))
      sym.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // small-star: u and its smaller neighbors all link to their min
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy(col("src")).agg(min(col("dst")).as("m"))
      e.join(mins, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // order-free constant-size signature of the edge set: equal signature
    // across a round ⇒ the set is a fixpoint of both stars ⇒ converged.
    // XOR-fold of per-edge hashes (edges are distinct, so nothing
    // cancels) — unlike a sum it cannot overflow under ANSI arithmetic
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count("*"),
        coalesce(bit_xor(xxhash64(col("src"), col("dst"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    var sig = signature(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      edges = smallStar(largeStar(edges)).localCheckpoint()
      val next = signature(edges)
      converged = next == sig
      sig = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
        "a partial labeling would be silently wrong; raise maxIter")

    // converged state is a forest of stars: every non-root points at its
    // component minimum; roots are the minima themselves
    edges.select(col("src").as("doc_id"), col("dst").as("component"))
      .union(edges.select(col("dst").as("doc_id"), col("dst").as("component")))
      .groupBy(col("doc_id")).agg(min(col("component")).as("component"))
  }

  /** Group summary over a component labeling: one row per dedup group
    * with its canonical keeper (= component id, the group minimum) and
    * size — the relation a pipeline joins back to keep one doc per
    * group. */
  def groupStats(labels: DataFrame): DataFrame =
    labels.groupBy(col("component"))
      .agg(count("*").as("group_size"), min(col("doc_id")).as("keeper"))

  /** The full dedup RESOLUTION a pipeline actually ships: keep exactly
    * one document per near-dup group — the best one by `quality`
    * (doc_id-tie-broken), not the arbitrary minimum id. Documents that
    * appear in no pair are their own singleton group and always
    * survive.
    *
    * `labels` is a [[connectedComponents]] output; `docs` is the full
    * corpus. Scale shape: the labels relation holds only documents that
    * occur in a candidate pair (a vanishing fraction of the corpus, so
    * the left join is broadcast-able), and the keeper choice is ONE
    * partial-aggregable max_by aggregation — map tasks pre-reduce each
    * group to a single candidate, so the exchange carries one row per
    * (task, group), never the corpus (the rank window this replaces
    * shuffled every labeled row and sorted each group on one task).
    *
    * Output: (component, keeper, group_size, quality) — one row per
    * group; `quality` is the surviving document's score. */
  def keepBest(docs: DataFrame, labels: DataFrame, quality: Column,
               idCol: String = "doc_id"): DataFrame = {
    val labeled = docs
      .select(col(idCol).cast("long").as("doc_id"), quality.as("quality"))
      .join(labels.withColumnRenamed("doc_id", "__lid"),
            col("doc_id") === col("__lid"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
      .drop("__lid")
    labeled
      .groupBy(col("component"))
      .agg(
        count(lit(1)).as("group_size"),
        // argmax (quality desc, doc_id asc): struct ordering is
        // lexicographic, so maximize (quality, -doc_id)
        max_by(struct(col("doc_id"), col("quality")),
               struct(col("quality"), -col("doc_id"))).as("__best"))
      .select(col("component"), col("__best.doc_id").as("keeper"),
              col("group_size"), col("__best.quality").as("quality"))
  }
}
