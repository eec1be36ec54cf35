package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  /** In-memory union-find oracle. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("random graph labeling equals union-find") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    assert(labelsOf(pairs) == unionFind(pairs))
  }

  test("long chain (worst-case diameter) converges to one component") {
    // naive label propagation needs 99 rounds here; large-star/small-star
    // must do it within the default maxIter via doubling
    val chain = (0L until 99L).map(i => (i, i + 1))
    val labels = labelsOf(chain)
    assert(labels.size == 100)
    assert(labels.values.toSet == Set(0L))
  }

  test("self-pairs and duplicate pairs are tolerated; singletons with only self-pairs vanish") {
    val labels = labelsOf(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty pair list yields empty labeling") {
    val empty = Seq.empty[(Long, Long)]
    assert(labelsOf(empty).isEmpty)
  }

  test("groupStats: keeper is the component minimum, sizes add up") {
    val labels = Components.connectedComponents(
      Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("id_a", "id_b"))
    val stats = Components.groupStats(labels)
      .as[(Long, Long, Long)].collect().toSet // (component, group_size, keeper)
    assert(stats == Set((10L, 3L, 10L), (40L, 2L, 40L)))
  }

  test("fixture documents: planted near-dup groups resolve transitively") {
    val pairs = Dedup.ngramJaccardPairs(
      graft.Tables.documents(spark, TestSpark.Sf0001), threshold = 0.5)
    val pairSeq = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairSeq.nonEmpty)
    val labels = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == unionFind(pairSeq))
    // every labeled node appears in some pair, and components are closed
    // under the pair relation
    pairSeq.foreach { case (a, b) => assert(labels(a) == labels(b)) }
  }

  test("keepBest: one keeper per group, singletons survive, keeper maximizes quality") {
    val docs = graft.Tables.documents(spark, TestSpark.Sf0001)
    val labels = Components.connectedComponents(
      Dedup.ngramJaccardPairs(docs, threshold = 0.5))
    val quality = graft.functions.TextFunctions.qualityScore(col("text"))
    val kept = Components.keepBest(docs, labels, quality)
      .as[(Long, Long, Long, Double)].collect() // (component, keeper, size, quality)

    val nDocs = docs.count()
    assert(kept.map(_._3).sum == nDocs, "group sizes must partition the corpus")
    assert(kept.map(_._1).distinct.length == kept.length, "one row per component")
    // singletons: docs in no pair keep themselves
    val inPairs = labels.select("doc_id").as[Long].collect().toSet
    val singles = kept.filter(r => !inPairs.contains(r._2))
    assert(singles.forall(r => r._1 == r._2 && r._3 == 1L))
    assert(singles.nonEmpty && singles.length < kept.length)
    // the keeper's quality is the maximum of its group (checked on the
    // non-trivial groups via an independent recomputation)
    val labelMap = labels.as[(Long, Long)].collect().toMap
    val qual = docs.select(col("doc_id"), quality.as("q"))
      .as[(Long, Double)].collect().toMap
    kept.filter(_._3 > 1).foreach { case (comp, keeper, _, q) =>
      val members = labelMap.collect { case (d, c) if c == comp => d }
      val best = members.map(qual).max
      assert(q == best && qual(keeper) == best,
        s"component $comp keeper $keeper quality $q != group max $best")
    }
  }
}
