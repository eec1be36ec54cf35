package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The KMV contract (x75): the sketch is exactly the k smallest distinct
  * hashes regardless of arrival order or partitioning; below-k sketches
  * are the exact distinct set; the distinct / union / intersection
  * estimates hit their published error bounds on a planted overlap. */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def agg(k: Int) = new KmvAggregator(k)

  private def reduceAll(a: KmvAggregator, vs: Seq[Long]): KmvState =
    vs.foldLeft(a.zero)(a.reduce)

  test("sketch is the k smallest distinct values, any order, any split") {
    val k = 16
    val a = agg(k)
    val vs = Random.shuffle((1L to 500L).flatMap(v => Seq(v * 7919L % 100000L)))
    val expect = vs.distinct.sorted.take(k)
    assert(reduceAll(a, vs).vs.toSeq == expect)
    // merge across arbitrary splits must agree with the sequential run
    for (cut <- Seq(1, 17, 250, 499)) {
      val (l, r) = vs.splitAt(cut)
      val m = a.merge(reduceAll(a, l), reduceAll(a, r))
      assert(m.vs.toSeq == expect, s"split at $cut diverged")
    }
    // commutativity
    val (l, r) = vs.splitAt(100)
    assert(a.merge(reduceAll(a, r), reduceAll(a, l)).vs.toSeq == expect)
  }

  test("below k distinct values the sketch IS the distinct set") {
    val a = agg(64)
    val vs = Seq.fill(40)(Seq(3L, 1L, 2L)).flatten
    assert(reduceAll(a, vs).vs.toSeq == Seq(1L, 2L, 3L))
  }

  test("distinct estimate within 4/sqrt(k) of truth through Spark's merge path") {
    val k = 256
    val n = 20000
    // deterministic pseudo-hashes uniform in [0, 2^48)
    val rnd = new Random(42)
    val space = KmvAggregator.HashSpace
    val vs = (0 until n).map(_ => math.abs(rnd.nextLong()) % space)
    val distinct = vs.distinct.size
    val sk = vs.toDF("v").repartition(16) // force genuine cross-task merges
      .agg(KmvAggregator.kmv(k)(col("v")).as("sk"))
      .select(col("sk")).as[Array[Long]].head()
    assert(sk.length == k)
    val est = (k - 1).toDouble * space / sk(k - 1)
    val relErr = math.abs(est - distinct) / distinct
    assert(relErr < 4.0 / math.sqrt(k.toDouble),
      s"estimate $est vs $distinct: relative error $relErr")
  }

  test("planted overlap: intersection estimate recovers the true overlap") {
    val k = 256
    val space = KmvAggregator.HashSpace
    val rnd = new Random(7)
    def fresh() = math.abs(rnd.nextLong()) % space
    val shared = Seq.fill(3000)(fresh())
    val onlyA = Seq.fill(5000)(fresh())
    val onlyB = Seq.fill(2000)(fresh())
    val a = agg(k)
    val skA = reduceAll(a, shared ++ onlyA).vs
    val skB = reduceAll(a, shared ++ onlyB).vs
    val uni = (skA ++ skB).distinct.sorted
    val uniK = uni.take(k)
    val bothSet = skA.toSet intersect skB.toSet
    val estUnion = (k - 1).toDouble * space / uniK.last
    val estInter = uniK.count(bothSet).toDouble / k * estUnion
    val trueUnion = (shared ++ onlyA ++ onlyB).distinct.size
    val trueInter = shared.distinct.size
    assert(math.abs(estUnion - trueUnion) / trueUnion < 4.0 / math.sqrt(k.toDouble))
    // intersection compounds two estimates; allow the published 2x factor
    assert(math.abs(estInter - trueInter) / trueInter < 8.0 / math.sqrt(k.toDouble),
      s"intersection estimate $estInter vs $trueInter")
  }

  test("x75 entry: estimator path live at the gate SF and estimates near exact") {
    val dir = "/root/testdata/sf0.01" // gate SF: ~1600 distinct/page > k=256
    val out = graft.queries.InfraQueries.kmvOverlap(spark, dir).collect()
    assert(out.length == 10, "5 pages -> 10 unordered pairs")
    // exact daily-visitor overlap for one pair, straight from the data
    val exact = graft.Tables.clicks(spark, dir)
      .select(col("page"), concat_ws("@", col("user_id"), date_format(col("ts"), "yyyy-MM-dd")).as("e"))
      .distinct().groupBy("page").agg(collect_set("e").as("es"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    val row = out.find(r => r.getString(0) == "click" && r.getString(1) == "error").get
    val (ea, eb) = (exact("click"), exact("error"))
    assert(ea.size > 256, "fixture must exercise the estimator (not exact) path")
    def rel(est: Double, truth: Int) = math.abs(est - truth) / truth
    assert(rel(row.getDouble(2), ea.size) < 0.15, s"est_a ${row.getDouble(2)} vs ${ea.size}")
    assert(rel(row.getDouble(4), (ea ++ eb).size) < 0.15)
    assert(rel(row.getDouble(5), (ea intersect eb).size) < 0.30)
  }
}
