package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assets = Multimodal.assetsFromDocuments(
    spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet").limit(50))

  test("feature extraction is deterministic run-to-run") {
    def run() = Multimodal.extractFeatures(spark, assets)
      .select("asset_id", "feature_norm").as[(Long, Double)].collect().toMap
    val r1 = run(); val r2 = run()
    assert(r1 == r2 && r1.size == 50)
  }

  test("features have the declared shape: dim-16 array, norm consistent") {
    val rows = Multimodal.extractFeatures(spark, assets).collect()
    assert(rows.forall(_.features.length == Multimodal.FakeCodec.FeatureDim))
    rows.foreach { r =>
      val n = math.sqrt(r.features.map(x => x.toDouble * x).sum)
      assert(math.abs(n - r.feature_norm) < 1e-9)
    }
  }

  test("resize: output is exactly dstW*dstH bytes, deterministic") {
    val r1 = Multimodal.resizeImages(spark, assets, 32, 24)
      .collect().map(r => r.asset_id -> r.content.toSeq).toMap
    assert(r1.nonEmpty)
    assert(r1.values.forall(_.length == 32 * 24))
    val r2 = Multimodal.resizeImages(spark, assets, 32, 24)
      .collect().map(r => r.asset_id -> r.content.toSeq).toMap
    assert(r1 == r2)
  }

  test("quantile sketch variant tracks the exact percentiles") {
    val dir = TestSpark.Sf0001
    val exact = graft.queries.ReferenceQueries.q2(spark, dir).head
    val approx = graft.queries.ReferenceQueries.q2approx(spark, dir).head
    // GK sketch with accuracy 10000 on ~1000 rows: p95/p99 within 2%
    Seq(1, 2).foreach { i =>
      val e = exact.getDouble(i); val a = approx.getAs[Number](i).doubleValue()
      assert(math.abs(a - e) <= math.max(0.02 * e, 1.0), s"col $i: approx $a vs exact $e")
    }
  }

  test("frame sampling: one row per everyMs tick of a video's duration") {
    val frames = Multimodal.sampleFrames(spark, assets, everyMs = 1000L)
    val byAsset = frames.groupBy("asset_id").agg(count("*").as("n"))
      .as[(Long, Long)].collect().toMap
    val durations = assets.filter(col("modality") === "video")
      .select(col("asset_id"), col("meta.durationMs")).as[(Long, Long)].collect().toMap
    assert(byAsset.keySet == durations.keySet.filter(durations(_) > 0))
    byAsset.foreach { case (id, n) =>
      assert(n == (durations(id) + 999) / 1000) // ceil(duration/everyMs)
    }
  }
}
