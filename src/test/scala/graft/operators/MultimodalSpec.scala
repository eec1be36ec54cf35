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
