package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SURVEY.md §5.2 property checks: counts roll up across window grains,
  * distinct counts do NOT sum (the reference's SummingMergeTree
  * double-count quirk our single-agg-path design fixes). */
class RollupInvariantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = TestSpark.Sf0001

  test("1-min cnt sums to the 5-min grain; unique_users is NOT summable") {
    val minute = ReferenceQueries.minuteAgg(spark, dir)
    val rolled = minute
      .withColumn("w5", (floor(unix_millis(col("window_start")) / 300000L) * 300000L))
      .groupBy(col("w5"), col("page"))
      .agg(sum(col("cnt")).as("cnt5"), sum(col("unique_users")).as("summed_uu"))
    val q15 = ReferenceQueries.q15(spark, dir)
      .select(col("window_start_ms").as("w5"), col("page"),
              col("cnt").as("cnt_direct"), col("unique_users").as("uu_direct"))
    val joined = rolled.join(q15, Seq("w5", "page")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("cnt5") == r.getAs[Long]("cnt_direct"))
      // summing per-minute distincts over-counts (or equals when disjoint)
      assert(r.getAs[Long]("summed_uu") >= r.getAs[Long]("uu_direct"))
    }
  }

  test("unique_users <= cnt in every window") {
    val bad = ReferenceQueries.minuteAgg(spark, dir)
      .filter(col("unique_users") > col("cnt")).count()
    assert(bad == 0)
  }
}
