package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The distributed prefix-sum contract (s28's engine): exact equality
  * with the one-window formulation at every bucket width, and the plan
  * must window BY BUCKET (parallel) rather than over one global
  * partition. */
class PrefixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = {
    val rnd = new scala.util.Random(11)
    // sparse, gappy keys on purpose: bucket occupancy varies 0..width
    (0 until 2000).map(i => (i * 3 + rnd.nextInt(2), rnd.nextInt(50).toLong))
      .distinctBy(_._1)
  }

  test("equals the single-window formulation at every bucket width") {
    val df = rows.toDF("k", "v").repartition(16)
    val expect = rows.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, acc), (k, v)) => (k.toLong, acc + v) }
      .drop(1).toMap
    for (width <- Seq(1L, 7L, 100L, 10000L)) {
      val got = Prefix.runningSum(df, col("k"), col("v"), width)
        .select(col("k").cast("long"), col("running"))
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"bucket width $width diverged")
    }
  }

  test("the data-grain window is partitioned by bucket, not global") {
    val df = rows.toDF("k", "v").repartition(16)
    val p = Prefix.runningSum(df, col("k"), col("v"), 100L)
      .queryExecution.executedPlan.toString
    // the big window must shuffle on the bucket key — evidence it runs
    // parallel across buckets; only the bucket-TOTALS window (thousands
    // of rows max) is allowed a global order
    assert(p.contains("hashpartitioning(__bkt"),
      "in-bucket window lost its bucket partitioning:\n" + p)
  }
}
