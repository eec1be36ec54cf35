package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariants for the time-series entries the hash oracle can't state.
  * x72's EMA is a weighted AVERAGE with truncated time-decayed support:
  * it must stay inside the envelope of the values it averages and
  * degenerate to the raw value when the support is a single point. */
class SeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("x72 ema: one row per observed minute, ema inside the per-type envelope") {
    val out = ExtendedQueries.emaSeries(spark, TestSpark.Sf0001).cache()
    val n = out.count()
    assert(n > 0)
    assert(out.select("event_type", "minute_ms").distinct().count() == n,
      "duplicate (type, minute) rows")
    // a weighted average of per-minute counts can never leave the
    // [min, max] envelope of that type's counts
    val env = out.groupBy("event_type")
      .agg(min(col("n")).as("lo"), max(col("n")).as("hi"))
    val escaped = out.join(env, "event_type")
      .filter(col("ema") < col("lo") - 1e-6 || col("ema") > col("hi") + 1e-6)
    assert(escaped.count() == 0, "ema escaped the value envelope")
    out.unpersist()
  }

  test("x72 ema: a minute with no in-support predecessor equals its raw count") {
    val out = ExtendedQueries.emaSeries(spark, TestSpark.Sf0001)
    val first = out.withColumn("prev",
        lag(col("minute_ms"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("event_type").orderBy("minute_ms")))
      .filter(col("prev").isNull ||
        col("minute_ms") - col("prev") >= 64L * 60000L)
    val firstRows = first.collect()
    assert(firstRows.nonEmpty)
    firstRows.foreach { r =>
      val (cnt, ema) = (r.getAs[Long]("n"), r.getAs[Double]("ema"))
      assert(math.abs(ema - cnt) < 1e-6,
        s"single-support minute must equal its count: n=$cnt ema=$ema")
    }
  }
}
