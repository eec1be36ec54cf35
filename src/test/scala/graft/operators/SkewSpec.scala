package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val clicks = Tables.clicks(spark, TestSpark.Sf0001)

  test("salted join is row-identical to the plain join") {
    val dim = clicks.groupBy(col("page"))
      .agg(count(lit(1)).as("page_total"))
    val plain = clicks.join(dim, "page")
      .select("event_id", "page", "page_total")
    val salted = Skew.saltedJoin(clicks, dim, "page", col("event_id"), k = 8)
      .select("event_id", "page", "page_total")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0 && plain.except(salted).count() == 0)
  }

  test("the join key is widened by the salt and spreads the hot key") {
    val dim = clicks.select(col("page")).distinct()
    val joined = Skew.saltedJoin(clicks, dim, "page", col("event_id"), k = 8)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), "salt absent from the physical join: " + p)
    // deterministic salt: the same rows get the same salt on recompute
    val a = Skew.saltedJoin(clicks, dim, "page", col("event_id"), k = 8).count()
    val b = Skew.saltedJoin(clicks, dim, "page", col("event_id"), k = 8).count()
    assert(a == b && a == clicks.count())
  }
}
