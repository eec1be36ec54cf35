package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** x39: the mergeable-sketch rollup is approximate by design (rows-only
  * at the driver), so its accuracy contract lives here: the union of the
  * per-day sketches must estimate each page's TRUE distinct-user count
  * within HLL's error envelope (lgK=12 ⇒ σ ≈ 1.6%, asserted at 5%). */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("x39 hll rollup: day-sketch union estimates exact uniques within 5%") {
    val est = InfraQueries.hllRollup(spark, TestSpark.Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.clicks(spark, TestSpark.Sf0001)
      .groupBy(col("page"))
      .agg(count_distinct(col("user_id")).as("u"),
           count_distinct(date_trunc("day", col("ts"))).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(1))).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (page, (days, estU)) =>
      val (exDays, exU) = exact(page)
      assert(days == exDays, s"$page: day count $days != $exDays")
      val err = math.abs(estU - exU).toDouble / exU
      assert(err <= 0.05, s"$page: estimate $estU vs exact $exU (err $err)")
    }
  }
}
