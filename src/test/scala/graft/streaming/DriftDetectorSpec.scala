package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.DriftDetector.{CusumState, ZRow}

/** The streamed CUSUM contract (s29): the keyed fold must be exactly
  * the textbook recursion, and state must carry it across micro-batch
  * boundaries — a restart mid-series cannot reset the accumulator. */
class DriftDetectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val zs = Seq(1.2, -0.3, 0.9, 2.0, -4.0, 1.5, 1.5, 1.5)

  private def reference(zs: Seq[Double]): Seq[Double] =
    zs.scanLeft(0.0)((s, z) => math.max(0.0, s + z - DriftDetector.K)).drop(1)

  test("step is the textbook recursion, clamped at zero") {
    var st = CusumState(0.0)
    val out = zs.zipWithIndex.map { case (z, i) =>
      val (s2, row) = DriftDetector.step(st, ZRow(i.toLong, "p", z))
      st = s2
      row.s_plus
    }
    assert(out == reference(zs))
    assert(out.forall(_ >= 0.0))
  }

  test("state carries across micro-batches: split feed equals one pass") {
    val expect = reference(zs)
    for (cut <- Seq(1, 4, 7)) {
      val mem = MemoryStream[ZRow](spark)
      val q = DriftDetector.detect(mem.toDS())
        .writeStream.format("memory").queryName(s"drift_$cut")
        .outputMode("append").start()
      val rows = zs.zipWithIndex.map { case (z, i) => ZRow(i.toLong, "p", z) }
      mem.addData(rows.take(cut): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(cut): _*)
      q.processAllAvailable()
      val got = spark.table(s"drift_$cut")
        .orderBy("minute_ms").select("s_plus").as[Double].collect().toSeq
      q.stop()
      assert(got == expect, s"batch split at $cut diverged from single pass")
    }
  }

  test("independent keys fold independently") {
    val mem = MemoryStream[ZRow](spark)
    val q = DriftDetector.detect(mem.toDS())
      .writeStream.format("memory").queryName("drift_keys")
      .outputMode("append").start()
    mem.addData(ZRow(0, "a", 3.0), ZRow(0, "b", 1.0), ZRow(1, "a", 3.0), ZRow(1, "b", 1.0))
    q.processAllAvailable()
    val byKey = spark.table("drift_keys").orderBy("page", "minute_ms")
      .select("page", "s_plus").as[(String, Double)].collect().toSeq
    q.stop()
    assert(byKey == Seq(("a", 2.5), ("a", 5.0), ("b", 0.5), ("b", 1.0)))
  }
}
