package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SCD2 contract (s27): interval semantics on a hand-checkable
  * history, and the merge-equivalence property — incremental application
  * at ANY cutoff must equal the from-scratch build. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(d: String) = Timestamp.valueOf(s"$d 00:00:00")

  private val history = Seq(
    // key 1: A,A,B,A -> three versions (the repeat must NOT split a run,
    // the return to A must open a NEW version, not extend the old one)
    (1L, ts("2024-01-01"), "A"), (1L, ts("2024-01-05"), "A"),
    (1L, ts("2024-02-01"), "B"), (1L, ts("2024-03-01"), "A"),
    // key 2: single observation -> one open version
    (2L, ts("2024-01-10"), "X"))

  test("fromObservations: runs collapse, intervals chain, last is open") {
    val out = Scd2.fromObservations(history.toDF("key", "ts", "attr"))
      .orderBy("key", "valid_from").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("A", "B", "A"))
    assert(k1.map(r => Option(r.getTimestamp(3))).toSeq ==
      Seq(Some(ts("2024-02-01")), Some(ts("2024-03-01")), None),
      "valid_to must chain to the next version's valid_from")
    assert(k1.map(_.getTimestamp(2)).toSeq ==
      Seq(ts("2024-01-01"), ts("2024-02-01"), ts("2024-03-01")))
    assert(k1.map(_.getBoolean(4)).toSeq == Seq(false, false, true))
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2.head.getBoolean(4))
  }

  test("merge at every cutoff equals the from-scratch build") {
    val extra = Seq(
      (1L, ts("2024-04-01"), "A"),  // unchanged attr: must EXTEND, not version
      (1L, ts("2024-05-01"), "C"),
      (2L, ts("2024-06-01"), "Y"),
      (3L, ts("2024-04-15"), "N"))  // brand-new key arrives in the batch
    val all = history ++ extra
    val expect = Scd2.fromObservations(all.toDF("key", "ts", "attr"))
      .orderBy("key", "valid_from").collect().toSeq
    for (cutIdx <- Seq(2, 4, 5)) {
      val sorted = all.sortBy(_._2.getTime)
      val (first, second) = sorted.splitAt(cutIdx)
      val merged = Scd2.merge(
        Scd2.fromObservations(first.toDF("key", "ts", "attr")),
        second.toDF("key", "ts", "attr"))
        .orderBy("key", "valid_from").collect().toSeq
      assert(merged == expect, s"cutoff at $cutIdx diverged from rebuild")
    }
  }

  test("unchanged attribute in the batch preserves the original valid_from") {
    val dim = Scd2.fromObservations(
      Seq((7L, ts("2024-01-01"), "A")).toDF("key", "ts", "attr"))
    val out = Scd2.merge(dim,
      Seq((7L, ts("2024-02-01"), "A")).toDF("key", "ts", "attr")).collect()
    assert(out.length == 1, "same attr must extend the open version")
    assert(out.head.getTimestamp(2) == ts("2024-01-01"))
    assert(out.head.getBoolean(4))
  }

  test("untouched keys bypass the rebuild (closed history never reshuffled)") {
    val dim = Scd2.fromObservations(Seq(
      (1L, ts("2024-01-01"), "A"), (1L, ts("2024-02-01"), "B"),
      (2L, ts("2024-01-01"), "X")).toDF("key", "ts", "attr"))
    val merged = Scd2.merge(dim, Seq((2L, ts("2024-03-01"), "Z")).toDF("key", "ts", "attr"))
    // key 1 (untouched) survives byte-identically, key 2 gains a version
    val k1 = merged.filter(col("key") === 1L).orderBy("valid_from").collect()
    assert(k1.map(_.getString(1)).toSeq == Seq("A", "B"))
    assert(merged.filter(col("key") === 2L).count() == 2)
    // and the plan: the batch key set reaches the dim side as a
    // broadcast semi/anti join, not a shuffled one
    val p = merged.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "touched-key filtering must broadcast the batch key set")
  }
}
