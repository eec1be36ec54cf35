package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("hand-checkable matches: latest-at-or-before, inclusive ties, no-match nulls") {
    val left = Seq(
      ("k1", ts(50)),   // before any right row -> null
      ("k1", ts(100)),  // ties with right@100 -> inclusive match 10
      ("k1", ts(250)),  // latest right <= 250 is right@200 -> 20
      ("k2", ts(500))   // key with no right rows at all -> null
    ).toDF("k", "ts")
    val right = Seq(
      ("k1", ts(100), 10L),
      ("k1", ts(200), 20L),
      ("k1", ts(300), 30L)
    ).toDF("k", "ts", "v")

    val out = AsOfJoin.asOf(left, right, keys = Seq("k"), payload = Seq("v"))
      .select(col("k"), unix_millis(col("ts")).as("t"), col("r_v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(out == Set(
      ("k1", 50L, None),
      ("k1", 100L, Some(10L)),
      ("k1", 250L, Some(20L)),
      ("k2", 500L, None)))
  }

  test("property: equals a naive latest-row-per-left computation on random data") {
    val rnd = new scala.util.Random(11)
    val keys = Seq("a", "b", "c")
    val leftRows = Seq.fill(300)((keys(rnd.nextInt(3)), rnd.nextInt(1000).toLong))
    // unique (key, ts) on the right: as-of is well-defined
    val rightRows = rnd.shuffle(
      (for (k <- keys; t <- 0 until 1000 by 7) yield (k, t.toLong)).toList)
      .take(200).map { case (k, t) => (k, t, rnd.nextInt(100).toLong) }

    val left = leftRows.map { case (k, t) => (k, ts(t)) }.toDF("k", "ts")
    val right = rightRows.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "ts", "v")

    val got = AsOfJoin.asOf(left, right, keys = Seq("k"), payload = Seq("v"))
      .select(col("k"), unix_millis(col("ts")), col("r_v"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues(_.map(r => if (r.isNullAt(2)) None else Some(r.getLong(2))).toSeq.sorted)
      .toMap

    val naive = leftRows.groupBy(identity).map { case ((k, t), dups) =>
      val best = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      (k, t) -> Seq.fill(dups.size)(best).sorted
    }
    assert(got == naive)
  }

  test("plan has no join node at all (the whole point)") {
    val left = Seq(("k", ts(1))).toDF("k", "ts")
    val right = Seq(("k", ts(1), 1L)).toDF("k", "ts", "v")
    val plan = AsOfJoin.asOf(left, right, keys = Seq("k"), payload = Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in plan:\n$plan")
    assert(plan.contains("Window"), s"expected a window pass:\n$plan")
  }

  test("left payload columns ride through unchanged") {
    val left = Seq(("k", ts(100), "keepme")).toDF("k", "ts", "note")
    val right = Seq(("k", ts(50), 7L)).toDF("k", "ts", "v")
    val row = AsOfJoin.asOf(left, right, keys = Seq("k"), payload = Seq("v")).head()
    assert(row.getAs[String]("note") == "keepme")
    assert(row.getAs[Long]("r_v") == 7L)
    assert(row.getAs[Timestamp]("r_ts") == ts(50))
  }
}
