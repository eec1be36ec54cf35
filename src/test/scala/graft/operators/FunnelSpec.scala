package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Invariants for the event-sequence operators (x49 funnel, x50
  * retention, x51 domain cap). x49/x50/x51 are also hash-checked against
  * DuckDB; these specs pin the semantics the hash can't state — the DP's
  * equivalence to an explicit chain search, window-boundary behavior,
  * and cap determinism. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val events = Tables.events(spark, TestSpark.Sf0001)
  private lazy val docs = Tables.documents(spark, TestSpark.Sf0001)

  private val W = 3600L * 1000000L // 1 hour in µs
  private val steps = Seq("view", "click", "purchase")

  /** Hand-built fixture: (user, ts-seconds, event_id, type). */
  private def fixture(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toSeq
      .map { case (u, sec, id, t) => (u, new Timestamp(sec * 1000L), id, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
  }

  private def levels(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    Funnel.windowFunnel(df, steps, W).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("x49 funnel: chain inside the window completes; outside does not") {
    val lv = levels(fixture(
      // u1: view → click(+10 min) → purchase(+50 min) — all within 1 h of the view
      (1L, 1000L, 1L, "view"), (1L, 1600L, 2L, "click"), (1L, 4000L, 3L, "purchase"),
      // u2: purchase lands 61 min after the anchoring view → level 2
      (2L, 1000L, 4L, "view"), (2L, 1600L, 5L, "click"), (2L, 1000L + 3660L, 6L, "purchase"),
      // u3: steps out of order (purchase first) → level 2 only
      (3L, 500L, 7L, "purchase"), (3L, 1000L, 8L, "view"), (3L, 1600L, 9L, "click"),
      // u4: no view at all → level 0 even with click+purchase
      (4L, 1000L, 10L, "click"), (4L, 1600L, 11L, "purchase")))
    assert(lv == Map(1L -> 3, 2L -> 2, 3L -> 2, 4L -> 0))
  }

  test("x49 funnel: re-anchoring — a later view rescues an expired chain") {
    // First view expires (click is 2 h later), but a second view 1 min
    // before the click re-anchors; purchase follows within ITS window.
    val lv = levels(fixture(
      (1L, 0L, 1L, "view"), (1L, 7200L, 2L, "view"),
      (1L, 7260L, 3L, "click"), (1L, 9000L, 4L, "purchase")))
    assert(lv == Map(1L -> 3))
    // Control: without the second view the same tail stays level 1.
    val lv2 = levels(fixture(
      (1L, 0L, 1L, "view"), (1L, 7260L, 3L, "click"), (1L, 9000L, 4L, "purchase")))
    assert(lv2 == Map(1L -> 1))
  }

  test("x49 funnel: window boundary is inclusive; tuple order breaks ts ties") {
    // click at exactly anchor + 1 h → still in window (<=)
    assert(levels(fixture(
      (1L, 0L, 1L, "view"), (1L, 3600L, 2L, "click"))) == Map(1L -> 2))
    // same ts: chain order falls back to event_id — view(id 1) < click(id 2)
    assert(levels(fixture(
      (2L, 100L, 1L, "view"), (2L, 100L, 2L, "click"))) == Map(2L -> 2))
    // reversed ids at the same ts: click is NOT after the view
    assert(levels(fixture(
      (3L, 100L, 2L, "view"), (3L, 100L, 1L, "click"))) == Map(3L -> 1))
  }

  test("x49 funnel: DP matches explicit chain search on real data") {
    // Independent oracle: brute-force over each user's event list.
    val got = levels(events)
    val byUser = events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
              col("event_id").cast("long"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val want = byUser.map { case (u, rows) =>
      val evs = rows.map { case (_, ts, id, t) => (ts, id, t) }.sortBy(r => (r._1, r._2))
      def chains(level: Int): Boolean = {
        val idx = evs.indices
        level match {
          case 1 => evs.exists(_._3 == "view")
          case 2 => idx.exists(i => evs(i)._3 == "view" && idx.exists(j =>
            evs(j)._3 == "click" && j > i && evs(j)._1 - evs(i)._1 <= W))
          case 3 => idx.exists(i => evs(i)._3 == "view" && idx.exists(j =>
            evs(j)._3 == "click" && j > i && evs(j)._1 - evs(i)._1 <= W && idx.exists(k =>
              evs(k)._3 == "purchase" && k > j && evs(k)._1 - evs(i)._1 <= W)))
        }
      }
      u -> (if (chains(3)) 3 else if (chains(2)) 2 else if (chains(1)) 1 else 0)
    }
    assert(got == want)
  }

  test("x50 retention: offset-0 diagonal equals cohort sizes; offsets non-negative") {
    val m = Funnel.retentionMatrix(events).cache()
    assert(m.filter(col("day_offset") < 0).count() == 0)
    // every user is active on their cohort day by construction, so the
    // offset-0 cell is exactly the cohort's size and every other cell
    // is bounded by it
    val day0 = m.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    val over = m.join(day0, "cohort_day")
      .filter(col("n_users") > col("cohort_size"))
    assert(over.count() == 0)
    val cohortTotal = day0.agg(sum("cohort_size")).first().getLong(0)
    val users = events.select("user_id").distinct().count()
    assert(cohortTotal == users, "cohorts must partition the user set")
    m.unpersist()
  }

  test("x51 domain cap: bounds respected, deterministic, content-stable keep set") {
    val capped = Curation.domainCap(docs, cap = 7).cache()
    val perDomain = capped.groupBy("source").count().collect()
    assert(perDomain.forall(_.getLong(1) <= 7))
    // deterministic across runs
    val again = Curation.domainCap(docs, cap = 7)
    assert(capped.except(again).isEmpty && again.except(capped).isEmpty)
    // growing the cap never evicts a previously kept doc (prefix property)
    val bigger = Curation.domainCap(docs, cap = 9)
    assert(capped.select("source", "doc_id")
      .except(bigger.select("source", "doc_id")).isEmpty)
    capped.unpersist()
  }
}
