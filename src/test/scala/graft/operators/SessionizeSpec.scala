package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Min = 60000L
  private def ts(ms: Long) = new Timestamp(ms)

  test("gap boundary: exactly-the-gap merges, one ms past the gap splits") {
    // u1: 0 and 10min merge (diff < gap); 40min is EXACTLY 30min after
    // 10min and still merges (adjacent windows coalesce); 70min+1ms is
    // one ms past the gap from 40min => new session
    val events = Seq(
      ("u1", ts(0)), ("u1", ts(10 * Min)), ("u1", ts(40 * Min)),
      ("u1", ts(70 * Min + 1)),
      ("u2", ts(5 * Min))
    ).toDF("user_id", "ts")
    val out = Sessionize.sessions(events)
      .select(col("user_id"), unix_millis(col("session_start")).as("st"),
              col("n_events"), col("duration_ms"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      ("u1", 0L, 3L, 40 * Min),        // [0, 10min, 40min]: one session
      ("u1", 70 * Min + 1, 1L, 0L),    // split: strictly past the gap
      ("u2", 5 * Min, 1L, 0L)))
  }

  test("sessions never merge across users; histogram adds up") {
    val events = Seq(
      ("a", ts(0)), ("b", ts(1000)), ("a", ts(2000)), ("b", ts(3000))
    ).toDF("user_id", "ts")
    val sess = Sessionize.sessions(events)
    assert(sess.count() == 2) // one 2-event session per user
    val hist = Sessionize.sessionHistogram(sess)
      .as[(Long, Long, Long)].collect().toSet
    assert(hist == Set((2L, 2L, 2000L + 2000L)))
  }

  test("session_window end = last event + gap (duration subtracts it back)") {
    val events = Seq(("u", ts(1000))).toDF("user_id", "ts")
    val row = Sessionize.sessions(events).head()
    assert(row.getAs[Timestamp]("session_end").getTime == 1000 + 30 * Min)
    assert(row.getAs[Long]("duration_ms") == 0L)
  }
}
