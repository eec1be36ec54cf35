package graft.gen

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GeneratorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = EventGenerator.events(spark, 50000).cache()

  test("page/country/device empirical frequencies track the declared weights") {
    def freqs(colName: String): Map[String, Double] = {
      val m = events.groupBy(col(colName)).count().as[(String, Long)].collect().toMap
      val total = m.values.sum.toDouble
      m.map { case (k, v) => k -> v / total }
    }
    // The first-view rule ("/" with p=0.4 on each session's first event,
    // produce.py:114-116) inflates "/" — ~30% of events open a session —
    // but replaces page_raw uniformly, so RELATIVE proportions among
    // non-"/" pages are untouched: test those conditionally.
    val pf = freqs("page")
    val slash = pf.getOrElse("/", 0.0)
    assert(slash > 0.25 && slash < 0.45, s"'/' frequency $slash")
    val restMass = 1.0 - slash
    val restWeight = 1.0 - EventGenerator.Pages.head._2
    EventGenerator.Pages.tail.foreach { case (p, w) =>
      val expected = w / restWeight * restMass
      assert(math.abs(pf.getOrElse(p, 0.0) - expected) < 0.02,
        s"page $p: ${pf.get(p)} vs conditional $expected")
    }
    val cf = freqs("country")
    EventGenerator.Countries.foreach { case (c, w) =>
      assert(math.abs(cf.getOrElse(c, 0.0) - w) < 0.02, s"country $c: ${cf.get(c)} vs $w")
    }
    val df = freqs("device")
    EventGenerator.Devices.foreach { case (d, w) =>
      assert(math.abs(df.getOrElse(d, 0.0) - w) < 0.02, s"device $d: ${df.get(d)} vs $w")
    }
  }

  test("referrer is the user's previous page (initial '/')") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val bad = events
      .withColumn("expected_ref", coalesce(lag(col("page"), 1).over(w), lit("/")))
      .filter(col("referrer") =!= col("expected_ref"))
      .count()
    assert(bad == 0)
  }

  test("session pool: ~70% of events reuse a bounded active-user pool") {
    val poolUsers = events.filter(col("user_id") <= f"u${EventGenerator.ActivePoolSize}%06d")
    val reuse = poolUsers.count().toDouble / events.count()
    // 70% draw from the pool, plus ~0.15% of fresh draws landing below 5000
    assert(math.abs(reuse - EventGenerator.ReuseProbability) < 0.02, s"pool share $reuse")
    val distinctUsers = events.select(count_distinct(col("user_id"))).head.getLong(0)
    // pool (≤5000) + 30%·50000 fresh uniform draws from 1e6 (few collide)
    assert(distinctUsers > 15000 && distinctUsers < 22000, s"$distinctUsers users")
  }

  test("generation is deterministic and ids unique") {
    val again = EventGenerator.events(spark, 1000)
    val first = EventGenerator.events(spark, 1000)
    assert(first.exceptAll(again).count() == 0)
    assert(first.select(count_distinct(col("event_id"))).head.getLong(0) == 1000)
  }

  test("generated wire rows parse through the streaming pipeline") {
    val parsed = graft.streaming.ClickPipeline.parse(
      EventGenerator.events(spark, 500).toJSON.toDF("value"))
    assert(parsed.count() == 500)
    assert(parsed.schema("ts").dataType.typeName == "timestamp")
  }

  test("Kafka producer contract: key = user_id, value round-trips losslessly") {
    val ev = EventGenerator.events(spark, 2000)
    val records = EventGenerator.kafkaRecords(ev)

    // the partitioning contract the referrer chain depends on
    // (produce.py:166): every record is keyed by its own user_id
    val keyed = records
      .withColumn("uid", get_json_object(col("value"), "$.user_id"))
    assert(keyed.filter(col("key") =!= col("uid")).count() == 0)

    // the value survives the consumer's parse with zero loss: parse(value)
    // must reproduce the original relation field-for-field
    val parsed = graft.streaming.ClickPipeline.parse(records.select("value"))
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts"),
              col("page"), col("referrer"), col("country"), col("device"))
    assert(parsed.count() == 2000)
    assert(parsed.exceptAll(ev).count() == 0)
    assert(ev.exceptAll(parsed).count() == 0)
  }
}
