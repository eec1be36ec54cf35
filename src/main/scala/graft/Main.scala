package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.gen.EventGenerator
import graft.store.EventStore
import graft.streaming.{AnomalyDetector, ClickPipeline}

/** End-to-end demo wiring — the reference's whole stack
  * (producer → Kafka → Flink job → ClickHouse → dashboards) as one
  * self-contained run of this library:
  *
  *   generate click events → stream them through parse/watermark/1-min
  *   window aggregation with checkpointed sinks → detect anomalies in
  *   keyed Welford state → land raw events in the partitioned warehouse
  *   → answer the reference's analytic queries over the results.
  *
  * Usage: `sbt "runMain graft.Main [nEvents] [workDir]"`. Defaults:
  * 100k events, a temp directory. Everything is deterministic except
  * the ingest-time `created_at` stamps.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val work = args.lift(1).getOrElse(
      Files.createTempDirectory("graft_demo_").toFile.getAbsolutePath)
    val spark = GraftSession.local()
    import spark.implicits._

    println(s"== graft demo: $n events → $work")

    // 1. produce (produce.py parity, distributed + deterministic)
    val events = EventGenerator.events(spark, n)
    val maxTs = events.agg(max(col("ts"))).head.getLong(0)
    events.toJSON.write.text(s"$work/wire")
    // flush sentinel so the bounded replay emits every window (see
    // StreamingQueries for the watermark mechanics)
    Files.writeString(java.nio.file.Paths.get(s"$work/wire/zz_flush.json"),
      s"""{"event_id":"flush","user_id":"u0","ts":${maxTs + 7200000L},"page":"__flush__","referrer":"/","country":"XX","device":"mobile"}\n""")

    // 2. stream: source → parse → watermark → 1-min window agg → sink
    val parsed = ClickPipeline.withEventTime(
      ClickPipeline.fromJsonDir(spark, s"$work/wire"))
    ClickPipeline.runAppendParquet(
      ClickPipeline.minuteUserGrain(parsed), s"$work/agg_user_grain", s"$work/ck_agg")

    // 3. raw events → partitioned warehouse (sorted, bloom-indexed)
    val raw = ClickPipeline.parse(
        spark.read.text(s"$work/wire").select(col("value")))
      .filter(col("page") =!= "__flush__")
    EventStore.write(raw, s"$work/warehouse", grain = EventStore.DayGrain)

    // 4. finalize the agg table + run anomaly detection on it
    val minuteAgg = ClickPipeline.minuteAggFromUserGrain(
      spark.read.parquet(s"$work/agg_user_grain").filter(col("page") =!= "__flush__"))
    minuteAgg.write.mode("overwrite").parquet(s"$work/page_minute_agg")

    val aggRows = spark.read.parquet(s"$work/page_minute_agg")
      .select(unix_millis(col("window_start")).as("window_start_ms"),
              col("page"), col("country"), col("cnt"))
      .as[AnomalyDetector.AggRow]
    val anomalies = AnomalyDetector.detect(aggRows).filter(_.is_anomaly)

    // 5. the reference's dashboard queries over the landed tables
    val wh = EventStore.read(spark, s"$work/warehouse")
    println("-- top pages (Q7 shape) --")
    wh.groupBy("page").agg(count("*").as("events"),
        count_distinct(col("user_id")).as("unique_users"))
      .orderBy(desc("events")).show(5, truncate = false)
    println("-- per-minute agg sample (Q14 shape) --")
    spark.read.parquet(s"$work/page_minute_agg")
      .orderBy(desc("cnt")).show(5, truncate = false)
    println(s"-- anomalies: ${anomalies.count()} flagged windows --")
    AnomalyDetector.anomalies(anomalies).show(5, truncate = false)

    println(s"== done: warehouse=${wh.count()} rows, agg=${minuteAgg.count()} windows")
    spark.stop()
  }
}
