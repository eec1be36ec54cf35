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
  * Usage: `sbt "runMain graft.Main [nEvents] [workDir] [--continuous]"`.
  * Defaults: 100k events, a temp directory. Everything is deterministic
  * except the ingest-time `created_at` stamps.
  *
  * `--continuous` runs the stream with `Trigger.ProcessingTime` (the
  * reference's always-on posture) instead of a bounded AvailableNow
  * replay: the producer drops a second wave of events while the query is
  * live, and the run ends through the clean-stop hook
  * ([[graft.streaming.ClickPipeline.stopWhenIdle]]).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val continuous = args.contains("--continuous")
    val positional = args.filterNot(_.startsWith("--"))
    val n = positional.headOption.map(_.toLong).getOrElse(100000L)
    val work = positional.lift(1).getOrElse(
      Files.createTempDirectory("graft_demo_").toFile.getAbsolutePath)
    val spark = GraftSession.local()
    import spark.implicits._

    println(s"== graft demo: $n events → $work")

    // 1. produce (produce.py parity, distributed + deterministic)
    val events = EventGenerator.events(spark, n)
    val maxTs = events.agg(max(col("ts"))).head.getLong(0)
    events.toJSON.write.text(s"$work/wire")
    // flush sentinel so the replay emits every window (see
    // StreamingQueries for the watermark mechanics); written AFTER the
    // last wave of real events, or its watermark would late-drop them
    def writeSentinel(sentinelTs: Long): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$work/wire/zz_flush.json"),
        s"""{"event_id":"flush","user_id":"u0","ts":$sentinelTs,"page":"__flush__","referrer":"/","country":"XX","device":"mobile"}\n""")

    // 2. stream: source → parse → watermark → 1-min window agg → sink
    def windowed = ClickPipeline.minuteUserGrain(
      ClickPipeline.withEventTime(
        ClickPipeline.fromJsonDir(spark, s"$work/wire")))
    if (continuous) {
      // always-on flavor: the query polls every interval; a second wave
      // of events arrives mid-run; end via the clean-stop hook
      val q = ClickPipeline.startContinuous(
        windowed, s"$work/agg_user_grain", s"$work/ck_agg", "2 seconds")
      val wave2 = EventGenerator.events(spark, n / 10, seed = 43L,
        startMs = maxTs + 1000L)
      Thread.sleep(3000)
      wave2.toJSON.write.mode("append").text(s"$work/wire")
      Thread.sleep(3000)
      writeSentinel(maxTs + 7200000L)
      Thread.sleep(3000)
      ClickPipeline.stopWhenIdle(q)
      println(s"== continuous run stopped cleanly after ${q.lastProgress.batchId + 1} micro-batches")
    } else {
      writeSentinel(maxTs + 7200000L)
      ClickPipeline.runAppendParquet(
        windowed, s"$work/agg_user_grain", s"$work/ck_agg")
    }

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
