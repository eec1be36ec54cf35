package graft.streaming

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import graft.Tables

/** The engine's self-metrics surface — the analogue of the reference's
  * published operational numbers (README.md:208: end-to-end latency
  * avg 4.7 s / P95 9 s, methodology sql/metrics_queries.sql:16-19) and
  * its Prometheus/Grafana dashboards (MONITORING_SETUP.md:1-50,
  * docker/prometheus/prometheus.yml):
  *
  *  - [[MetricsListener]]: a `StreamingQueryListener` recording one row
  *    per micro-batch — input rows, rates, trigger duration, event-time
  *    watermark, state-store rows — the per-component throughput/health
  *    series the reference scrapes into Prometheus. The buffer is
  *    driver-side and O(#batches), the same cardinality Prometheus
  *    itself would hold; at 100 TB the data plane is untouched (the
  *    listener only reads `StreamingQueryProgress`, which Spark already
  *    computes per batch).
  *  - [[latencyStats]]: the end-to-end latency (created_at − ts)
  *    percentile computation over any sunk relation — the EXACT
  *    methodology of metrics_queries.sql:16-19, shared with the q02
  *    driver entry so the self-measured numbers and the dashboard query
  *    are one code path by construction.
  *  - [[selfMetrics]]: driver entry (m01) — runs the real watermarked
  *    stream → checkpointed parquet sink over the fixture with the
  *    listener attached, then returns a tall (metric, value) table:
  *    per-run throughput/batch/watermark gauges + the latency
  *    percentiles of what actually landed. Values are wall-clock by
  *    nature → rows-only driver check; invariants are spec-asserted.
  */
object PipelineMetrics {

  private def tempDir(prefix: String): String = graft.WorkDirs.tempDir(prefix)

  /** One micro-batch's progress snapshot (StreamingQueryProgress
    * projection). `watermark_ms` is None until the first batch that
    * carries event-time columns; rates are NaN on zero-duration batches
    * exactly as Spark reports them. `commit_ms` is the checkpoint
    * commit cost (offset WAL write + commit log write — Spark's
    * `walCommit` + `commitOffsets` phases); `state_commit_ms` sums the
    * state-store commit time across stateful operators — together the
    * per-batch analogue of Flink's checkpoint-duration dashboard
    * gauges. Older persisted m03 tables (written before these two
    * columns existed) stay readable because `runSummary` reads untyped
    * columns and never selects them — Spark encoders do NOT fill Scala
    * default parameter values when decoding, so a typed read of an old
    * table would need an explicit schema supplying the missing
    * columns. */
  case class BatchMetric(query_id: String, batch_id: Long,
                         input_rows: Long, batch_duration_ms: Long,
                         input_rows_per_sec: Double,
                         processed_rows_per_sec: Double,
                         watermark_ms: Option[Long], state_rows: Long,
                         wall_time_ms: Long,
                         commit_ms: Long = 0L, state_commit_ms: Long = 0L)

  /** Per-batch metrics recorder. Register with
    * `spark.streams.addListener`; progress events arrive asynchronously
    * on the listener bus, so read [[batches]] only after
    * [[awaitTerminated]] (the terminated event is queued AFTER every
    * progress event of its query, so its delivery proves the buffer is
    * complete). */
  class MetricsListener extends StreamingQueryListener {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[BatchMetric]()
    private val terminated = java.util.concurrent.ConcurrentHashMap.newKeySet[UUID]()

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()

    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val wm = Option(p.eventTime.get("watermark"))
        .map(s => java.time.Instant.parse(s).toEpochMilli)
        // Spark reports epoch (1970-01-01) before any watermark exists
        .filter(_ > 0L)
      def dur(k: String): Long =
        Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
      buf.add(BatchMetric(
        p.id.toString, p.batchId, p.numInputRows,
        dur("triggerExecution"),
        p.inputRowsPerSecond, p.processedRowsPerSecond,
        wm, p.stateOperators.map(_.numRowsTotal).sum,
        java.time.Instant.parse(p.timestamp).toEpochMilli,
        commit_ms = dur("walCommit") + dur("commitOffsets"),
        state_commit_ms = p.stateOperators.map(_.commitTimeMs).sum))
    }

    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
      terminated.add(e.id); ()
    }

    def batches: Seq[BatchMetric] = buf.asScala.toSeq

    /** Block until `n` queries observed through this listener have
      * terminated (⇒ all their progress events are in [[batches]]). */
    def awaitTerminated(n: Int = 1, timeoutMs: Long = 60000L): Unit = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (terminated.size < n) {
        if (System.nanoTime() > deadline)
          throw new java.util.concurrent.TimeoutException(
            s"listener saw ${terminated.size}/$n terminated queries after ${timeoutMs} ms")
        Thread.sleep(20)
      }
    }

    def snapshot(spark: SparkSession): DataFrame = {
      import spark.implicits._
      batches.toDF()
    }
  }

  /** End-to-end latency stats of a sunk relation carrying event-time
    * `ts` and ingest-time `created_at` — metrics_queries.sql:16-19
    * re-expressed: avg / exact P95 / exact P99 / max of
    * (created_at − ts) in ms, plus the event count. Shared verbatim by
    * the q02 driver entry (DuckDB hash-checked) and [[selfMetrics]]. */
  def latencyStats(events: DataFrame): DataFrame =
    events
      .withColumn("latency_ms",
        unix_millis(col("created_at")) - unix_millis(col("ts")))
      .agg(
        avg(col("latency_ms")).as("avg_latency_ms"),
        expr("percentile(latency_ms, 0.95)").as("p95_latency_ms"),
        expr("percentile(latency_ms, 0.99)").as("p99_latency_ms"),
        max(col("latency_ms")).as("max_latency_ms"),
        count("*").as("total_events"))

  /** One self-measured streaming run over the fixture's wire-format
    * events: JSON lines under `work/in` (`parts` files ⇒ ≥`parts`
    * micro-batches), watermarked parse → checkpointed parquet sink at
    * `work/out`, a [[MetricsListener]] attached for the duration.
    * Returns the listener (complete — awaitTerminated has run).
    * Shared by m01 (gauge snapshot) and m03 (durable series). */
  private def measuredRun(s: SparkSession, dir: String, work: String,
                          parts: Int): MetricsListener = {
    val inDir = s"$work/in"; val outDir = s"$work/out"; val ck = s"$work/ck"
    Tables.clicks(s, dir).select(
        col("event_id").cast("string").as("event_id"),
        col("user_id").cast("string").as("user_id"),
        unix_millis(col("ts")).as("ts"),
        col("page"), col("referrer"), col("country"), col("device"))
      // repartition, NOT coalesce: the upstream may be a single partition
      // (sf0.001's one parquet file), and this entry NEEDS ≥2 files —
      // one file per micro-batch, and the watermark gauge is reported
      // with a one-batch lag, so a single batch would read watermark 0
      .toJSON.repartition(parts).write.text(inDir)

    val listener = new MetricsListener
    s.streams.addListener(listener)
    try {
      // several micro-batches (one file each) so the per-batch series is
      // real and the watermark — reported with one-batch lag — shows up;
      // the stream is non-stateful, so the advancing watermark drops
      // nothing and every input row reaches the sink
      val raw = s.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))
        .option("maxFilesPerTrigger", "1")
        .text(inDir)
      ClickPipeline.runAppendParquet(
        ClickPipeline.withEventTime(ClickPipeline.parse(raw)),
        outDir, ck)
      listener.awaitTerminated(n = 1)
    } finally s.streams.removeListener(listener)
    listener
  }

  /** m01 — self-measured run: the watermarked stream → checkpointed
    * parquet sink over the fixture's wire-format events, with a
    * [[MetricsListener]] attached; returns the tall (metric, value)
    * gauge table described in the object doc. */
  def selfMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = tempDir("graft_m01_")
    val listener = measuredRun(s, dir, work, parts = 4)
    val outDir = s"$work/out"

    val bm = listener.batches
    val sunk = s.read.parquet(outDir)
    val lat = latencyStats(sunk).head()

    val rows = Seq(
      "input_rows_total" -> bm.map(_.input_rows).sum.toDouble,
      "micro_batches" -> bm.size.toDouble,
      "batch_duration_ms_avg" ->
        (if (bm.isEmpty) 0.0 else bm.map(_.batch_duration_ms).sum.toDouble / bm.size),
      "batch_duration_ms_max" -> bm.map(_.batch_duration_ms).max.toDouble,
      "rows_per_sec_overall" -> (bm.map(_.input_rows).sum.toDouble * 1000.0
        / math.max(1L, bm.map(_.batch_duration_ms).sum)),
      "watermark_ms_last" -> bm.flatMap(_.watermark_ms).lastOption.getOrElse(0L).toDouble,
      "state_rows_last" -> bm.map(_.state_rows).lastOption.getOrElse(0L).toDouble,
      "sink_rows" -> sunk.count().toDouble,
      "latency_avg_ms" -> lat.getDouble(0),
      "latency_p95_ms" -> lat.getDouble(1),
      "latency_p99_ms" -> lat.getDouble(2),
      "latency_max_ms" -> lat.getLong(3).toDouble)
    rows.toDF("metric", "value").orderBy("metric")
  }

  /** Observed-metrics recorder: one (rows, parse_errors) pair per
    * micro-batch from `df.observe(name, …)` aggregates, delivered via
    * `StreamingQueryProgress.observedMetrics`. Same bus/completeness
    * contract as [[MetricsListener]]. */
  class ObservedQualityListener(metricName: String) extends StreamingQueryListener {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    private val terminated = java.util.concurrent.ConcurrentHashMap.newKeySet[UUID]()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val om = e.progress.observedMetrics
      if (om.containsKey(metricName)) {
        val r = om.get(metricName)
        buf.add((r.getAs[Long]("rows"), r.getAs[Long]("parse_errors")))
      }
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
      terminated.add(UUID.fromString(e.id.toString)); ()
    }
    def totals: (Long, Long) =
      buf.asScala.foldLeft((0L, 0L)) { case ((r, p), (br, bp)) => (r + br, p + bp) }
    def awaitTerminated(timeoutMs: Long = 60000L): Unit = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (terminated.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      require(terminated.size >= 1, "streaming query did not terminate in time")
    }
  }

  /** m02 — `observe()` data-quality gauges on the PERMISSIVE parse path
    * (A3/A4): per-micro-batch observed row/parse-error counts, summed
    * across the run. `observe` aggregates ride INSIDE the streaming
    * plan (computed where the data is, reported per batch through the
    * progress bus) — the scale-correct way to count drops; a separate
    * counting query would re-read the source.
    *
    * Every 100th event's wire line is corrupted deterministically
    * (JSON-prefix mangle keyed on event_id), so the expected totals are
    * a pure function of the fixture and the entry is HASH-checked:
    * observed rows = all lines, parse errors = corrupted lines, sunk
    * rows = the difference. */
  def observedQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val work = tempDir("graft_m02_")
    val inDir = s"$work/in"; val outDir = s"$work/out"; val ck = s"$work/ck"

    Tables.clicks(s, dir).select(
        col("event_id").cast("string").as("event_id"),
        col("user_id").cast("string").as("user_id"),
        unix_millis(col("ts")).as("ts"),
        col("page"), col("referrer"), col("country"), col("device"))
      .toJSON
      // mangle every 100th line into non-JSON (the braces survive in the
      // payload, so the line count is unchanged)
      .select(when(
          get_json_object(col("value"), "$.event_id").cast("long") % 100 === 0,
          concat(lit("corrupt::"), col("value"))).otherwise(col("value")).as("value"))
      .coalesce(4).write.text(inDir)

    val raw = s.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .text(inDir)
    val observed = ClickPipeline.parseErrorFilter(
      ClickPipeline.deserialize(raw).observe("m02_quality",
        count(lit(1)).as("rows"),
        count(when(col("event_id").isNull, lit(1))).as("parse_errors")))

    val listener = new ObservedQualityListener("m02_quality")
    s.streams.addListener(listener)
    try {
      ClickPipeline.runAppendParquet(observed, outDir, ck)
      listener.awaitTerminated()
    } finally s.streams.removeListener(listener)

    val (rows, errs) = listener.totals
    val sunk = s.read.parquet(outDir).count()
    Seq(
      ("parse_errors_total", errs),
      ("rows_observed_total", rows),
      ("rows_sunk", sunk)).toDF("metric", "value").orderBy("metric")
  }

  val observedQualitySql: String =
    s"""WITH clicks AS (${Tables.clicksSql}),
       |n AS (SELECT COUNT(*) AS total,
       |             CAST(SUM(CASE WHEN event_id % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad
       |      FROM clicks)
       |SELECT 'parse_errors_total' AS metric, bad AS value FROM n
       |UNION ALL SELECT 'rows_observed_total', total FROM n
       |UNION ALL SELECT 'rows_sunk', total - bad FROM n
       |ORDER BY metric""".stripMargin

  // -------------------------------------------------------------------
  // Durable metrics series (m03) — the reference scrapes its pipeline
  // into Prometheus continuously (MONITORING_SETUP.md:1-50,
  // docker/prometheus/prometheus.yml); the in-memory listener (m01)
  // only lives for one run. The durable analogue: append each run's
  // per-batch series to a schema'd parquet `metrics` table keyed by
  // run_id, queryable across runs and restarts like any other table.
  // -------------------------------------------------------------------

  /** Append one run's per-batch series to the durable metrics table.
    * Plain parquet append of an O(#batches) driver-side buffer — the
    * data plane is untouched; at any scale this is metadata-sized.
    *
    * Partitioned by UTC day of the batch wall clock so the series ages
    * with the same B3 partition-drop machinery as the event store
    * ([[expireRuns]]) — the reference's Prometheus keeps a bounded
    * retention window too (docker/prometheus/prometheus.yml). */
  def persistRun(s: SparkSession, batches: Seq[BatchMetric],
                 metricsDir: String, runId: String): Unit = {
    import s.implicits._
    batches.toDF().withColumn("run_id", lit(runId))
      .withColumn(graft.store.EventStore.DayGrain,
        date_format(timestamp_millis(col("wall_time_ms")), "yyyyMMdd"))
      .write.mode("append")
      .partitionBy(graft.store.EventStore.DayGrain).parquet(metricsDir)
  }

  /** Retention for the durable metrics series: drop whole day
    * partitions older than `retainDays` before `asOf` — B3's `expire`
    * applied verbatim to the metrics table. Returns dropped partition
    * values. */
  def expireRuns(s: SparkSession, metricsDir: String,
                 asOf: java.sql.Timestamp, retainDays: Int): Seq[String] =
    graft.store.EventStore.expire(s, metricsDir,
      graft.store.EventStore.DayGrain, asOf, retainDays)

  /** Per-run operational rollup over the persisted series: batches,
    * rows, overall throughput, and worst watermark lag (wall clock at
    * batch end minus event-time watermark — the reference's
    * freshness/lag dashboard panel). One scan, one agg; run_id count is
    * O(runs), never large. */
  def runSummary(s: SparkSession, metricsDir: String): DataFrame =
    s.read.parquet(metricsDir)
      .groupBy(col("run_id"))
      .agg(
        count("*").as("batches"),
        sum(col("input_rows")).as("rows_total"),
        (sum(col("input_rows")) * lit(1000.0) /
          greatest(sum(col("batch_duration_ms")), lit(1L))).as("rows_per_sec"),
        max(col("wall_time_ms") - col("watermark_ms")).as("max_watermark_lag_ms"))
      .orderBy(col("run_id"))

  // -------------------------------------------------------------------
  // Bench adjudication history (VERDICT r19 task 7): each bench run's
  // per-entry band verdicts and canary timeline, appended to the same
  // durable metrics root m03 maintains — so cross-round regression
  // questions ("when did x43 get slow?") are ONE SQL query over a
  // table instead of seven BENCH_r*.json files:
  //   SELECT run_id, median_sec, band_hi FROM bench_entries
  //   WHERE entry = 'x43_...' AND has_band AND NOT in_band ORDER BY run_id
  // Two sibling day-partitioned parquet relations under the root
  // (entry verdicts + canary samples — different grains, so separate
  // schemas beat a nullable union), aged by the same B3 partition-drop
  // machinery as the run series. Driver-side O(entries) rows per run —
  // metadata-sized at any scale.
  // -------------------------------------------------------------------

  final case class BenchEntryVerdict(entry: String, median_sec: Double,
      min_sec: Double, band_lo: Double, band_hi: Double, has_band: Boolean,
      in_band: Boolean, sweep_idx: Int, wall_time_ms: Long)

  final case class BenchCanary(sample_at: Int, cpu_ms: Double,
      io_ms: Double, wall_time_ms: Long)

  def persistBenchRun(s: SparkSession, root: String, runId: String,
                      entries: Seq[BenchEntryVerdict],
                      canaries: Seq[BenchCanary]): Unit = {
    import s.implicits._
    def stamp(df: DataFrame): DataFrame = df
      .withColumn("run_id", lit(runId))
      .withColumn(graft.store.EventStore.DayGrain,
        date_format(timestamp_millis(col("wall_time_ms")), "yyyyMMdd"))
    stamp(entries.toDF()).write.mode("append")
      .partitionBy(graft.store.EventStore.DayGrain)
      .parquet(s"$root/bench_entries")
    stamp(canaries.toDF()).write.mode("append")
      .partitionBy(graft.store.EventStore.DayGrain)
      .parquet(s"$root/bench_canaries")
  }

  /** Per-run adjudication rollup over the persisted history — the
    * cross-round regression dashboard: entry counts, out-of-band
    * counts, total seconds, and the run's canary-trip counts (the same
    * `> 2x quiet_ref` rule the artifact applies). */
  def benchHistory(s: SparkSession, root: String,
                   cpuRefMs: Double = 45.0,
                   ioRefMs: Double = 300.0): DataFrame = {
    val e = s.read.parquet(s"$root/bench_entries")
      .groupBy("run_id")
      .agg(count(lit(1)).as("n_entries"),
        sum(when(col("has_band") && !col("in_band"), 1L).otherwise(0L))
          .as("n_out_of_band"),
        round(sum(col("median_sec")), 3).as("total_sec"))
    val c = s.read.parquet(s"$root/bench_canaries")
      .groupBy("run_id")
      .agg(sum(when(col("cpu_ms") > 2 * cpuRefMs, 1L).otherwise(0L))
          .as("over_cpu"),
        sum(when(col("io_ms") > 2 * ioRefMs, 1L).otherwise(0L))
          .as("over_io"))
    e.join(c, Seq("run_id"), "left").orderBy("run_id")
  }

  /** m03 — one measured run appended to a durable metrics table, then
    * the per-run rollup over that table. Values are wall-clock ⇒
    * rows-only driver check; the across-runs append/union contract
    * (the part a single entry invocation can't show) is spec-asserted
    * by MetricsSpec with two runs against one table. */
  def metricsHistory(s: SparkSession, dir: String): DataFrame = {
    val work = tempDir("graft_m03_")
    val listener = measuredRun(s, dir, work, parts = 2)
    persistRun(s, listener.batches, s"$work/metrics", "run-001")
    runSummary(s, s"$work/metrics")
  }

  val all: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] = Seq(
    "m01_self_metrics" -> ((selfMetrics _, None)),
    "m02_observed_quality" -> ((observedQuality _, Some(observedQualitySql))),
    "m03_metrics_history" -> ((metricsHistory _, None)),
  )
}
