package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/** The nightly maintenance pass, as ONE schedulable unit.
  *
  * The reference stack runs its upkeep as independent background
  * machinery — MergeTree part merges and TTL drops inside ClickHouse
  * (clickhouse_tables.sql's `TTL created_at + INTERVAL 30 DAY` and the
  * engine's merge threads) and Prometheus's own retention window
  * (docker/prometheus/prometheus.yml). This engine's equivalents exist
  * as separate operators (B3 `EventStore.expire`, O4
  * `EventStore.compact`, `FingerprintStore.compact`,
  * `PipelineMetrics.expireRuns`); [[run]] composes them into the single
  * "maintenance window" job a production deployment would schedule,
  * and returns a unified report relation — one row per (component,
  * action) with before/after counts — so the pass is observable and
  * auditable like any other query.
  *
  * Contract:
  *  - Each sub-step keeps its own crash-safety story (compact's
  *    write-tmp-then-swap, the fingerprint store's staging recovery);
  *    composition adds no new failure mode because the steps share no
  *    mutable state and each is individually idempotent.
  *  - The whole pass is IDEMPOTENT: a second run over the same stores
  *    reports zero partitions dropped and zero partitions rewritten
  *    (spec-asserted) — safe to re-fire after a scheduler retry.
  *  - Optional targets are simply skipped (a deployment without a
  *    fingerprint store runs the same job).
  *
  * Scale: every step is metadata-bounded on the driver (partition/file
  * listings) with the data work — compaction rewrites, the distinct
  * rewrite — running as ordinary distributed jobs; nothing here
  * collects row data.
  */
object Maintenance {

  /** One report row. `units` are partitions for expire steps, data
    * files for compact steps. */
  private[graft] case class Step(component: String, action: String,
                                 units_before: Long, units_after: Long,
                                 detail: String)

  private def grainDirs(s: SparkSession, root: String, grain: String): Long = {
    val p = new Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else fs.listStatus(p)
      .count(st => st.isDirectory && st.getPath.getName.startsWith(s"$grain=")).toLong
  }

  private def dataFiles(s: SparkSession, root: String): Long = {
    val p = new Path(root)
    val fs = p.getFileSystem(s.sessionState.newHadoopConf())
    def walk(d: Path): Long = fs.listStatus(d).map { st =>
      val n = st.getPath.getName
      if (n.startsWith("_") || n.startsWith(".")) 0L
      else if (st.isDirectory) walk(st.getPath)
      else 1L
    }.sum
    if (fs.exists(p)) walk(p) else 0L
  }

  /** Run the maintenance window over an event warehouse (TTL then
    * compaction), and optionally a durable metrics series (TTL) and a
    * fingerprint store (distinct rewrite). Report ordering is fixed
    * (component, action), values deterministic for a given store
    * state. */
  def run(s: SparkSession, warehouse: String, grain: String,
          asOf: Timestamp, retainDays: Int,
          metricsDir: Option[String] = None,
          metricsRetainDays: Int = 90,
          fpStore: Option[String] = None,
          targetFileBytes: Long = 128L << 20): DataFrame = {
    import s.implicits._
    val steps = scala.collection.mutable.ArrayBuffer.empty[Step]

    // 1. event warehouse TTL — whole-partition drops, straddlers kept
    val partsBefore = grainDirs(s, warehouse, grain)
    val dropped = EventStore.expire(s, warehouse, grain, asOf, retainDays)
    steps += Step("events", "expire", partsBefore, partsBefore - dropped.size,
      if (dropped.isEmpty) "nothing past retention"
      else s"dropped ${dropped.sorted.mkString(",")}")

    // 2. event warehouse compaction — AFTER expire, so expired
    // partitions are never pointlessly rewritten
    val filesBefore = dataFiles(s, warehouse)
    val rewritten = EventStore.compact(s, warehouse, grain, targetFileBytes)
    steps += Step("events", "compact", filesBefore, dataFiles(s, warehouse),
      s"${rewritten.size} partitions rewritten")

    // 3. metrics series TTL — B3 applied to the self-metrics table
    metricsDir.foreach { md =>
      val before = grainDirs(s, md, EventStore.DayGrain)
      val gone = graft.streaming.PipelineMetrics.expireRuns(
        s, md, asOf, metricsRetainDays)
      steps += Step("metrics", "expire", before, before - gone.size,
        if (gone.isEmpty) "nothing past retention"
        else s"dropped ${gone.sorted.mkString(",")}")
    }

    // 4. fingerprint store distinct rewrite — file-count + duplicate-fp
    // hygiene after many incremental-dedup appends
    fpStore.foreach { fp =>
      val before = dataFiles(s, fp)
      FingerprintStore.compact(s, fp)
      val fps = s.read.parquet(fp).count()
      steps += Step("fingerprints", "compact", before, dataFiles(s, fp),
        s"$fps distinct fingerprints")
    }

    steps.toSeq.toDF()
  }
}
