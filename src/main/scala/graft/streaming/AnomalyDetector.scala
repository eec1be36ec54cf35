package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A9/A10: stateful per-(page, country) anomaly detection over the
  * per-minute `cnt` series — the streaming twin of the batch
  * `ReferenceQueries.q17` cumulative-window formulation, with exact
  * semantic parity to the reference (StreamJob.java:130-191):
  *
  *  - Welford's online recurrence for running mean / M2
  *    (StreamJob.java:160-170) in keyed `GroupState`;
  *  - the current window's own `cnt` is folded into the stats BEFORE its
  *    z-score is computed (update precedes the test, :160-181);
  *  - sample stddev = sqrt(M2 / (n-1)) (:179);
  *  - flag only after more than [[MinPoints]] observations (:178) and
  *    when stddev > 0; threshold z > [[ZThreshold]] (:175).
  *
  * Rows arriving within one micro-batch are processed in window order, so
  * a bounded replay through [[detect]] is bit-identical to the batch q17
  * — which is exactly how the driver's s02 entry is oracle-checked.
  */
object AnomalyDetector {

  /** One per-minute aggregate observation (the A8 input). */
  case class AggRow(window_start_ms: Long, page: String, country: String, cnt: Long)

  /** Welford running state. M2 follows the Welford recurrence
    * (m2 += (x − mean_prev)·(x − mean_new)); the mean is represented as
    * sum/n rather than incrementally — the observations are integer
    * counts, whose sum is EXACT in a double (< 2^53), so `mean` is
    * bit-identical to a two-pass AVG and to the DuckDB oracle, where the
    * incremental mean would drift by ~1 ulp per step and flip the
    * driver's 9-significant-digit canonicalization on dyadic boundaries. */
  case class WelfordState(n: Long, sum: Double, m2: Double) {
    def mean: Double = if (n == 0) 0.0 else sum / n
    def update(x: Double): WelfordState = {
      val meanPrev = mean
      val n1 = n + 1
      val sum1 = sum + x
      val mean1 = sum1 / n1
      WelfordState(n1, sum1, m2 + (x - meanPrev) * (x - mean1))
    }
    def sampleStd: Double = if (n > 1) math.sqrt(m2 / (n - 1)) else 0.0
  }

  case class AnomalyRow(window_start_ms: Long, page: String, country: String,
                        cnt: Long, n: Long, mean: Double,
                        z_score: Double, is_anomaly: Boolean)

  val MinPoints = 5
  val ZThreshold = 2.5

  /** One Welford step: update first, then score against the updated stats. */
  def step(st: WelfordState, r: AggRow): (WelfordState, AnomalyRow) = {
    val s2 = st.update(r.cnt.toDouble)
    val std = s2.sampleStd
    val z = if (s2.n > MinPoints && std > 0) math.abs(r.cnt - s2.mean) / std else 0.0
    (s2, AnomalyRow(r.window_start_ms, r.page, r.country, r.cnt,
                    s2.n, s2.mean, z, z > ZThreshold))
  }

  /** Streaming operator: keyed Welford state over (page, country).
    * State is O(1) per key — three doubles — regardless of stream length;
    * at 100 TB the key cardinality (pages × countries) bounds total state.
    *
    * Two interchangeable engines with identical semantics (parity-tested
    * in StreamingSpec): [[detect]] uses `flatMapGroupsWithState`, which
    * runs on every state-store provider; [[detectTws]] uses Spark 4's
    * `transformWithState` (the current arbitrary-state API — typed state
    * handles, optional TTL, timers), which requires the RocksDB state
    * store provider. */
  def detect(ds: Dataset[AggRow]): Dataset[AnomalyRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(r => (r.page, r.country))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (String, String), rows: Iterator[AggRow], state: GroupState[WelfordState]) =>
          var st = state.getOption.getOrElse(WelfordState(0, 0.0, 0.0))
          val out = rows.toIndexedSeq.sortBy(_.window_start_ms).map { r =>
            val (s2, row) = step(st, r)
            st = s2
            row
          }
          state.update(st)
          out.iterator
      }
  }

  /** [[detect]]'s StatefulProcessor implementation for `transformWithState`. */
  class WelfordProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      (String, String), AggRow, AnomalyRow] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ValueState}
    @transient private var state: ValueState[WelfordState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[WelfordState]("welford",
        org.apache.spark.sql.Encoders.product[WelfordState], TTLConfig.NONE)

    override def handleInputRows(key: (String, String), rows: Iterator[AggRow],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[AnomalyRow] = {
      var st = if (state.exists()) state.get() else WelfordState(0, 0.0, 0.0)
      val out = rows.toIndexedSeq.sortBy(_.window_start_ms).map { r =>
        val (s2, row) = step(st, r)
        st = s2
        row
      }
      state.update(st)
      out.iterator
    }
  }

  /** transformWithState flavor of [[detect]]. The session must run the
    * RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def detectTws(ds: Dataset[AggRow]): Dataset[AnomalyRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(r => (r.page, r.country))
      .transformWithState(new WelfordProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append)
  }

  /** A10: keep only anomalies; `message` carries the reference's exact
    * alert shape — `"ANOMALY DETECTED: %s - %s"` of (agg.toString, reason)
    * with agg rendered as PageMinuteAgg{...} (StreamJob.java:86-88,276)
    * and reason as `"Z-score %.2f exceeds threshold %.2f"`
    * (StreamJob.java:185) — alongside the full detector columns for
    * consumers that want structure, not strings. */
  def anomalies(ds: Dataset[AnomalyRow]): DataFrame =
    ds.toDF()
      .filter(col("is_anomaly"))
      .withColumn("message", format_string(
        "ANOMALY DETECTED: PageMinuteAgg{window_start=%s, page='%s', country='%s', cnt=%d} - Z-score %.2f exceeds threshold %.2f",
        date_format(timestamp_millis(col("window_start_ms")), "yyyy-MM-dd HH:mm:ss"),
        col("page"), col("country"), col("cnt"),
        col("z_score"), lit(ZThreshold)))

  /** A10 console sink (print-to-stdout analogue). Caller starts/stops. */
  def consoleSink(ds: Dataset[AnomalyRow]): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    anomalies(ds).writeStream.outputMode("append").format("console")
}
