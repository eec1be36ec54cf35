package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of one user merge into a
  * session while each arrives at or within `gap` of the previous; only a
  * quiet period STRICTLY longer than the gap starts a new session
  * (adjacent per-event windows coalesce — pinned in SessionizeSpec).
  * The canonical clickstream / training-data
  * primitive (the reference's producer even simulates sessions —
  * produce.py:73-93 — but its pipeline never reconstructs them).
  *
  * Built on Spark's native `session_window`, so the SAME expression runs
  * batch and streaming: in streaming, session state merges across
  * micro-batches and a session is emitted once the watermark passes its
  * close (exercised end-to-end by the s08 driver entry, hash-checked
  * against the batch oracle). One hash shuffle on the user key; state is
  * bounded by the watermark. `session_window.end` is defined as
  * `last_event + gap`, so [[durationMs]] subtracts the gap back out to
  * give the observed first→last span.
  */
object Sessionize {

  val DefaultGap = "30 minutes"

  /** Observed session span: first→last event, gap removed. */
  def durationMs(gap: String = DefaultGap): Column =
    unix_millis(col("session.end") - expr(s"INTERVAL $gap")) -
      unix_millis(col("session.start"))

  /** One row per (user, session): bounds, event count, observed span.
    * Works on a batch OR streaming `events` relation (streaming needs a
    * watermark on `tsCol` upstream). */
  def sessions(events: DataFrame, userCol: String = "user_id",
               tsCol: String = "ts", gap: String = DefaultGap): DataFrame =
    events
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("session"))
      .agg(count("*").as("n_events"))
      .select(col(userCol), col("session.start").as("session_start"),
              col("session.end").as("session_end"), col("n_events"),
              durationMs(gap).as("duration_ms"))

  /** Deterministic corpus-level summary: sessions histogrammed by their
    * event count (the shape analysts read session quality from). */
  def sessionHistogram(sessionsDf: DataFrame): DataFrame =
    sessionsDf
      .groupBy(col("n_events").as("events_per_session"))
      .agg(count("*").as("n_sessions"),
           sum(col("duration_ms")).as("total_duration_ms"))
      .orderBy("events_per_session")
}
