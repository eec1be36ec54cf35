package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streamed CUSUM drift detection (s29) — x79's statistic run the way a
  * LIVE pipeline runs it: the textbook RECURSION S⁺ₜ = max(0, S⁺ₜ₋₁ +
  * zₜ − k) folded in keyed state, ONE double per key. Batch x79 needs
  * the prefix-sum closed form because the recursion is non-associative;
  * a stream just... runs the recursion. The pair is the point: the
  * driver oracle checks the streamed fold against the closed form
  * evaluated by a different engine (DuckDB windows), which proves
  * recursion ≡ closed form cross-engine on the full fixture — the same
  * batch≡stream twin discipline as s01≡q14 and s02≡q17.
  *
  * The z-scores arrive PRE-STANDARDIZED (computed batch-side from exact
  * integer moments, identically in both engines): a production deploy
  * standardizes against a trained baseline window exactly like this —
  * the reference params are a lookup, not stream state. State is one
  * double; rows within a micro-batch are folded in event-time order
  * (the harness feeds one file = one batch, same as s02).
  */
object DriftDetector {
  case class ZRow(minute_ms: Long, page: String, z: Double)
  case class DriftRow(minute_ms: Long, page: String, s_plus: Double,
                      is_drift: Boolean)
  case class CusumState(sPlus: Double)

  val K = 0.5 // slack per step (σ units) — must match x79's CusumK
  val H = 5.0 // decision threshold — must match x79's CusumH

  def step(st: CusumState, r: ZRow): (CusumState, DriftRow) = {
    val s = math.max(0.0, st.sPlus + r.z - K)
    (CusumState(s), DriftRow(r.minute_ms, r.page, s, s > H))
  }

  def detect(ds: Dataset[ZRow]): Dataset[DriftRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.page)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[ZRow], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0.0))
          val out = rows.toIndexedSeq.sortBy(_.minute_ms).map { r =>
            val (s2, row) = step(st, r)
            st = s2
            row
          }
          state.update(st)
          out.iterator
      }
  }
}
