package graft.gen

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native synthetic click generator with the reference producer's
  * distributions (produce.py:20-137): weighted pages/countries/devices,
  * a bounded active-user pool with 70% session reuse, per-user referrer
  * chains, and a configurable event rate.
  *
  * Design: fully deterministic and fully distributed. Each row's
  * randomness derives from seeded xxhash64 of the row id (no RNG state,
  * no driver loop) — `spark.range(n)` partitions the id space across
  * executors, every column is a pure row-local expression, and the ONLY
  * shuffle is the per-user window that builds referrer chains (the lag
  * over (user, ts) — inherently a co-partition by user). produce.py's
  * sequential session dict becomes: 70% of events draw their user from a
  * 5000-slot active pool, 30% draw fresh uniform ids (produce.py:73-93);
  * the referrer is the user's previous page, initial "/"
  * (produce.py:101,121-124); a session's first event is "/" with
  * probability 0.4 (produce.py:114-116).
  */
object EventGenerator {

  /** Weighted page paths (produce.py:25-37). */
  val Pages: Seq[(String, Double)] = Seq(
    "/" -> 0.25, "/search" -> 0.15, "/product/42" -> 0.12, "/cart" -> 0.10,
    "/product/101" -> 0.08, "/checkout" -> 0.08, "/user/profile" -> 0.07,
    "/product/205" -> 0.05, "/help" -> 0.05, "/about" -> 0.03, "/contact" -> 0.02)

  /** Weighted countries (produce.py:40-49). */
  val Countries: Seq[(String, Double)] = Seq(
    "US" -> 0.35, "IN" -> 0.20, "DE" -> 0.12, "FR" -> 0.10,
    "JP" -> 0.08, "GB" -> 0.07, "CA" -> 0.05, "AU" -> 0.03)

  /** Weighted devices (produce.py:52-56). */
  val Devices: Seq[(String, Double)] = Seq(
    "mobile" -> 0.60, "desktop" -> 0.35, "tablet" -> 0.05)

  val ActivePoolSize = 5000     // produce.py:86 max active sessions
  val ReuseProbability = 0.7    // produce.py:79 session reuse

  /** Deterministic uniform [0,1) from (seed, salt, id) — codegen'd hash,
    * no RNG state to coordinate across executors. */
  private def u01(id: org.apache.spark.sql.Column, salt: Int, seed: Long) =
    (pmod(xxhash64(lit(seed), lit(salt), id), lit(1L << 40)).cast("double")
      / (1L << 40).toDouble)

  /** Inverse-CDF weighted choice as a when-chain (stays in codegen). */
  private def weighted(u: org.apache.spark.sql.Column,
                       weights: Seq[(String, Double)]) = {
    val cdf = weights.scanLeft(("", 0.0)) { case ((_, acc), (v, w)) => (v, acc + w) }.tail
    cdf.init.foldRight(lit(cdf.last._1): org.apache.spark.sql.Column) {
      case ((v, cum), elseCol) => when(u < cum, lit(v)).otherwise(elseCol)
    }
  }

  /** Generate `n` events starting at `startMs`, `ratePerSec` events/sec
    * (produce.py default 100, produce.py:228-229). Output matches the
    * wire schema (string ids, epoch-ms ts) plus nothing else — ready for
    * [[graft.streaming.ClickPipeline.parse]] round-trips via toJSON. */
  def events(spark: SparkSession, n: Long, seed: Long = 42L,
             startMs: Long = 1704067200000L, // 2024-01-01 00:00:00 UTC
             ratePerSec: Double = 100.0): DataFrame = {
    val id = col("id")
    // 70%: user from the bounded active pool; 30%: fresh uniform id.
    // Pool slots map to stable user ids so reused "sessions" really do
    // recur; country/device are per-user (produce.py keys them by session).
    val userNum = when(u01(id, 1, seed) < ReuseProbability,
        pmod(xxhash64(lit(seed), lit(2), id), lit(ActivePoolSize.toLong)) + 1L)
      .otherwise(pmod(xxhash64(lit(seed), lit(3), id), lit(999999L)) + 1L)

    val base = spark.range(n)
      .withColumn("ts", (lit(startMs) + (id * (1000.0 / ratePerSec)).cast("long")))
      .withColumn("user_num", userNum)
      .withColumn("user_id", format_string("u%06d", col("user_num")))
      .withColumn("event_id", concat(
        lpad(hex(xxhash64(lit(seed), lit(4), id)), 16, "0"),
        lpad(hex(xxhash64(lit(seed), lit(5), id)), 16, "0")))
      .withColumn("country", weighted(u01(col("user_num"), 6, seed), Countries))
      .withColumn("device", weighted(u01(col("user_num"), 7, seed), Devices))
      .withColumn("page_raw", weighted(u01(id, 8, seed), Pages))

    // Referrer chain + first-view rule need per-user event order: one
    // hash-shuffle on user_num (unavoidable — the chain is per-user state).
    val w = Window.partitionBy(col("user_num")).orderBy(col("ts"), id)
    base
      .withColumn("seq", row_number().over(w))
      .withColumn("page",
        when(col("seq") === 1 && u01(id, 9, seed) < 0.4, "/")
          .otherwise(col("page_raw")))
      .withColumn("referrer",
        coalesce(lag(col("page"), 1).over(w), lit("/")))
      .select(col("event_id"), col("user_id"), col("ts"),
              col("page"), col("referrer"), col("country"), col("device"))
  }

  /** The exact (key, value) relation [[writeKafka]] publishes — split out
    * so the producer contract is unit-testable without a broker: key =
    * user_id (one user's events land in ONE partition and arrive in
    * order — the property the referrer chain depends on downstream,
    * produce.py:166), value = the full event as JSON, losslessly
    * re-parseable by [[graft.streaming.ClickPipeline.parse]]. */
  def kafkaRecords(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast("string").as("key"),
      to_json(struct(events.columns.map(col): _*)).as("value"))

  /** Producer → Kafka parity (produce.py:150-166). Compiles against the
    * Spark Kafka connector; not runnable in the sandbox (no broker) —
    * the produced relation itself is covered by the
    * [[kafkaRecords]] contract spec. */
  def writeKafka(events: DataFrame, brokers: String,
                 topic: String = "click_events"): Unit =
    kafkaRecords(events)
      .write.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("topic", topic)
      .save()
}
