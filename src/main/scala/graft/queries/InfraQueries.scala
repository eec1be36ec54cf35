package graft.queries


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.gen.EventGenerator
import graft.store.{EventStore, FingerprintStore, Scd2}

/** Driver entries for the storage layer (B2/B3/B5) and the event
  * generator — each runs the real write→read (or generate→aggregate)
  * path and returns a deterministic relation.
  *
  * s04/s05 use DAY partition grain: the fixture spans one calendar month,
  * so the reference's monthly toYYYYMM grain would put everything in a
  * single partition and prune nothing (the grain is a parameter of
  * [[EventStore]]; month remains the production default).
  */
object InfraQueries {

  private def tempDir(prefix: String): String = graft.WorkDirs.tempDir(prefix)

  // ---------------------------------------------------------------------
  // s04 — partitioned warehouse round-trip with partition-pruned scan
  // ---------------------------------------------------------------------
  def storePartitioned(s: SparkSession, dir: String): DataFrame = {
    val wh = tempDir("graft_s04_wh_")
    EventStore.write(Tables.clicks(s, dir), wh, grain = EventStore.DayGrain)
    // predicate on the partition column: Catalyst prunes to 10 of ~30
    // partitions (plan-asserted in StoreSpec)
    EventStore.read(s, wh)
      .filter(col("day") >= "20240110" && col("day") <= "20240119")
      .groupBy(col("page"))
      .agg(count("*").as("events"),
           count_distinct(col("user_id")).as("unique_users"),
           unix_millis(min(col("ts"))).as("first_ms"),
           unix_millis(max(col("ts"))).as("last_ms"))
      .orderBy("page")
  }

  val storePartitionedSql: String =
    s"""WITH clicks AS (${Tables.clicksSql})
       |SELECT page, COUNT(*) AS events, COUNT(DISTINCT user_id) AS unique_users,
       |       epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS first_ms,
       |       epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS last_ms
       |FROM clicks
       |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
       |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20 00:00:00'
       |GROUP BY page ORDER BY page""".stripMargin

  // ---------------------------------------------------------------------
  // s05 — TTL retention: partitions past the cutoff are dropped (B3)
  // ---------------------------------------------------------------------
  def storeRetention(s: SparkSession, dir: String): DataFrame = {
    val wh = tempDir("graft_s05_wh_")
    EventStore.write(Tables.clicks(s, dir), wh, grain = EventStore.DayGrain)
    EventStore.expire(s, wh, EventStore.DayGrain,
      java.sql.Timestamp.valueOf(Tables.AsOf), retainDays = 15)
    EventStore.read(s, wh)
      .groupBy(col("page"))
      .agg(count("*").as("events"),
           unix_millis(min(col("ts"))).as("first_ms"))
      .orderBy("page")
  }

  val storeRetentionSql: String =
    s"""WITH clicks AS (${Tables.clicksSql})
       |SELECT page, COUNT(*) AS events,
       |       epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS first_ms
       |FROM clicks
       |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '${Tables.AsOf}' - INTERVAL 15 DAY
       |GROUP BY page ORDER BY page""".stripMargin

  // ---------------------------------------------------------------------
  // s10 — partition compaction (O4): many small files → few large ones,
  // content bit-identical (same oracle relation), sortedness + file
  // counts asserted in StoreSpec
  // ---------------------------------------------------------------------
  def storeCompaction(s: SparkSession, dir: String): DataFrame = {
    val wh = tempDir("graft_s10_wh_")
    EventStore.write(Tables.clicks(s, dir), wh, grain = EventStore.DayGrain)
    val rewritten = EventStore.compact(s, wh, EventStore.DayGrain)
    require(rewritten.nonEmpty, "compaction found nothing to rewrite — entry is vacuous")
    EventStore.read(s, wh)
      .groupBy(col("page"))
      .agg(count("*").as("events"),
           count_distinct(col("user_id")).as("unique_users"),
           count_distinct(col("day")).as("days"),
           unix_millis(min(col("ts"))).as("first_ms"),
           unix_millis(max(col("ts"))).as("last_ms"))
      .orderBy("page")
  }

  val storeCompactionSql: String =
    s"""WITH clicks AS (${Tables.clicksSql})
       |SELECT page, COUNT(*) AS events, COUNT(DISTINCT user_id) AS unique_users,
       |       COUNT(DISTINCT strftime(CAST(ts AS TIMESTAMP), '%Y%m%d')) AS days,
       |       epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS first_ms,
       |       epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS last_ms
       |FROM clicks GROUP BY page ORDER BY page""".stripMargin

  // ---------------------------------------------------------------------
  // x31 — salted skew join: page is the canonical hot key (5 values over
  // ~1M events); the salted join's result must be row-identical to the
  // plain join, proven by the unsalted oracle
  // ---------------------------------------------------------------------
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    val clicks = Tables.clicks(s, dir)
    val dim = clicks.groupBy(col("page"))
      .agg(count("*").as("page_total"),
           count_distinct(col("country")).as("page_countries"))
    graft.operators.Skew.saltedJoin(
        clicks, dim, key = "page", saltBy = col("event_id"), k = 8)
      .groupBy(col("page"), col("device"))
      .agg(count("*").as("events"),
           max(col("page_total")).as("page_total"),
           max(col("page_countries")).as("page_countries"))
      .orderBy("page", "device")
  }

  val saltedJoinSql: String =
    s"""WITH clicks AS (${Tables.clicksSql}),
       |dim AS (SELECT page, COUNT(*) AS page_total,
       |               COUNT(DISTINCT country) AS page_countries
       |        FROM clicks GROUP BY page)
       |SELECT c.page, c.device, COUNT(*) AS events,
       |       MAX(d.page_total) AS page_total,
       |       MAX(d.page_countries) AS page_countries
       |FROM clicks c JOIN dim d ON c.page = d.page
       |GROUP BY c.page, c.device ORDER BY c.page, c.device""".stripMargin

  // ---------------------------------------------------------------------
  // g01 — generator distribution summary (hash-seeded generation is not
  // reproducible in DuckDB → rows-only check; distributions asserted in
  // GeneratorSpec)
  // ---------------------------------------------------------------------
  def generatorStats(s: SparkSession, dir: String): DataFrame =
    EventGenerator.events(s, 50000)
      .groupBy(col("page"))
      .agg(count("*").as("events"),
           count_distinct(col("user_id")).as("unique_users"),
           avg(when(col("referrer") === "/", 0).otherwise(1)).as("chained_ratio"))
      .orderBy("page")

  // ---------------------------------------------------------------------
  // g02 — generated stream through the minute-agg pipeline (the
  // generator→engine integration the reference runs via Kafka)
  // ---------------------------------------------------------------------
  def generatorPipeline(s: SparkSession, dir: String): DataFrame =
    graft.streaming.ClickPipeline.minuteAggFromUserGrain(
      EventGenerator.events(s, 20000)
        .withColumn("ts", timestamp_millis(col("ts")))
        .groupBy(window(col("ts"), "1 minute").as("w"),
                 col("page"), col("country"), col("user_id"))
        .agg(count("*").as("cnt"))
        .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
                col("page"), col("country"), col("user_id"), col("cnt")))
      .select(unix_millis(col("window_start")).as("window_start_ms"),
              col("page"), col("country"), col("cnt"), col("unique_users"))
      .orderBy("window_start_ms", "page", "country")

  // ---------------------------------------------------------------------
  // x39 — mergeable-sketch distinct rollup: the scale answer to B7's
  // "unique users per coarser window". Exact distincts do NOT merge
  // (union ≠ sum), so a materialized daily table cannot produce weekly/
  // monthly uniques — Datasketches HLL sketches CAN: store one small
  // sketch per (page, day), union them per page at read time. The daily
  // sketch table is what a 100 TB warehouse materializes (kilobytes per
  // key, any rollup for free); the estimate's error bound vs the exact
  // distinct is spec-asserted. Estimates are approximate by design ⇒
  // rows-only driver check (same posture as q02a).
  // ---------------------------------------------------------------------
  def hllRollup(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.clicks(s, dir)
      .groupBy(col("page"), date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    daily.groupBy(col("page"))
      .agg(count(lit(1)).as("days"),
           hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_unique_users"))
      .orderBy("page")
  }

  // ---------------------------------------------------------------------
  // x75 — KMV (bottom-k / theta) sketch with SET OPERATIONS: the
  // pairwise daily-visitor overlap matrix between pages. HLL (x39) can
  // union but NOT intersect; KMV sketches over one shared hash support
  // both, so "how many daily visitors do /home and /products share" is
  // answered from group-grain sketch rows — one partial-agg'd shuffle of
  // ≤ k longs per page, never a pairwise distinct join over the fact
  // table (the ClickHouse uniqTheta intersect/union read path). The
  // 48-bit hash keeps every value double-exact in both engines, so the
  // DuckDB oracle reproduces the ESTIMATES bit-for-bit — the sketch math
  // itself is hash-verified, not just bounded. Error vs exact is
  // spec-asserted in KmvSketchSpec (~1/sqrt(k-2) ≈ 6% at k=256).
  // ---------------------------------------------------------------------
  private val KmvK = 256
  private val KmvFull = (KmvK - 1).toDouble * graft.functions.KmvAggregator.HashSpace

  def kmvOverlap(s: SparkSession, dir: String): DataFrame = {
    val hashed = Tables.clicks(s, dir).select(col("page"),
      expr("CAST(conv(substr(md5(concat(CAST(user_id AS STRING), '@', " +
           "date_format(ts, 'yyyy-MM-dd'))), 1, 12), 16, 10) AS BIGINT)").as("v"))
    // group-grain sketch rows (5 × ≤256 longs): localCheckpoint pins
    // them so the pair matrix's two references don't re-run the
    // corpus-grain aggregation — plans are trees, a self-join would
    // scan+aggregate twice
    val sk = hashed.groupBy("page")
      .agg(graft.functions.KmvAggregator.kmv(KmvK)(col("v")).as("sk"))
      .localCheckpoint()
    def est(c: Column): Column =
      when(size(c) < KmvK, size(c).cast("double"))
        .otherwise(lit(KmvFull) / element_at(c, KmvK).cast("double"))
    sk.select(col("page").as("page_a"), col("sk").as("ska"))
      .join(sk.select(col("page").as("page_b"), col("sk").as("skb")),
            col("page_a") < col("page_b"))
      .withColumn("uni", array_sort(array_union(col("ska"), col("skb"))))
      .withColumn("both", array_intersect(col("ska"), col("skb")))
      .withColumn("est_a", est(col("ska")))
      .withColumn("est_b", est(col("skb")))
      .withColumn("est_union", est(col("uni")))
      // Beyer et al. 2007 §4: rho = |K(A∪B) ∩ A ∩ B| / k; when the union
      // sketch never filled, both input sketches are complete distinct
      // sets and the intersection is exact.
      .withColumn("est_inter",
        when(size(col("uni")) < KmvK, size(col("both")).cast("double"))
          .otherwise(size(array_intersect(slice(col("uni"), 1, KmvK), col("both")))
                       .cast("double") / KmvK * col("est_union")))
      .withColumn("jaccard_est", col("est_inter") / col("est_union"))
      .select("page_a", "page_b", "est_a", "est_b", "est_union", "est_inter",
              "jaccard_est")
      .orderBy("page_a", "page_b")
  }

  /** DuckDB twin: the same k-minimum-values selection expressed
    * relationally (row_number ≤ k per group), the same 48-bit hash, the
    * same estimate arithmetic in the same operation order — integer
    * inputs are double-exact, so every CASE arm is bit-identical. */
  val kmvOverlapSql: String = {
    val full = s"CAST(${(KmvK - 1).toLong * graft.functions.KmvAggregator.HashSpace} AS DOUBLE)"
    val estU = s"CASE WHEN u.usz < $KmvK THEN CAST(u.usz AS DOUBLE) ELSE $full / u.ukth END"
    val estI = s"CASE WHEN u.usz < $KmvK THEN CAST(u.interall AS DOUBLE) " +
               s"ELSE CAST(u.interk AS DOUBLE) / $KmvK * ($estU) END"
    s"""WITH clicks AS (${Tables.clicksSql}),
       |base AS (
       |  SELECT DISTINCT page,
       |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '@' ||
       |      strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')), 1, 12)) AS BIGINT) AS v
       |  FROM clicks),
       |sk AS (
       |  SELECT page, v, row_number() OVER (PARTITION BY page ORDER BY v) AS rn
       |  FROM base QUALIFY rn <= $KmvK),
       |ag AS (SELECT page, count(*) AS sz, max(v) AS kth FROM sk GROUP BY page),
       |pairs AS (
       |  SELECT a.page AS page_a, a.sz AS sza, a.kth AS ka,
       |         b.page AS page_b, b.sz AS szb, b.kth AS kb
       |  FROM ag a JOIN ag b ON a.page < b.page),
       |merged AS (
       |  SELECT p.page_a, p.page_b, s.v,
       |         max(CASE WHEN s.page = p.page_a THEN 1 ELSE 0 END) AS in_a,
       |         max(CASE WHEN s.page = p.page_b THEN 1 ELSE 0 END) AS in_b
       |  FROM pairs p JOIN sk s ON s.page = p.page_a OR s.page = p.page_b
       |  GROUP BY 1, 2, 3),
       |mr AS (
       |  SELECT *, row_number() OVER (PARTITION BY page_a, page_b ORDER BY v) AS rn
       |  FROM merged),
       |u AS (
       |  SELECT page_a, page_b, count(*) AS usz,
       |         max(CASE WHEN rn = $KmvK THEN v END) AS ukth,
       |         sum(CASE WHEN rn <= $KmvK AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS interk,
       |         sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS interall
       |  FROM mr GROUP BY 1, 2)
       |SELECT p.page_a, p.page_b,
       |  CASE WHEN p.sza < $KmvK THEN CAST(p.sza AS DOUBLE) ELSE $full / p.ka END AS est_a,
       |  CASE WHEN p.szb < $KmvK THEN CAST(p.szb AS DOUBLE) ELSE $full / p.kb END AS est_b,
       |  $estU AS est_union,
       |  $estI AS est_inter,
       |  ($estI) / ($estU) AS jaccard_est
       |FROM pairs p JOIN u ON u.page_a = p.page_a AND u.page_b = p.page_b
       |ORDER BY p.page_a, p.page_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // s27 — SCD Type-2 dimension maintenance (warehouse MERGE): customer
  // priority-tier history built as initial load (pre-1998 orders) plus
  // an incremental MERGE of the later batch. The DuckDB oracle builds
  // the history FROM SCRATCH over the full stream, so the hash match
  // proves incremental merge ≡ batch rebuild — the invariant that makes
  // nightly dimension maintenance trustworthy. Merge cost is ∝ batch +
  // touched open versions (closed history passes through untouched);
  // see store/Scd2.scala for the scale shape.
  // ---------------------------------------------------------------------
  private val Scd2Cutoff = "1998-01-01 00:00:00"

  def scd2Merge(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("key"), col("o_orderdate").as("ts"))
      .agg(min(col("o_orderpriority")).as("attr"))
    val cut = to_timestamp(lit(Scd2Cutoff))
    // merge() references the dim three times (untouched / closed /
    // open-rebuild); in production that is a stored table read with
    // pushdown, here the initial load is pinned so the build runs once
    val dim0 = Scd2.fromObservations(obs.filter(col("ts") < cut)).localCheckpoint()
    Scd2.merge(dim0, obs.filter(col("ts") >= cut))
      .orderBy("key", "valid_from")
  }

  /** From-scratch gaps-and-islands over the full observation stream —
    * deliberately NOT the incremental plan, so equality is evidence. */
  val scd2MergeSql: String =
    s"""WITH obs AS (
       |  SELECT o_custkey AS key, o_orderdate AS ts, min(o_orderpriority) AS attr
       |  FROM orders GROUP BY 1, 2),
       |seq AS (SELECT *, lag(attr) OVER (PARTITION BY key ORDER BY ts) AS prev FROM obs),
       |runs AS (
       |  SELECT *, CAST(sum(CASE WHEN prev IS NULL OR prev <> attr THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY key ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
       |  FROM seq),
       |ver AS (SELECT key, run, min(attr) AS attr, min(ts) AS valid_from
       |        FROM runs GROUP BY 1, 2),
       |hist AS (
       |  SELECT key, attr, valid_from,
       |         lead(valid_from) OVER (PARTITION BY key ORDER BY valid_from) AS valid_to
       |  FROM ver)
       |SELECT key, attr, valid_from, valid_to, valid_to IS NULL AS is_current
       |FROM hist ORDER BY key, valid_from""".stripMargin

  // ---------------------------------------------------------------------
  // s28 — token-budget TRAINING-SHARD writer: assign every document a
  // position in the global token stream (distributed exact prefix sum —
  // operators/Prefix.scala, never a single-task global window), cut the
  // stream into fixed-budget shards by the doc's STARTING offset, write
  // the corpus partitioned by shard, read it back, and report per-shard
  // doc/token counts and id ranges — the Dolma/Megatron shard-prep step
  // between curation and the trainer. A doc longer than the budget owns
  // its shard (next doc starts a new one); integer arithmetic ⇒ exact
  // hash oracle against DuckDB's one-window cumsum.
  // ---------------------------------------------------------------------
  // tokens per shard, sized to the fixtures. GRAFT_SHARD_BUDGET is the
  // scale-harness override: production sizes the budget to the corpus
  // (Dolma/Megatron shards are 100M+ tokens), so the honest k× scale
  // measurement holds shard SIZE constant — budget 2048·k at k× gives
  // the same shard COUNT as 2048 at 1× — instead of measuring k× more
  // file creations. The oracle SQL string interpolates the same val, so
  // hash parity holds under the override too (the driver runs unset).
  private val ShardBudget: Long =
    sys.env.get("GRAFT_SHARD_BUDGET").map(_.toLong).getOrElse(2048L)
  private val PrefixBucket = 500L // doc_id bucket width for the 2-phase scan

  def shardWriter(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TF.tokenCount(col("text")).cast("long").as("n_tokens"))
    val sharded = graft.operators.Prefix
      .runningSum(docs, col("doc_id"), col("n_tokens"), PrefixBucket)
      .withColumn("shard", expr(s"(running - n_tokens) div $ShardBudget"))
    val out = tempDir("graft_s28_shards_")
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out)
    s.read.parquet(out)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"),
           min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard")
  }

  val shardWriterSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |r AS (
       |  SELECT *, sum(n_tokens) OVER (ORDER BY doc_id
       |            ROWS UNBOUNDED PRECEDING) AS running FROM t),
       |sh AS (SELECT *, (running - n_tokens) // $ShardBudget AS shard FROM r)
       |SELECT CAST(shard AS BIGINT) AS shard,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM sh GROUP BY shard ORDER BY shard""".stripMargin

  // ---------------------------------------------------------------------
  // s15 — z-order clustered warehouse (O5): round-trip through the
  // Morton-interleaved layout, read back under a user point-lookup set +
  // time-range predicate — the two-dimensional skipping case a ts-only
  // sort cannot serve. Content parity is the oracle; the file-locality
  // claims are measured in StoreSpec.
  // ---------------------------------------------------------------------
  def storeZorder(s: SparkSession, dir: String): DataFrame = {
    val wh = tempDir("graft_s15_wh_")
    EventStore.zorderWrite(Tables.clicks(s, dir), wh)
    EventStore.read(s, wh)
      .filter(col("user_id") % 100 === 0 &&
        col("ts") >= to_timestamp(lit("2024-01-10 00:00:00")))
      .groupBy(col("page"))
      .agg(count("*").as("events"),
           count_distinct(col("user_id")).as("unique_users"),
           unix_millis(min(col("ts"))).as("first_ms"),
           unix_millis(max(col("ts"))).as("last_ms"))
      .orderBy("page")
  }

  val storeZorderSql: String =
    s"""WITH clicks AS (${Tables.clicksSql})
       |SELECT page, COUNT(*) AS events, COUNT(DISTINCT user_id) AS unique_users,
       |       epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS first_ms,
       |       epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS last_ms
       |FROM clicks
       |WHERE user_id % 100 = 0
       |  AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
       |GROUP BY page ORDER BY page""".stripMargin

  // ---------------------------------------------------------------------
  // s16 — idempotent incremental ingest (O6): warehouse holds days 1–20,
  // the next extract replays days 18–20 and adds 21+; ingest appends only
  // the new event_ids (partition-pruned anti-join), a second run appends
  // nothing, and the final content equals the exactly-once relation.
  // ---------------------------------------------------------------------
  def storeIncremental(s: SparkSession, dir: String): DataFrame = {
    val wh = tempDir("graft_s16_wh_")
    val clicks = Tables.clicks(s, dir)
    val cut = to_timestamp(lit("2024-01-21 00:00:00"))
    val overlap = to_timestamp(lit("2024-01-18 00:00:00"))
    EventStore.write(clicks.filter(col("ts") < cut), wh,
      grain = EventStore.DayGrain)
    val batch = clicks.filter(col("ts") >= overlap)
    EventStore.ingestIncrement(s, wh, batch, EventStore.DayGrain)
    val second = EventStore.ingestIncrement(s, wh, batch, EventStore.DayGrain)
    require(second == 0L, s"re-ingest appended $second rows — not idempotent")
    EventStore.read(s, wh)
      .groupBy(col("page"))
      .agg(count("*").as("events"),
           count_distinct(col("event_id")).as("unique_events"),
           unix_millis(min(col("ts"))).as("first_ms"),
           unix_millis(max(col("ts"))).as("last_ms"))
      .orderBy("page")
  }

  val storeIncrementalSql: String =
    s"""WITH clicks AS (${Tables.clicksSql})
       |SELECT page, COUNT(*) AS events, COUNT(DISTINCT event_id) AS unique_events,
       |       epoch_ms(MIN(CAST(ts AS TIMESTAMP))) AS first_ms,
       |       epoch_ms(MAX(CAST(ts AS TIMESTAMP))) AS last_ms
       |FROM clicks GROUP BY page ORDER BY page""".stripMargin

  // ---------------------------------------------------------------------
  // s21 — BUCKETED co-located join: fact and dimension both written as
  // bucketed tables on user_id (same bucket count), so the join AND the
  // per-user aggregation read pre-partitioned buckets and plan with NO
  // hash exchange — the "bucketing for co-located joins" scale tool.
  // At 100 TB this is the difference between re-shuffling the fact table
  // on every join and shuffling it once at write time; the plan guard
  // in PlanSpec pins the no-exchange property.
  // ---------------------------------------------------------------------
  private val S21Buckets = 8

  /** The bucketed join, factored so the entry and the plan spec share
    * one definition. Returns the aggregated result BEFORE the final
    * orderBy (whose range exchange is presentation, not data motion). */
  def bucketedJoinPlan(s: SparkSession, dir: String): DataFrame = {
    val wh = tempDir("graft_s21_wh_")
    // table names derive from the (unique) temp path: two invocations in
    // one shared session never rewrite each other's catalog entries, and
    // the returned (lazy) frame keeps resolving against ITS tables
    val tag = new java.io.File(wh).getName.replaceAll("[^A-Za-z0-9_]", "_")
    val evTbl  = s"${tag}_ev"
    val dimTbl = s"${tag}_dim"
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value"),
        expr("unix_micros(ts) DIV 86400000000").as("day_idx"))
    val dim = ev.groupBy("user_id").agg(min("day_idx").as("first_day"))
    ev.write.mode("overwrite").option("path", s"$wh/ev")
      .bucketBy(S21Buckets, "user_id").sortBy("user_id")
      .saveAsTable(evTbl)
    dim.write.mode("overwrite").option("path", s"$wh/dim")
      .bucketBy(S21Buckets, "user_id").sortBy("user_id")
      .saveAsTable(dimTbl)
    s.table(evTbl).join(s.table(dimTbl), "user_id")
      .groupBy(col("user_id"), col("first_day"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 6).as("total_value"))
  }

  def storeBucketed(s: SparkSession, dir: String): DataFrame =
    bucketedJoinPlan(s, dir).orderBy("user_id")

  val storeBucketedSql: String =
    """WITH d AS (
      |  SELECT user_id,
      |         MIN(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS first_day
      |  FROM events GROUP BY 1)
      |SELECT e.user_id, d.first_day, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       round(SUM(e."value"), 6) AS total_value
      |FROM events e JOIN d ON e.user_id = d.user_id
      |GROUP BY 1, 2 ORDER BY e.user_id""".stripMargin

  // ---------------------------------------------------------------------
  // s22 — multi-format storage round-trip: the same relation written to
  // ORC (columnar, codegen'd vectorized read like parquet) and CSV (the
  // interchange format), read back through each format's own reader, and
  // fingerprinted. Both fingerprints must equal the oracle's — a lossy
  // writer, a schema-drifting reader, or a type coercion bug in either
  // format fails the hash. Timestamps travel as epoch-micros longs so
  // the CSV path has no parser ambiguity (the CSV contract at scale:
  // explicit schema, no inference).
  // ---------------------------------------------------------------------
  def storeFormats(s: SparkSession, dir: String): DataFrame = {
    val work = tempDir("graft_s22_")
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"),
      expr("unix_micros(ts)").as("ts_us"), col("event_type"))
    ev.write.mode("overwrite").orc(s"$work/orc")
    ev.write.mode("overwrite").option("header", "true").csv(s"$work/csv")
    val csvSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType)))
    val readers = Seq(
      "csv" -> s.read.schema(csvSchema).option("header", "true").csv(s"$work/csv"),
      "orc" -> s.read.orc(s"$work/orc"))
    readers.map { case (fmt, df) =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(col("user_id")).as("sum_user_id"),
        count_distinct(col("event_type")).as("n_types"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"))
        .withColumn("format", lit(fmt))
    }.reduce(_ unionByName _)
      .select(col("format"), col("n_rows"), col("sum_user_id"),
              col("n_types"), col("min_ts_us"), col("max_ts_us"))
      .orderBy("format")
  }

  val storeFormatsSql: String =
    """WITH base AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |         CAST(SUM(user_id) AS BIGINT) AS sum_user_id,
      |         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      |         MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS min_ts_us,
      |         MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS max_ts_us
      |  FROM events)
      |SELECT f.format, b.n_rows, b.sum_user_id, b.n_types, b.min_ts_us, b.max_ts_us
      |FROM (VALUES ('csv'), ('orc')) f(format) CROSS JOIN base b
      |ORDER BY f.format""".stripMargin

  // ---------------------------------------------------------------------
  // s24 — incremental cross-run dedup against a durable fingerprint
  // store: history (src10–19) is ingested as fingerprints only, the
  // incoming batch (src0–9) is admitted with one left-anti semi-join
  // against the store, and the SAME batch replayed afterwards must admit
  // zero rows — the "dedup today's crawl against all history without
  // rescanning history" operator, with the cross-run property asserted
  // inside the entry itself.
  // ---------------------------------------------------------------------
  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val store = tempDir("graft_s24_fp_") + "/store"
    val docs = Tables.documents(s, dir)
    val srcNum = expr("CAST(substring(source, 4) AS INT)")
    FingerprintStore.ingest(docs.filter(srcNum >= 10), store)
    val survivors = FingerprintStore.dedupAgainst(s, store, docs.filter(srcNum < 10))
    val readmitted = FingerprintStore.dedupAgainst(s, store, docs.filter(srcNum < 10)).count()
    require(readmitted == 0,
      s"replayed batch re-admitted $readmitted rows — store is not durable")
    survivors.select(col("doc_id"), col("source"), col("fp")).orderBy("doc_id")
  }

  val incrementalDedupSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, md5(${ExtendedQueries.normalizedSql}) AS fp
       |  FROM documents
       |), hist AS (
       |  SELECT DISTINCT fp FROM d WHERE CAST(substring(source, 4) AS INT) >= 10
       |), batch AS (
       |  SELECT * FROM d WHERE CAST(substring(source, 4) AS INT) < 10
       |), first AS (
       |  SELECT fp, MIN(doc_id) AS doc_id FROM batch GROUP BY 1)
       |SELECT b.doc_id, b.source, b.fp
       |FROM batch b JOIN first f ON b.doc_id = f.doc_id AND b.fp = f.fp
       |WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = b.fp)
       |ORDER BY b.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // m04 — the maintenance window: TTL + compaction over an event
  // warehouse, retention over a durable metrics series, and the
  // fingerprint-store distinct rewrite, composed into the ONE
  // schedulable job a deployment would cron (the reference gets the
  // equivalents for free from ClickHouse merge threads + TTL and
  // Prometheus retention; here they are explicit, observable
  // operators). Every step does real work in this entry: the warehouse
  // write leaves multi-file day partitions (compaction input) with
  // partitions past the 15-day cutoff (TTL input), the metrics series
  // has one run inside and one outside its window, and the fingerprint
  // store has two appended batches. Values are file/partition counts ⇒
  // rows-only driver check; the idempotency contract (second run
  // reports zero drops/rewrites) is spec-asserted in StoreSpec.
  // ---------------------------------------------------------------------
  def maintenanceQ(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.PipelineMetrics
    val asOf = java.sql.Timestamp.valueOf(Tables.AsOf)
    val wh = tempDir("graft_m04_wh_")
    EventStore.write(Tables.clicks(s, dir), wh, grain = EventStore.DayGrain)

    val md = tempDir("graft_m04_md_") + "/metrics"
    def batch(daysAgo: Int) = PipelineMetrics.BatchMetric(
      query_id = "maint-fixture", batch_id = daysAgo.toLong,
      input_rows = 1000L, batch_duration_ms = 250L,
      input_rows_per_sec = 4000.0, processed_rows_per_sec = 4000.0,
      watermark_ms = Some(asOf.getTime - daysAgo * 86400000L - 5000L),
      state_rows = 0L,
      wall_time_ms = asOf.getTime - daysAgo * 86400000L)
    PipelineMetrics.persistRun(s, Seq(batch(2)), md, "run-fresh")
    PipelineMetrics.persistRun(s, Seq(batch(40)), md, "run-stale")

    val fp = tempDir("graft_m04_fp_") + "/store"
    val docs = Tables.documents(s, dir)
    FingerprintStore.dedupAgainst(s, fp, docs.filter(col("doc_id") < 250)).count()
    FingerprintStore.dedupAgainst(s, fp, docs).count()

    graft.store.Maintenance.run(s, wh, EventStore.DayGrain, asOf,
      retainDays = 15, metricsDir = Some(md), metricsRetainDays = 7,
      fpStore = Some(fp))
      .orderBy("component", "action")
  }

  val all: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] = Seq(
    "s04_store_partitioned" -> ((storePartitioned _, Some(storePartitionedSql))),
    "s05_store_retention"   -> ((storeRetention _, Some(storeRetentionSql))),
    "s10_store_compaction"  -> ((storeCompaction _, Some(storeCompactionSql))),
    "s15_store_zorder"      -> ((storeZorder _, Some(storeZorderSql))),
    "s16_store_incremental" -> ((storeIncremental _, Some(storeIncrementalSql))),
    "s21_store_bucketed"    -> ((storeBucketed _, Some(storeBucketedSql))),
    "s22_store_formats"     -> ((storeFormats _, Some(storeFormatsSql))),
    "s24_incremental_dedup" -> ((incrementalDedup _, Some(incrementalDedupSql))),
    "s27_scd2_merge"        -> ((scd2Merge _, Some(scd2MergeSql))),
    "s28_shard_writer"      -> ((shardWriter _, Some(shardWriterSql))),
    "m04_maintenance"       -> ((maintenanceQ _, None)),
    "x31_salted_join"       -> ((saltedJoin _, Some(saltedJoinSql))),
    "x39_hll_rollup"        -> ((hllRollup _, None)),
    "x75_kmv_overlap"       -> ((kmvOverlap _, Some(kmvOverlapSql))),
    "g01_generator_stats"   -> ((generatorStats _, None)),
    "g02_generator_pipeline" -> ((generatorPipeline _, None)),
  )
}
