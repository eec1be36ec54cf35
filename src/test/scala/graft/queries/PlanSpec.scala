package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFunctions

/** Physical-plan regression guards: the properties that make these plans
  * scale-safe must survive refactors. String-level assertions on
  * `executedPlan` — deliberately coarse (exact operator counts are
  * AQE/version-dependent; the presence/absence of a join strategy is not). */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("j01: lineitem date filter is pushed to the parquet scan") {
    val p = plan(TpchQueries.pricingSummary(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("j02: all dimension joins broadcast; no sort-merge, no cartesian") {
    val p = plan(TpchQueries.revenueByNation(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to sort-merge")
    assert(!p.contains("CartesianProduct"), "cartesian product in star join")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"), p)
  }

  test("near-dup candidate generation never plans a cross join") {
    VectorFunctions.register(spark)
    val docs = graft.Tables.documents(spark, dir)
    val emb = graft.Tables.embeddings(spark, dir)
    Seq(
      "x06" -> plan(graft.operators.Dedup.minhashNearDups(docs)),
      "x07" -> plan(graft.operators.Dedup.simhashNearDups(docs)),
      "x14" -> plan(graft.operators.Dedup.embeddingNearDupsLsh(emb)),
      "x16" -> plan(graft.operators.Dedup.winnowingOverlaps(docs))
    ).foreach { case (name, p) =>
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested-loop join")
    }
  }

  test("j17 decorrelated scalar subquery: filtered part side broadcasts, per-part avg broadcasts back, no cartesian") {
    val p = plan(TpchQueries.smallQtyRevenue(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), "Q17 shape plans a cartesian")
    // the decorrelation contract: the avg never runs as a per-row
    // subquery loop — exactly the partial-agg'd HashAggregate pair
    assert(p.contains("HashAggregate"), p)
  }

  test("j18 nested semi-join chain: part filter broadcasts, supplier side is a semi join, no cartesian") {
    val p = plan(TpchQueries.volumeLeaders(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.toLowerCase.contains("leftsemi"), "supplier gate lost its semi-join shape")
    assert(!p.contains("CartesianProduct"), "Q20 shape plans a cartesian")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      "the 1996 date slice did not reach the lineitem scan")
  }

  test("j06 anti join: plans as a hash anti join, never cartesian") {
    val p = plan(TpchQueries.customersWithoutOrders(spark, dir))
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as a LeftAnti hash join: " + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("j07 outer-join distribution: two-phase aggregation, no cartesian") {
    val p = plan(TpchQueries.orderCountDistribution(spark, dir))
    assert(p.contains("LeftOuter"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q14: aggregation runs with map-side partial aggregation") {
    val p = plan(ReferenceQueries.q14(spark, dir))
    // two-phase exact distinct: partial HashAggregate before each exchange
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), "hash agg degraded to sort agg")
  }

  test("x17 connected components: every round is equi-join only") {
    val docs = graft.Tables.documents(spark, dir)
    val p = plan(graft.operators.Components.connectedComponents(
      graft.operators.Dedup.ngramJaccardPairs(docs, threshold = 0.5)))
    assert(!p.contains("CartesianProduct"), "CC plans a cartesian product")
    assert(!p.contains("BroadcastNestedLoopJoin"), "CC plans a nested-loop join")
  }

  test("x18 as-of enrichment keeps the no-join shape through the full entry") {
    val p = plan(ExtendedQueries.asofEnrichment(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "as-of degraded to a nested-loop range join")
  }

  test("x19 sessionization: one shuffle grain (user), hash aggregation") {
    val p = plan(ExtendedQueries.sessionization(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x21 quality rules: one fused scan, no join, no pre-sort shuffle") {
    val p = plan(CurationQueries.qualityFilter(spark, dir))
    assert(!p.contains("Join"), p)
    // column pruning reached the scan: only the 3 needed columns are read
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
      "scan reads more than doc_id/text/source: " + p)
    // the only exchange is the final presentation orderBy's range partition
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"expected at most the orderBy exchange, got $exchanges:\n$p")
  }

  test("x24 heavy hitters: map-side partial aggregation, hash not sort") {
    val p = plan(CurationQueries.heavyHitters(spark, dir))
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), "token count degraded to sort agg")
    assert(!p.contains("Join"), p)
  }

  test("x27 composed pipeline: filter + min_by agg — never a join or rank window") {
    val p = plan(CurationQueries.curationPipeline(spark, dir))
    assert(!p.contains("Join"), "the pipeline should dedup via min_by, not join: " + p)
    assert(!p.contains("CartesianProduct"), p)
    // keep-first must be the partial-aggregable min_by, not a rank
    // window that serializes each fingerprint group onto one task
    assert(!p.contains("Window"), "rank-window keep-first crept back in:\n" + p)
  }

  test("x29 rebalance: count relations broadcast, corpus never shuffle-joined") {
    val p = plan(CurationQueries.langRebalance(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "per-stratum counts were shuffle-joined: " + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x35 unigram scoring: no cartesian; scalar total broadcast; hash aggregation") {
    val p = plan(CurationQueries.unigramLogprob(spark, dir))
    // the 1-row total legitimately cross-joins as a BROADCAST nested loop;
    // what must never appear is an unbroadcast cartesian
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), "tf aggregation must be hash, not sort: " + p)
  }

  test("x36 vocab: global top-K is TakeOrdered, never a one-partition global sort") {
    val p = plan(CurationQueries.vocabCoverage(spark, dir))
    assert(p.contains("TakeOrderedAndProject"),
      "top-K must plan as TakeOrderedAndProject (distributed top-K): " + p)
  }

  test("x38 cross-corpus dedup: shingle blocking is an equi-join, no cartesian") {
    val p = plan(ExtendedQueries.crossCorpusDedup(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x63 capped cross-corpus: equi-join blocking, per-side window caps, no cartesian") {
    val p = plan(ExtendedQueries.crossCorpusCapped(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("x39 hll rollup: sketch aggregation is two-phase (partial before exchange)") {
    val p = plan(InfraQueries.hllRollup(spark, dir))
    assert(p.contains("partial_hll_sketch_agg") || p.contains("partial_hllsketchagg")
        || (p.contains("HllSketchAgg") && p.contains("Exchange")),
      "daily sketches must partial-aggregate map-side: " + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("j09: bin-bucketed range join plans as broadcast hash, never nested-loop") {
    val p = plan(TpchQueries.shipmentsInWindow(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join degraded to a nested loop: " + p)
  }

  test("j10: set ops stay hash-based on the distinct key sets, never cartesian") {
    val p = plan(TpchQueries.supplierSetOps(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the INTERSECT/EXCEPT inputs are pre-aggregated distinct key sets
    assert(p.contains("HashAggregate"), p)
  }

  test("j11: decorrelated nation-average threshold broadcasts; fact shuffled once") {
    val p = plan(TpchQueries.bigSpenders(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s21: bucketed co-located join plans with NO hash exchange") {
    val df = InfraQueries.bucketedJoinPlan(spark, dir)
    df.collect() // materialize through AQE so the final plan is real
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      "bucketed join/agg must not re-shuffle on the bucket key:\n" + p)
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      "scan is not reading buckets:\n" + p)
  }

  test("s34: per-batch bucketed snapshot-diff join plans with NO exchange (co-located SMJ)") {
    import graft.streaming.StreamingQueries
    import graft.functions.{TextFunctions => TF}
    import org.apache.spark.sql.functions.col
    // build the two sides through the PRODUCTION bucketed writer, then
    // pin the co-located shape under the no-broadcast protocol (at
    // 100 TB the corpus-sized old store never broadcasts — the plan
    // that matters is the sort-merge one)
    val work = java.nio.file.Files
      .createTempDirectory("graft_s34_plan_").toFile.getAbsolutePath
    val tag = new java.io.File(work).getName.replaceAll("[^A-Za-z0-9_]", "_")
    val docs = graft.Tables.documents(spark, dir)
    StreamingQueries.writeFpBucketed(
      docs.select(col("doc_id"), TF.fingerprint(col("text")).as("fp_old")),
      s"$work/oldfp", s"${tag}_oldfp")
    StreamingQueries.writeFpBucketed(
      docs.limit(50).select(col("doc_id"), TF.fingerprint(col("text")).as("fp_new")),
      s"$work/b0", s"${tag}_b0")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val df = StreamingQueries.bucketedDelta(spark, s"${tag}_b0", s"${tag}_oldfp")
      df.collect() // materialize through AQE so the final plan is real
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        "co-bucketed diff join must not re-shuffle either side:\n" + p)
      assert(p.contains("SortMergeJoin"), "expected the co-located SMJ:\n" + p)
      // note: LOCAL per-bucket sorts remain (Spark does not trust
      // file-level sortBy order across files) — they move no data;
      // the property that matters at 100 TB is zero exchange
      assert(p.contains("Bucketed: true"),
        "scan is not reading buckets:\n" + p)
      assert(p.contains("SelectedBucketsCount: 8 out of 8"),
        "both sides must read all co-located buckets:\n" + p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("s36: per-batch admission joins read both store tables in place — only batch-sized exchanges") {
    import graft.streaming.StreamingQueries
    import graft.functions.TextKernels.word_shingles
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{array_distinct, col, count, explode, lit}
    // both store tables through the PRODUCTION bucketed writer, then
    // pin the shape under the no-broadcast protocol (at 100 TB the
    // reference store never broadcasts): the ONLY exchanges allowed in
    // the per-batch plan are the two batch-sized stream-side ones — a
    // third would mean a store table is being re-shuffled per batch
    val work = java.nio.file.Files
      .createTempDirectory("graft_s36_plan_").toFile.getAbsolutePath
    val tag = new java.io.File(work).getName.replaceAll("[^A-Za-z0-9_]", "_")
    val docs = graft.Tables.documents(spark, dir)
    val refShingles = docs.select(col("doc_id").as("id_ref"),
      array_distinct(word_shingles(col("text"), 3)).as("ref_sh"))
    StreamingQueries.writeBucketedBy(
      refShingles, s"$work/ref", s"${tag}_ref", "id_ref")
    StreamingQueries.writeBucketedBy(
      refShingles.select(col("id_ref"), explode(col("ref_sh")).as("sh"))
        .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("sh"))))
        .filter(col("__df") <= 4).select(col("sh"), col("id_ref")),
      s"$work/blk", s"${tag}_blk", "sh")
    val batch = docs.limit(20).select(col("doc_id").as("id_in"),
      array_distinct(word_shingles(col("text"), 3)).as("in_sh"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val df = StreamingQueries.bucketedNearDupDelta(
        spark, batch, s"${tag}_blk", s"${tag}_ref", threshold = 0.01)
      df.collect() // materialize through AQE so the final plan is real
      // AdaptiveSparkPlan.toString prints Final AND Initial plans —
      // count shapes in the FINAL section only
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val nExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(nExchanges <= 2,
        s"expected only the two batch-side exchanges, found $nExchanges:\n" + p)
      assert(p.contains("SortMergeJoin"), "expected co-located SMJs:\n" + p)
      assert(p.contains("Bucketed: true"), "scans are not reading buckets:\n" + p)
      val n = StreamingQueries.S36Buckets
      assert(s"SelectedBucketsCount: $n out of $n".r.findAllIn(p).length == 2,
        "both store tables must be read from all their buckets in place:\n" + p)
      // one file per bucket => the scans expose their sortBy ordering
      // and the SMJs must NOT re-sort the store sides per batch — only
      // the two batch-side sorts may remain
      assert("Sort \\[".r.findAllIn(p).length <= 2,
        "a store table is being re-sorted per micro-batch:\n" + p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS ${tag}_ref")
      spark.sql(s"DROP TABLE IF EXISTS ${tag}_blk")
    }
  }

  test("s37: the probe set prunes the cell-partitioned ANN store at PLAN time (static partition filters)") {
    import graft.operators.SimilaritySearch
    import org.apache.spark.sql.functions.col
    // the per-batch store read through the PRODUCTION layout: index
    // partitioned by cell, probe set as a literal IN — the partition
    // filter must reach the scan (this is what turns nProbe-locality
    // into scan-bytes pruning; the s36 shingle layout could never get
    // here because any batch blanketed its 31-value key space)
    val emb = graft.Tables.embeddings(spark, dir)
    val src = emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val cents = SimilaritySearch.collectFixedRows(src.filter(col("vec_id") < 8), 8)
    val work = java.nio.file.Files
      .createTempDirectory("graft_s37_plan_").toFile.getAbsolutePath
    val tag = new java.io.File(work).getName.replaceAll("[^A-Za-z0-9_]", "_")
    val tbl = s"${tag}_ivf"
    try {
      src.select(col("vec_id"), col("embedding"),
          SimilaritySearch.argmaxCell(col("embedding"), cents).as("cell"))
        .repartition(col("cell"))
        .write.mode("overwrite").option("path", s"$work/wh/ivf")
        .partitionBy("cell").saveAsTable(tbl)
      // both serve regimes: s37's narrow probe set and s41's amplified
      // one — partition filters must reach the scan and still prune at
      // the wide width (6 of 8 cells), because the probe set is ≤
      // nLists by construction at ANY knob setting
      val widths = Seq(
        "s37" -> (0L until graft.operators.SimilaritySearch.IvfPqFixed.NProbe.toLong),
        "s41" -> (0L until graft.operators.SimilaritySearch.IvfPqFixed.NProbeWide.toLong))
      for ((regime, probed) <- widths) {
        val store = spark.table(tbl)
          .filter(col("cell").isin(probed.map(Long.box): _*))
        store.collect()
        val p = store.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert(p.contains("PartitionFilters: ["),
          s"$regime: store scan lost its partition filters:\n" + p)
        assert((" IN \\(" + probed.mkString(",") + "\\)").r.findFirstIn(p).isDefined,
          s"$regime: the probe-cell IN filter must reach the scan as a partition filter:\n" + p)
        // behavioral: the pruned read is exactly the probed cells' rows
        val full = spark.table(tbl)
        val expect = full.collect().count(r => probed.contains(r.getAs[Long]("cell")))
        assert(store.count() == expect)
        assert(expect < full.count(),
          s"$regime: fixture degenerate: probing did not prune")
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("s47: the probe-cell IN prunes BOTH the code-store base and its live deltas below the union (static partition filters)") {
    import org.apache.spark.sql.functions.col
    import graft.streaming.StreamingQueries
    // the serve-time store read in the store's mixed state (compacted
    // base PLUS a live delta): the probe-cell literal IN must push
    // through the DeltaStore's unionByName to EVERY child scan — both
    // sides are cell-partitioned, so each becomes partition pruning
    val root = java.nio.file.Files
      .createTempDirectory("graft_s47_plan_").toString + "/codes"
    val st = StreamingQueries.pqCodeStore(spark, root, m = 2)
    import spark.implicits._
    def rows(ids: Range) = ids.map(i =>
      (i.toLong, i % 16, (i * 3) % 16, (i % 4).toLong))
      .toDF("vec_id", "code_0", "code_1", "cell")
    st.append(spark, 0L, rows(0 until 32))
    st.compact(spark)                      // → base
    st.append(spark, 1L, rows(32 until 48)) // → live delta
    val probed = Seq(0L, 2L)
    val read = st.read(spark)
      .filter(col("cell").isin(probed.map(Long.box): _*))
    read.collect()
    val p = read.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "PartitionFilters: \\[".r.findAllIn(p).size
    assert(scans == 2,
      s"expected partition filters on BOTH the base and delta scans, found $scans:\n$p")
    assert((" IN \\(" + probed.mkString(",") + "\\)").r
        .findAllIn(p).size == 2,
      s"the probe-cell IN must reach both scans as a partition filter:\n$p")
    // behavioral: exactly the probed cells' rows, from both layers
    assert(read.count() == (0 until 48).count(i => probed.contains((i % 4).toLong)))
  }

  test("s38: the batch's literal IN reaches the postings store scan — pushed filter AND bucket pruning") {
    import graft.streaming.StreamingQueries
    import org.apache.spark.sql.functions.{col, count, explode, lit, lower, regexp_extract_all, size}
    // the per-batch store read through the PRODUCTION bucketed-sorted
    // writer: a LITERAL token IN (unlike s36's runtime set-membership)
    // reaches the scan both as a parquet pushed filter (row-group
    // stats on the sortBy'd token column) and as BUCKET pruning on the
    // bucket column — the s36 boundary's escape route #2, pinned
    val docs = graft.Tables.documents(spark, dir)
    def toksCol = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val work = java.nio.file.Files
      .createTempDirectory("graft_s38_plan_").toFile.getAbsolutePath
    val tag = new java.io.File(work).getName.replaceAll("[^A-Za-z0-9_]", "_")
    val tbl = s"${tag}_tf"
    try {
      val tf = docs.select(col("doc_id"), toksCol.as("toks"))
        .select(col("doc_id"), size(col("toks")).as("dl"),
          explode(col("toks")).as("token"))
        .groupBy("doc_id", "token")
        .agg(count(lit(1)).as("tf"), org.apache.spark.sql.functions.max("dl").as("dl"))
      StreamingQueries.writeBucketedBy(tf, s"$work/tf", tbl, "token")
      def probePlan(): String = {
        val probe = spark.table(tbl)
          .filter(col("token").isin("the", "quick", "zebra"))
        probe.collect()
        probe.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
      }
      // (a) the literal IN reaches parquet as a pushed filter — this is
      // the row-group-stats path and works regardless of bucketing
      val p1 = probePlan()
      assert(p1.contains("PushedFilters: [In(token"),
        "the literal IN must reach parquet as a pushed filter:\n" + p1)
      // (b) when the planner keeps the bucketed scan (as it does in the
      // per-batch JOIN plan; a bare filter-only probe auto-disables it),
      // the same literal IN also prunes whole buckets
      val prevAuto = spark.conf
        .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      try {
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", false)
        val p2 = probePlan()
        val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p2)
        assert(sel.isDefined, "expected a bucketed scan:\n" + p2)
        assert(sel.get.group(1).toInt < sel.get.group(2).toInt,
          "a 3-term literal IN must prune buckets, not scan all of them:\n" + p2)
      } finally {
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("x103/x104: drift gauge partial-aggregates map-side; pipeline broadcasts its bounded keep set, no cartesian") {
    import graft.queries.CurationQueries
    // x103: the corpus must collapse to the vocabulary BEFORE the
    // exchange (map-side combine), and the totals side is a 1-row
    // broadcast — the only nested-loop join allowed is that broadcast
    val p103 = plan(CurationQueries.snapshotDriftQ(spark, dir))
    assert(p103.contains("HashAggregate"), p103)
    assert(p103.contains("BroadcastExchange"), "totals must broadcast: " + p103)
    assert(!p103.contains("CartesianProduct"), p103)
    // x104: the domain-cap keep set is bounded at sources×cap, so its
    // join back must broadcast; nothing in the composition may plan a
    // cartesian or a global (unpartitioned) sort window
    val df = CurationQueries.selectionPipelineQ(spark, dir)
    df.collect()
    val p104 = df.queryExecution.executedPlan.toString
    assert(p104.contains("BroadcastHashJoin"),
      "bounded keep-set join must broadcast: " + p104)
    assert(!p104.contains("CartesianProduct"), p104)
    assert(p104.contains("ObjectHashAggregate"),
      "domain cap must run through the bounded-heap aggregator: " + p104)
  }

  test("j14: decorrelated Q21 — no cartesian, supplier broadcast, top-20 TakeOrdered") {
    val p = plan(TpchQueries.waitingSuppliers(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), "supplier names must broadcast: " + p)
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must be TakeOrdered, not a global sort: " + p)
    // the EXISTS/NOT-EXISTS pair must be decorrelated: lineitem appears
    // in the plan as scans, never as a per-row rescan loop — coarse
    // proxy: hash aggregation present, no nested-loop join
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("s24: store admission is one left-anti semi-join, never a cartesian") {
    val store = java.nio.file.Files
      .createTempDirectory("graft_s24_plan_").toFile.getAbsolutePath + "/store"
    val docs = graft.Tables.documents(spark, dir)
    graft.store.FingerprintStore.ingest(docs.limit(50), store)
    val df = graft.store.FingerprintStore.dedupAgainst(spark, store, docs)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    // the returned frame must be the PINNED checkpoint (immune to the
    // fingerprint append), so its plan is an RDD scan, not a live join
    assert(p.contains("Scan ExistingRDD"),
      "survivors must answer from the pinned checkpoint:\n" + p)
    // the admission join itself (as dedupAgainst builds it, before the
    // pin) must be a left-anti semi-join against the store relation
    import org.apache.spark.sql.functions.col
    val admission = docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col("text")))
      .join(graft.store.FingerprintStore.known(spark, store), Seq("fp"), "left_anti")
    val ap = plan(admission)
    assert(ap.contains("LeftAnti"), ap)
    assert(!ap.contains("CartesianProduct"), ap)
  }

  test("x57 capped candidates: df cap is ONE window per join side, not a df-join") {
    val docs = graft.Tables.documents(spark, dir)
    val p = plan(graft.operators.Dedup.cappedCandidates(
      docs, "doc_id", "text", 3, 4))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), "df cap must be a window count: " + p)
    // plans are trees: each self-join side re-runs the shingle explode
    // once. The old groupBy+join formulation put FOUR word_shingles
    // generates in this plan (explode + df-agg per side); the window
    // formulation must keep it at two.
    val shingleScans = p.linesIterator.count(_.contains("word_shingles"))
    assert(shingleScans <= 2,
      s"candidate generation re-scans shingles $shingleScans times (expected 2):\n$p")
  }

  test("j12: the moving-average frame runs over the pre-aggregated daily relation") {
    val df = TpchQueries.dailyMovingAvg(spark, dir)
    val p = plan(df)
    assert(p.contains("Window"), p)
    // partial aggregation below the window: the corpus collapses to
    // (type, day) BEFORE any window state is built
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.indexOf("Window") < optimized.indexOf("Aggregate"),
      "window must sit above the daily aggregate, not over raw events:\n" + optimized)
  }

  test("x71 bm25: query/df/stats tables broadcast; corpus never cartesian- or sort-merge-joined") {
    val p = plan(graft.operators.Curation.bm25TopK(
      graft.Tables.documents(spark, dir)))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "retrieval degraded to sort-merge:\n" + p)
    assert(!p.contains("CartesianProduct"), "cartesian in retrieval:\n" + p)
    // the scalar stats relation arrives via a broadcast nested loop (1 row)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("j15 pivot: explicit values — no extra distinct-scan job, partial aggregation intact") {
    val df = TpchQueries.revenuePivot(spark, dir)
    val p = plan(df)
    // explicit pivot values compile to a plain two-phase aggregate:
    // partial_ aggregation present, and no second scan of lineitem for
    // value discovery (exactly one lineitem scan in the plan)
    assert(p.contains("partial_"), p)
    assert("lineitem\\.parquet".r.findAllIn(p).size <= 1,
      "pivot planned a second fact-table scan (value discovery?):\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("x72 ema: the range self-join runs on the aggregated series, not raw events") {
    val df = ExtendedQueries.emaSeries(spark, dir)
    val optimized = df.queryExecution.optimizedPlan.toString
    // between the join node and EVERY raw parquet scan there must be an
    // Aggregate (the minute series) — a raw-events self-join regression
    // would put a Relation directly under the Join
    val joinIdx = optimized.indexOf("Join Inner")
    assert(joinIdx >= 0, optimized)
    var cursor = joinIdx
    var scans = 0
    while (optimized.indexOf("Relation [", cursor) >= 0) {
      val rel = optimized.indexOf("Relation [", cursor)
      val between = optimized.substring(cursor, rel)
      assert(between.contains("Aggregate"),
        "raw scan directly under the self-join (no series aggregation):\n" + optimized)
      cursor = rel + 1
      scans += 1
    }
    assert(scans == 2, s"expected the two series-side scans, saw $scans:\n" + optimized)
  }
}
