package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Invariants for the curation operators (x20–x25). The SQL-expressible
  * entries are also hash-checked against DuckDB by the driver; these
  * specs pin the semantic contracts the hash can't state (ratios,
  * capacity bounds, determinism, idempotence). */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs = Tables.documents(spark, TestSpark.Sf0001)

  test("x20 split: total partition, ~80/10/10, content-stable") {
    val split = Curation.withSplit(docs, col("doc_id")).cache()
    val n = split.count()
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == n, "split is not a partition of the corpus")
    assert(bySplit("train").toDouble / n > 0.65 && bySplit("train").toDouble / n < 0.92)
    assert(bySplit.getOrElse("val", 0L) > 0 && bySplit.getOrElse("test", 0L) > 0)
    // content-stable: assignment depends only on the id, so a subset of
    // the corpus gets the identical assignment (growing data never
    // reshuffles an existing id's split)
    val sub = Curation.withSplit(docs.filter(col("doc_id") % 3 === 0), col("doc_id"))
    val joined = split.select(col("doc_id"), col("split").as("full"))
      .join(sub.select(col("doc_id"), col("split").as("part")), "doc_id")
    assert(joined.filter(col("full") =!= col("part")).count() == 0)
    split.unpersist()
  }

  test("x21 quality rules: keep is the conjunction; filter is non-degenerate") {
    val r = Curation.qualityRules(docs).cache()
    val broken = r.filter(col("keep") =!=
      (col("rule_words") && col("rule_word_len") && col("rule_alnum") && col("rule_stopwords")))
    assert(broken.count() == 0)
    val kept = r.filter(col("keep")).count()
    assert(kept > 0 && kept < r.count(), s"degenerate filter: kept $kept of ${r.count()}")
    r.unpersist()
  }

  test("x22 pii scrub: every pattern found and fully redacted") {
    val aug = docs.withColumn("aug",
      concat(col("text"), lit(" mail a@b.io ip 10.0.0.1 call +1 555-014-7777 end")))
    val out = Curation.scrubPii(aug, col("aug")).cache()
    assert(out.filter(col("n_emails") < 1 || col("n_ips") < 1 || col("n_phones") < 1).count() == 0)
    // nothing sensitive survives the scrub
    val leak = out.filter(
      regexp_count(col("scrubbed"), lit(Curation.EmailPat)) > 0 ||
      regexp_count(col("scrubbed"), lit(Curation.Ipv4Pat)) > 0 ||
      regexp_count(col("scrubbed"), lit(Curation.PhonePat)) > 0)
    assert(leak.count() == 0)
    assert(out.filter(!col("scrubbed").contains(Curation.EmailToken)).count() == 0)
    out.unpersist()
  }

  test("x23 chunk packing conserves tokens and numbers packs contiguously") {
    val packs = Curation.packChunks(docs).cache()
    val total = packs.agg(sum("pack_tokens")).head.getLong(0)
    val expected = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(total == expected, "packing lost or duplicated tokens")
    // pack ids are 0..max contiguous within each source
    val gaps = packs.groupBy("source")
      .agg(min("pack_id").as("lo"), max("pack_id").as("hi"), count(lit(1)).as("n"))
      .filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
    assert(gaps.count() == 0, "pack ids not contiguous from 0")
    packs.unpersist()
  }

  test("x25 greedy pack: capacity bound, exactly-once, deterministic") {
    val cap = 64
    val packed = Curation.greedyPack(docs, cap).cache()
    assert(packed.count() == docs.count(), "a doc was lost or duplicated")
    assert(packed.select("doc_id").distinct().count() == docs.count())
    // every pack fits unless it is a single oversized doc
    val over = Curation.greedyPack(docs, cap)
      .groupBy("source", "pack_id")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
      .filter(col("tok") > cap && col("n") > 1)
    assert(over.count() == 0, "a multi-doc pack exceeds capacity")
    // deterministic across runs
    val again = Curation.greedyPack(docs, cap)
    assert(packed.except(again).count() == 0 && again.except(packed).count() == 0)
    packed.unpersist()
  }

  test("x83 split leakage: exactly the cross-split near-dup pairs, planted + recomputed") {
    import spark.implicits._
    import graft.queries.ExtendedQueries
    // find ids on both sides of the split boundary with the same pure
    // function the operator applies — the test must not hardcode md5s
    val splits = (0L until 64L).toDF("id")
      .withColumn("split", Curation.splitOf(col("id")))
      .as[(Long, String)].collect().toMap
    val train = splits.collect { case (i, "train") => i }.toSeq.sorted
    val eval = splits.collect { case (i, s) if s != "train" => i }.toSeq.sorted
    assert(train.size >= 3 && eval.nonEmpty, s"fixture moot: $splits")
    val dup1 = "q w e r t y u i o p a s d f g h"
    val dup2 = "z x c v b n m k j h g f d s a q2"
    val dir = java.nio.file.Files.createTempDirectory("graft_x83_").toString
    (Seq(
      (train.head, dup1), (eval.head, dup1),   // identical, CROSS-split
      (train(1), dup2), (train(2), dup2)        // identical, SAME split
    ) ++ (0 until 8).map(i => (200L + i, s"filler$i only one trigram w$i x$i y$i z$i")))
      .toDF("doc_id", "text").withColumn("source", lit("src0"))
      .write.parquet(s"$dir/documents.parquet")
    val out = ExtendedQueries.splitLeakage(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((math.min(train.head, eval.head), math.max(train.head, eval.head))),
      s"planted cross-split near-dup not reported: $out")
    assert(!out.contains((train(1), train(2))),
      s"same-split pair wrongly reported as leakage: $out")
    // and on the real corpus the entry equals an independent
    // recomputation: capped pairs, split labels via withSplit, filtered
    val pairs = Dedup.ngramJaccardPairsCapped(docs, n = 3, threshold = 0.5, maxDf = 3)
    val lab = Curation.withSplit(docs, col("doc_id")).select(col("doc_id"), col("split"))
    val expected = pairs
      .join(lab.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa"), "id_a")
      .join(lab.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb"), "id_b")
      .filter(col("sa") =!= col("sb"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val entry = ExtendedQueries.splitLeakage(spark, TestSpark.Sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(entry == expected, s"entry $entry != recomputation $expected")
  }

  test("x97 leakage quarantine: non-train members of crossings quarantined; train never") {
    import spark.implicits._
    import graft.queries.ExtendedQueries
    val splits = (0L until 64L).toDF("id")
      .withColumn("split", Curation.splitOf(col("id")))
      .as[(Long, String)].collect().toMap
    val train = splits.collect { case (i, "train") => i }.toSeq.sorted
    val eval = splits.collect { case (i, s) if s != "train" => i }.toSeq.sorted
    assert(train.size >= 3 && eval.size >= 2, s"fixture moot: $splits")
    val dup1 = "q w e r t y u i o p a s d f g h"
    val dup2 = "z x c v b n m k j h g f d s a q2"
    val dir = java.nio.file.Files.createTempDirectory("graft_x97_").toString
    (Seq(
      (train.head, dup1), (eval.head, dup1),   // cross-split: eval.head quarantined
      (train(1), dup2), (train(2), dup2)        // same-split train pair: nobody quarantined
    ) ++ (0 until 8).map(i => (200L + i, s"filler$i only one trigram w$i x$i y$i z$i")))
      .toDF("doc_id", "text").withColumn("source", lit("src0"))
      .write.parquet(s"$dir/documents.parquet")
    val q = ExtendedQueries.leakageQuarantine(spark, dir)
      .as[(Long, String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(q.keySet == Set(eval.head), s"got ${q.keySet}")      // only the eval twin
    val (_, split, n, j) = q(eval.head)
    assert(split == splits(eval.head) && n == 1L && j == 1.0)
    // rule invariants on the real corpus: every quarantined doc is
    // non-train AND appears in the x83 crossing relation
    val crossings = ExtendedQueries.splitLeakage(spark, TestSpark.Sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    val onCorpus = ExtendedQueries.leakageQuarantine(spark, TestSpark.Sf0001)
      .as[(Long, String, Long, Double)].collect()
    assert(onCorpus.forall(r => r._2 != "train"))
    assert(onCorpus.forall(r => crossings.contains(r._1)))
    val expectedIds = crossings.toSeq.toDF("doc_id")
      .withColumn("split", Curation.splitOf(col("doc_id")))
      .filter(col("split") =!= "train")
      .select("doc_id").as[Long].collect().toSet
    assert(onCorpus.map(_._1).toSet == expectedIds,
      s"quarantine set ${onCorpus.map(_._1).toSet} != expected $expectedIds")
  }

  test("x84 semantic split leakage: planted cross/same-split twins + recomputation") {
    import spark.implicits._
    import graft.queries.ExtendedQueries
    val splits = (0L until 64L).toDF("id")
      .withColumn("split", Curation.splitOf(col("id")))
      .as[(Long, String)].collect().toMap
    val train = splits.collect { case (i, "train") => i }.toSeq.sorted
    val eval = splits.collect { case (i, s) if s != "train" => i }.toSeq.sorted
    assert(train.size >= 3 && eval.nonEmpty)
    // identical vectors → cosine exactly 1; the filler vectors are
    // axis-orthogonal to everything else (cosine 0 < threshold)
    def vec(axis: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == axis) 1.0f else 0.0f)
    val dir = java.nio.file.Files.createTempDirectory("graft_x84_").toString
    (Seq(
      (train.head, vec(0)), (eval.head, vec(0)), // CROSS-split twin
      (train(1), vec(1)), (train(2), vec(1))     // SAME-split twin
    ) ++ (2 until 8).map(a => (300L + a, vec(a))))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.parquet(s"$dir/embeddings.parquet")
    val out = ExtendedQueries.semanticSplitLeakage(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((math.min(train.head, eval.head), math.max(train.head, eval.head))),
      s"expected exactly the planted cross-split twin: $out")
    // real fixture: entry == independent recomputation via withSplit
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val lab = Curation.withSplit(emb, col("vec_id")).select(col("vec_id"), col("split"))
    val expected = Dedup.embeddingNearDups(emb, threshold = 0.3)
      .join(lab.withColumnRenamed("vec_id", "id_a").withColumnRenamed("split", "sa"), "id_a")
      .join(lab.withColumnRenamed("vec_id", "id_b").withColumnRenamed("split", "sb"), "id_b")
      .filter(col("sa") =!= col("sb"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val entry = ExtendedQueries.semanticSplitLeakage(spark, TestSpark.Sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(entry == expected && entry.nonEmpty,
      s"entry (${entry.size}) != recomputation (${expected.size})")
  }

  test("x85 LSH split leakage: planted twin found; equals x84 restricted to co-bucketed pairs") {
    import spark.implicits._
    import graft.queries.ExtendedQueries
    val splits = (0L until 64L).toDF("id")
      .withColumn("split", Curation.splitOf(col("id")))
      .as[(Long, String)].collect().toMap
    val train = splits.collect { case (i, "train") => i }.toSeq.sorted
    val eval = splits.collect { case (i, s) if s != "train" => i }.toSeq.sorted
    assert(train.size >= 3 && eval.nonEmpty)
    // identical vectors hash to the same bucket in EVERY table, so the
    // planted cross-split twin is found with probability 1 despite LSH
    def vec(axis: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == axis) 1.0f else 0.0f)
    val dir = java.nio.file.Files.createTempDirectory("graft_x85_").toString
    (Seq(
      (train.head, vec(0)), (eval.head, vec(0)), // CROSS-split twin
      (train(1), vec(1)), (train(2), vec(1))     // SAME-split twin
    ) ++ (2 until 8).map(a => (300L + a, vec(a))))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
      .write.parquet(s"$dir/embeddings.parquet")
    val planted = ExtendedQueries.semanticSplitLeakageLsh(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(planted == Set((math.min(train.head, eval.head), math.max(train.head, eval.head))),
      s"expected exactly the planted cross-split twin: $planted")

    // real fixture: (1) precision 1.0 — every x85 pair is an x84 pair;
    // (2) recall is EXACTLY the bucketing — every exact crossing whose
    // members share a (tbl, bucket) cell is found, none silently lost
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val exact = ExtendedQueries.semanticSplitLeakage(spark, TestSpark.Sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = ExtendedQueries.semanticSplitLeakageLsh(spark, TestSpark.Sf0001)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"precision < 1: ${lsh.diff(exact)}")
    val coBucketed = {
      val b = SimilaritySearch.bucketize(
        emb.select(col("vec_id").as("id"), col("embedding").as("v")),
        "v", dim = 64, planes = 4, tables = 8, seed = 42L)
      b.as("x").join(b.as("y"),
          col("x.tbl") === col("y.tbl") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .distinct().as[(Long, Long)].collect().toSet
    }
    assert(lsh == exact.intersect(coBucketed),
      s"entry != exact-restricted-to-co-bucketed: missing ${exact.intersect(coBucketed).diff(lsh)}")
    assert(lsh.nonEmpty, "vacuous: no co-bucketed crossing on the fixture")
  }

  test("x115 probed split leakage: probes=0 equals x85; probing is monotone and precise") {
    import spark.implicits._
    import graft.queries.ExtendedQueries
    graft.functions.VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val evalSide = emb.filter(Curation.splitOf(col("vec_id")) =!= "train")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    def probed(p: Int): Set[(Long, Long)] = pairs(
      Dedup.embeddingNearDupsLshMultiProbe(emb, evalSide,
          threshold = 0.3, probes = p)
        .withColumn("sa", Curation.splitOf(col("id_a")))
        .withColumn("sb", Curation.splitOf(col("id_b")))
        .filter(col("sa") =!= col("sb")))
    // algebraic reduction: base-bucket-only asymmetric generation over
    // cross-split pairs IS x85 (every cross-split pair has an eval member)
    val x85 = pairs(ExtendedQueries.semanticSplitLeakageLsh(spark, TestSpark.Sf0001))
    assert(probed(0) == x85)
    // probing only ADDS keys: monotone in probes; and precision stays 1.0
    // (every emitted pair is cosine-verified against the exact x84 set)
    val two = pairs(ExtendedQueries.semanticSplitLeakageProbed(spark, TestSpark.Sf0001))
    assert(x85.subsetOf(two), s"probing lost pairs: ${x85.diff(two)}")
    val exact = pairs(ExtendedQueries.semanticSplitLeakage(spark, TestSpark.Sf0001))
    assert(two.subsetOf(exact), s"precision < 1: ${two.diff(exact)}")
    assert(exact.nonEmpty && x85.nonEmpty, "vacuous fixture")
  }

  test("x26 contamination: only train docs, every hit shares a real n-gram") {
    val out = Curation.contamination(docs).cache()
    assert(out.count() > 0, "vacuous: no contaminated docs in the fixture")
    assert(out.filter(col("doc_id") % Curation.BenchMod === 0).count() == 0,
      "a benchmark doc reported as contaminated")
    assert(out.filter(col("n_shared_grams") < 1 || col("n_bench_docs") < 1).count() == 0)
    // broadcast of the bench side, never a shuffle of the corpus by pair
    val p = Curation.contamination(docs).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    out.unpersist()
  }

  test("x27 composed pipeline: stats equal an independent recomputation") {
    val stats = Curation.curate(docs).cache()
    val expectedDocs = docs.filter(Curation.keepRule(col("text")))
      .select(graft.functions.TextFunctions.fingerprint(col("text")))
      .distinct().count()
    assert(stats.agg(sum("n_docs")).head.getLong(0) == expectedDocs,
      "pipeline doc count != keep-filtered distinct-fingerprint count")
    val splits = stats.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
    stats.unpersist()
  }

  // independent reference: the interpreted HOF composition the codegen'd
  // kernels replaced (TF.shingles is itself kernel-backed now, so the
  // reference must be built inline to stay independent)
  private def hofShingles(t: org.apache.spark.sql.Column, n: Int) = {
    val toks = graft.functions.TextFunctions.tokens(t)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  test("distinct_ngram_count kernel == the HOF shingle composition, every doc") {
    import graft.functions.{TextFunctions => TF, TextKernels}
    TextKernels.register(spark)
    val t = col("text")
    val mism = docs.select(
        TextKernels.distinct_ngram_count(t, 1).as("k1"),
        size(array_distinct(TF.tokens(t))).cast("long").as("h1"),
        TextKernels.distinct_ngram_count(t, 2).as("k2"),
        size(hofShingles(t, 2)).cast("long").as("h2"),
        TextKernels.distinct_ngram_count(t, 3).as("k3"),
        size(hofShingles(t, 3)).cast("long").as("h3"))
      .filter(col("k1") =!= col("h1") || col("k2") =!= col("h2") || col("k3") =!= col("h3"))
    assert(mism.count() == 0)
  }

  test("word_shingles kernel == the HOF shingle composition, arrays, every doc") {
    import graft.functions.{TextFunctions => TF}
    val t = col("text")
    val mism = docs.select(
        TF.shingles(t, 1).as("k1"), array_distinct(TF.tokens(t)).as("h1"),
        TF.shingles(t, 2).as("k2"), hofShingles(t, 2).as("h2"),
        TF.shingles(t, 3).as("k3"), hofShingles(t, 3).as("h3"))
      .filter(col("k1") =!= col("h1") || col("k2") =!= col("h2") || col("k3") =!= col("h3"))
    assert(mism.count() == 0)
  }

  test("x35 unigram xent: common-token text scores lower than rare-token text") {
    val scored = Curation.unigramScore(docs).cache()
    assert(scored.count() == docs.filter(
      regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)) =!=
        array().cast("array<string>")).count())
    assert(scored.filter(col("xent") <= 0).count() == 0, "cross-entropy must be positive")
    // a synthetic doc of the corpus's top tokens must score below one
    // made of its rarest (hapax) tokens
    val vocab = Curation.vocabCoverage(docs, 5).select("token").collect().map(_.getString(0))
    import spark.implicits._
    val probe = Seq((900001L, vocab.mkString(" ")),
                    (900002L, "zqxv wvv qqj xxkz vvqx")).toDF("doc_id", "text")
    val both = Curation.unigramScore(docs.select(col("doc_id"), col("text"))
        .unionAll(probe))
      .filter(col("doc_id") >= 900001L)
      .orderBy("doc_id").collect()
    assert(both(0).getDouble(2) < both(1).getDouble(2),
      s"common-token doc ${both(0).getDouble(2)} should score below rare-token doc ${both(1).getDouble(2)}")
    scored.unpersist()
  }

  test("x41 datacard: one row per source, totals partition the corpus, modal lang dominates") {
    val card = Curation.datacard(docs).collect()
    val nSources = docs.select("source").distinct().count()
    assert(card.length == nSources)
    assert(card.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // modal language: its count within the source must be the max
    val langCounts = docs.groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    card.foreach { r =>
      val (src, modal) = (r.getAs[String]("source"), r.getAs[String]("modal_lang"))
      val counts = langCounts.collect { case ((s, l), c) if s == src => (l, c) }
      val byLang = counts.toMap
      assert(byLang(modal) == counts.map(_._2).max, s"$src modal $modal not dominant")
    }
  }

  test("x42 token budget: per-source prefix in id order, budget respected, strata non-empty") {
    val kept = Curation.tokenBudgetSample(docs).collect()
    val bySource = kept.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet == docs.select("source").distinct().collect()
      .map(_.getString(0)).toSet, "a non-empty stratum vanished")
    bySource.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      // kept set is exactly the doc_id-order prefix of the stratum
      val stratumIds = docs.filter(col("source") === src)
        .orderBy("doc_id").select("doc_id").collect().map(_.getLong(0))
      assert(sorted.map(_.getAs[Long]("doc_id")).toSeq ==
        stratumIds.take(sorted.length).toSeq, s"$src kept set is not a prefix")
      // within budget, except a first doc may alone overflow
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("cum_tokens") <= Curation.TokenBudget || i == 0)
      }
    }
  }

  test("x36 vocab coverage: monotone, bounded, ranks contiguous, top is global max") {
    val v = Curation.vocabCoverage(docs).orderBy("rnk").collect()
    val vocabSize = docs.select(explode(
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("t"))
      .agg(count_distinct(col("t"))).head.getLong(0)
    assert(v.length == math.min(Curation.VocabK.toLong, vocabSize).toInt)
    assert(v.map(_.getInt(0)).toSeq == (1 to v.length))
    // the full vocabulary fits ⇒ coverage must close at exactly 1
    if (vocabSize <= Curation.VocabK) assert(math.abs(v.last.getDouble(3) - 1.0) < 1e-9)
    val cov = v.map(_.getDouble(3))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b }, "coverage must be monotone")
    assert(cov.last <= 1.0 + 1e-9 && cov.head > 0)
    val cnts = v.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "counts must be non-increasing")
  }

  test("x28 repetition: ratios bounded, repetitive text flagged") {
    import spark.implicits._
    val r = Curation.repetitionStats(docs)
    assert(r.filter(col("dup_word_ratio") < 0 || col("dup_word_ratio") > 1 ||
                    col("dup_2gram_ratio") < 0 || col("dup_2gram_ratio") > 1).count() == 0)
    val planted = Seq(
      (1L, "s", Seq.fill(30)("spam").mkString(" ")),
      (2L, "s", (1 to 30).map("w" + _).mkString(" "))
    ).toDF("doc_id", "source", "text")
    val flags = Curation.repetitionStats(planted).collect()
      .map(row => row.getLong(0) -> row.getBoolean(4)).toMap
    assert(!flags(1L), "fully repetitive doc passed the repetition rule")
    assert(flags(2L), "all-distinct doc failed the repetition rule")
  }

  test("x29 rebalance: smallest stratum intact, others downsampled toward it") {
    val kept = Curation.rebalance(docs, "lang").cache()
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = before.minBy(_._2)._1
    assert(after(minLang) == before(minLang), "smallest stratum was downsampled")
    // hash sampling is binomial around the target: allow generous slack,
    // but a stratum must never grow and big strata must actually shrink
    before.foreach { case (l, b) =>
      assert(after.getOrElse(l, 0L) <= b)
      if (b > 2 * before(minLang)) assert(after(l) < b, s"stratum $l was not downsampled")
    }
    // deterministic membership
    val again = Curation.rebalance(docs, "lang").select("doc_id")
    assert(kept.select("doc_id").except(again).count() == 0 &&
           again.except(kept.select("doc_id")).count() == 0)
    kept.unpersist()
  }

  test("x30 quality quantile: ~q of each source kept, all kept beat all dropped") {
    val kept = Curation.topQualityQuantile(docs).cache()
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept.groupBy("source").count().collect().foreach { r =>
      val (src, k, n) = (r.getString(0), r.getLong(1), perSource(r.getString(0)))
      assert(k >= 1 && k <= n * Curation.TopQuantile + 1, s"$src kept $k of $n")
    }
    // selection is by quality: each source's minimum kept quality must be
    // at least its maximum dropped quality
    val dropped = docs.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
      .withColumn("quality", graft.functions.TextFunctions.qualityScore(col("text")))
    val worstKept = kept.groupBy("source").agg(min("quality").as("min_kept"))
    val bestDropped = dropped.groupBy("source").agg(max("quality").as("max_dropped"))
    val bad = worstKept.join(bestDropped, "source")
      .filter(col("min_kept") < col("max_dropped"))
    assert(bad.count() == 0, "a dropped doc outranks a kept one")
    kept.unpersist()
  }

  test("x32 chunking: full coverage, correct overlap, short docs intact") {
    import graft.functions.{TextFunctions => TF}
    val chunks = Curation.chunk(docs).cache()
    val sz = Curation.ChunkSize; val st = Curation.ChunkStride
    // a doc shorter than one window is exactly its own single chunk
    val short = docs.filter(TF.tokenCount(col("text")) <= sz)
      .join(chunks, "doc_id")
      .filter(col("chunk_id") =!= 0 || col("chunk") =!= col("text"))
    assert(short.count() == 0)
    // every chunk except a doc's last has exactly `size` tokens
    val maxId = chunks.groupBy(col("doc_id").as("d")).agg(max("chunk_id").as("last"))
    val bad = chunks.join(maxId, col("doc_id") === col("d"))
      .filter(col("chunk_id") < col("last") && col("chunk_tokens") =!= sz)
    assert(bad.count() == 0, "a non-final chunk is not full-size")
    // chunks cover the doc: strides tile the token range
    val cov = chunks.join(maxId, col("doc_id") === col("d"))
      .filter(col("chunk_id") === col("last"))
      .join(docs.select(col("doc_id"), TF.tokenCount(col("text")).as("n")), "doc_id")
      .filter(lit(st) * col("chunk_id") + col("chunk_tokens") < col("n"))
    assert(cov.count() == 0, "the last chunk does not reach the end of the doc")
    chunks.unpersist()
  }

  test("x33 tfidf: rank order consistent, a common term never outranks by df") {
    val out = Curation.tfidfTopK(docs).cache()
    assert(out.count() > 0)
    // rank order within a doc follows the rounded score
    val bad = out.as("a").join(out.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.rnk") < col("b.rnk") &&
        col("a.tfidf") < col("b.tfidf"))
    assert(bad.count() == 0)
    // equal tf ⇒ the rarer term (smaller df) scores at least as high
    val mono = out.as("a").join(out.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tf") === col("b.tf") &&
        col("a.df") < col("b.df") && col("a.tfidf") < col("b.tfidf"))
    assert(mono.count() == 0, "a more common term outscored a rarer one at equal tf")
    out.unpersist()
  }

  test("x71 bm25: planted relevant doc ranks first, no-overlap docs never surface") {
    import spark.implicits._
    // id 0 is the query slice (0 % BenchMod == 0); 1..3 are the corpus.
    // docA shares all three query terms, docB one, docC none.
    val corpus = Seq(
      (0L, "zebra quantum flux"),
      (1L, "zebra quantum flux common common"),
      (2L, "zebra filler filler filler"),
      (3L, "nothing shared here at all")
    ).toDF("doc_id", "text")
    val out = Curation.bm25TopK(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.forall(_._1 == 0L), "only doc 0 is in the query slice")
    assert(out.forall(_._3 > 0.0), "BM25 over disjoint tf/idf terms is strictly positive")
    val byRank = out.sortBy(_._4).map(_._2).toSeq
    assert(byRank == Seq(1L, 2L), s"expected candidates [A, B] ranked [1, 2], got $byRank")
    // candidate generation is the inverted-index join: doc 3 shares no
    // token with the query, so it must never materialize as a pair
    assert(!out.exists(_._2 == 3L))
  }

  test("x71 bm25: the df stop-term cap drops blanket terms, keeps rare ones") {
    import spark.implicits._
    // "common" blankets every corpus doc (df = 4/4); "zebra" is rare
    // (df = 1). Uncapped, the blanket term makes every doc a candidate;
    // with maxDfFrac = 0.5 only the rare term retrieves — the welded-
    // boilerplate situation ScaleCheck's clique fixture measures.
    val corpus = Seq(
      (0L, "zebra common"),
      (1L, "zebra common filler"),
      (2L, "common other words"),
      (3L, "common more text"),
      (4L, "common yet another")
    ).toDF("doc_id", "text")
    val uncapped = Curation.bm25TopK(corpus).collect().map(_.getLong(1)).toSet
    assert(uncapped == Set(1L, 2L, 3L, 4L),
      "uncapped: the blanket term must surface every doc as a candidate")
    val capped = Curation.bm25TopK(corpus, maxDfFrac = Some(0.5))
      .collect().map(_.getLong(1)).toSet
    assert(capped == Set(1L), "capped: only the rare term's posting list is read")
    // and with no blanket terms, the cap is a no-op (same results)
    val clean = Seq(
      (0L, "zebra quantum"),
      (1L, "zebra filler"), (2L, "quantum filler"), (3L, "unrelated text")
    ).toDF("doc_id", "text")
    val a = Curation.bm25TopK(clean).collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val b = Curation.bm25TopK(clean, maxDfFrac = Some(0.5))
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b, "cap must be a no-op when no term exceeds it")
  }

  test("x71 bm25 cap audit: dropped/surviving counts per query; capped-empty self-diagnoses") {
    import spark.implicits._
    // same planted corpus as the cap spec: "common" blankets (df 4/4),
    // "zebra" is rare (df 1)
    val corpus = Seq(
      (0L, "zebra common"),
      (1L, "zebra common filler"),
      (2L, "common other words"),
      (3L, "common more text"),
      (4L, "common yet another")
    ).toDF("doc_id", "text")
    val audit = Curation.bm25CapAudit(corpus, maxDfFrac = Some(0.5))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(audit == Set((0L, 2L, 1L, 1L)),
      s"query 0 has 2 terms, 1 blanket-dropped, 1 surviving: $audit")
    // partial-blanket regime: output non-empty, so the in-plan observed
    // metrics surface on the SAME job — no second scan
    val partial = Curation.bm25TopK(corpus, maxDfFrac = Some(0.5))
    assert(partial.collect().nonEmpty)
    val pm = partial.queryExecution.observedMetrics("bm25_cap_audit")
    assert(pm.getAs[Long]("dropped_blanket_terms") == 1L &&
           pm.getAs[Long]("surviving_terms") == 1L,
      s"observed metrics must report dropped=1/surviving=1, got $pm")
    val uncapped = Curation.bm25CapAudit(corpus, maxDfFrac = None)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(uncapped == Set((0L, 2L, 0L, 2L)),
      s"no cap: nothing dropped, all terms survive: $uncapped")

    // the welded-clique regime: EVERY query term blankets the corpus, so
    // the capped result is empty BY DESIGN — and the audit + observed
    // metrics make that distinguishable from a misconfigured cap
    val clique = Seq(
      (0L, "common shared"),
      (1L, "common shared one"), (2L, "common shared two"),
      (3L, "common shared three"), (4L, "common shared four")
    ).toDF("doc_id", "text")
    val cappedOut = Curation.bm25TopK(clique, maxDfFrac = Some(0.5))
    assert(cappedOut.collect().isEmpty, "every term blankets: capped result empty by design")
    // the fully-empty regime is where AQE's empty-relation propagation
    // prunes the in-plan CollectMetrics node (the documented caveat) —
    // pin that behavior so a Spark upgrade changing it is noticed, and
    // diagnose through the always-on audit relation instead
    assert(!cappedOut.queryExecution.observedMetrics.contains("bm25_cap_audit"),
      "AQE no longer prunes CollectMetrics on empty results — " +
      "update bm25TopK's caveat scaladoc")
    val cliqueAudit = Curation.bm25CapAudit(clique, maxDfFrac = Some(0.5))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(cliqueAudit == Set((0L, 2L, 2L, 0L)),
      s"audit: all of query 0's terms blanket-dropped: $cliqueAudit")
    // a query term ABSENT from the corpus is surviving (df 0), not
    // dropped — "retrieves nothing" for a different, visible reason
    val absent = Seq((0L, "zebra missingterm"), (1L, "zebra filler"),
      (2L, "other text"), (3L, "more words")).toDF("doc_id", "text")
    val absentAudit = Curation.bm25CapAudit(absent, maxDfFrac = Some(0.5))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(absentAudit == Set((0L, 2L, 0L, 2L)), s"df-0 term counts as surviving: $absentAudit")
  }

  test("x71 bm25: ranks contiguous per query, scores non-increasing, query slice excluded") {
    val out = Curation.bm25TopK(docs).cache()
    assert(out.count() > 0)
    assert(out.filter(col("query_id") % Curation.BenchMod =!= 0).count() == 0)
    assert(out.filter(col("query_id") >= Curation.BmQueryIdMax).count() == 0,
      "the eval slice is fixed-size; ids past the bound must not query")
    assert(out.filter(col("doc_id") % Curation.BenchMod === 0).count() == 0,
      "a query-slice doc leaked into the item side")
    // rnk is 1..n(query) with no gaps, and the rounded score never
    // increases with rank
    val bad = out.as("a").join(out.as("b"),
        col("a.query_id") === col("b.query_id") && col("a.rnk") < col("b.rnk") &&
        col("a.bm25") < col("b.bm25"))
    assert(bad.count() == 0, "score increased with rank")
    val perQ = out.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max(col("rnk")).as("mx"), min(col("rnk")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1)
    assert(perQ.count() == 0, "rnk not contiguous from 1")
    out.unpersist()
  }

  test("x34 mixture: kept counts approximate the target proportions") {
    val kept = Curation.mixtureSample(docs, "lang").cache()
    val n = kept.count().toDouble
    assert(n > 0)
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash-bucket thresholds are granular (1/256) and binomial: allow a
    // wide tolerance, but the ordering en > others must hold and no
    // stratum may exceed its original count
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Curation.MixtureWeights.foreach { case (l, pct) =>
      val share = byLang.getOrElse(l, 0L) / n
      assert(math.abs(share - pct / 100.0) < 0.10,
        s"$l share $share vs target ${pct / 100.0}")
      assert(byLang.getOrElse(l, 0L) <= before(l))
    }
    assert(byLang("en") > byLang("de"), "en must dominate the mixture")
    kept.unpersist()
  }

  test("x24 heavy hitters: exactly K per lang, counts non-increasing") {
    val k = 5
    val hh = Curation.heavyHitters(docs, k).cache()
    val perLang = hh.groupBy("lang").count().collect()
    assert(perLang.nonEmpty)
    perLang.foreach(r => assert(r.getLong(1) <= k))
    // rank order is count order
    val bad = hh.as("a").join(hh.as("b"),
        col("a.lang") === col("b.lang") && col("a.rnk") < col("b.rnk") &&
        col("a.cnt") < col("b.cnt"))
    assert(bad.count() == 0, "a lower rank has a smaller count")
    hh.unpersist()
  }

  test("x43 segment dedup: first occurrence survives, segments conserved") {
    import spark.implicits._
    // planted: doc 1 and doc 2 share their first 8-word segment; the
    // earlier (doc_id, pos) keeps it, the later loses exactly that one
    val planted = Seq(
      (1L, "a b c d e f g h x x x x x x x x"),
      (2L, "a b c d e f g h p q r s t u v w")
    ).toDF("doc_id", "text")
    val out = Curation.segmentDedup(planted).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_kept") == 2)
    assert(out(0).getAs[String]("dedup_text") == "a b c d e f g h x x x x x x x x")
    assert(out(1).getAs[Long]("n_kept") == 1)
    assert(out(1).getAs[String]("dedup_text") == "p q r s t u v w")

    // corpus invariant: every kept count is <= the segment count, and the
    // total kept equals the number of DISTINCT segments in the corpus
    val res = Curation.segmentDedup(docs).cache()
    assert(res.filter(col("n_kept") > col("n_segs")).count() == 0)
    val totKept = res.agg(sum("n_kept")).head.getLong(0)
    val sw = Curation.SegWords
    val toks = split(col("text"), " ")
    val nSegs = greatest(ceil(size(toks).cast("double") / sw).cast("int"), lit(1))
    val distinctSegs = docs.select(
        explode(transform(sequence(lit(0), nSegs - 1),
          i => concat_ws(" ", slice(toks, i * sw + 1, lit(sw))))).as("seg"))
      .select(countDistinct("seg")).head.getLong(0)
    assert(totKept == distinctSegs,
      s"kept $totKept segments but corpus has $distinctSegs distinct ones")
    res.unpersist()
  }

  test("x47 priority sample: exact k per stratum, no replacement, matches window recompute") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{TextFunctions => TF}
    val k = 7
    val out = Curation.prioritySample(docs, k).cache()

    // exactly min(k, |stratum|) winners per stratum, each doc at most once
    val perStratum = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (lang, n) =>
      assert(perStratum(lang) == math.min(k.toLong, n),
        s"stratum $lang: ${perStratum(lang)} winners, expected ${math.min(k.toLong, n)}")
    }
    assert(out.select("doc_id").distinct().count() == out.count(), "a doc sampled twice")

    // the bounded-heap winners must be EXACTLY the window-rank winners
    // over the same key formula (independent recompute of the semantics)
    val w = lit(0.05) + TF.qualityScore(col("text"))
    val v = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
    val u = (v.cast("double") + lit(0.5)) / lit(1152921504606846976.0d)
    val win = Window.partitionBy("lang").orderBy(col("skey").desc, col("doc_id").asc)
    val expect = docs.select(col("lang"), col("doc_id"), round(log(u) / w, 6).as("skey"))
      .withColumn("rank", row_number().over(win)).filter(col("rank") <= k)
      .select("lang", "doc_id", "rank").as[(String, Long, Int)](
        org.apache.spark.sql.Encoders.product[(String, Long, Int)]).collect().toSet
    val got = out.select(col("lang"), col("doc_id"), col("rank").cast("int"))
      .as[(String, Long, Int)](
        org.apache.spark.sql.Encoders.product[(String, Long, Int)]).collect().toSet
    assert(got == expect, "heap top-k disagrees with window-rank recompute")
    out.unpersist()
  }

  test("x52 collocations: planted pair outranks frequent independent bigrams") {
    val spark2 = spark
    import spark2.implicits._
    // "zq xw" always co-occurs (12 times, only as a pair); filler tokens
    // are frequent and independently shuffled, so their bigrams carry
    // low PMI. The planted pair must take rank 1.
    val fill = Seq("alpha", "beta", "gamma", "delta")
    val planted = (0 until 12).map { i =>
      val pad = (0 until 8).map(j => fill((i + j) % 4)).mkString(" ")
      (i.toLong, s"$pad zq xw $pad")
    }
    val fixture = planted.toDF("doc_id", "text")
    val out = Curation.collocations(fixture, k = 10, minCount = 5).cache()
    val top = out.filter(col("rnk") === 1).select("bg").as[String].head()
    assert(top == "zq xw", s"planted collocation not top-ranked: got $top")
    // PMI of the planted pair strictly exceeds every filler bigram's
    val pmis = out.select("bg", "pmi").as[(String, Double)].collect().toMap
    assert(pmis.filter(_._1 != "zq xw").values.forall(_ < pmis("zq xw")))
    // deterministic
    val again = Curation.collocations(fixture, k = 10, minCount = 5)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    out.unpersist()
  }

  // ------------------------------------------------------------------
  // x68 — BPE merge learning
  // ------------------------------------------------------------------

  /** Independent in-memory reference of Sennrich et al.'s learn_bpe:
    * same pair counting (adjacent, overlapping, word-frequency
    * weighted), same (-freq, left, right) argmax, same greedy
    * left-to-right merge application. Deliberately written over plain
    * Maps/Lists so it shares NO code with the operator under test. */
  private def referenceBpe(wordFreq: Map[String, Long], k: Int,
                           minFreq: Long = 2L): Seq[(Int, String, String, Long)] = {
    var words = wordFreq.toSeq.map { case (w, f) => (w.map(_.toString).toList, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var stop = false
    while (rank <= k && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      words.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p => counts(p) += f)
      }
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minFreq =>
          out += ((rank, a, b, c))
          words = words.map { case (s, f) =>
            val merged = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
                merged += a + b; i += 2
              } else { merged += s(i); i += 1 }
            }
            (merged.toList, f)
          }
          rank += 1
        case _ => stop = true
      }
    }
    out.toSeq
  }

  test("x68 BPE: learned merges equal the reference algorithm merge-for-merge") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "lower lower lowest newer newer newer wider low low low"),
      (1L, "newer wider wider lowest lower new new low"),
      (2L, "the newest the widest the lowest newer lower"))
    val df = corpus.toDF("doc_id", "text")
    val wordFreq = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val expected = referenceBpe(wordFreq, 12)
    val got = Curation.bpeMerges(df, numMerges = 12)
      .select("rank", "left", "right", "pair_freq")
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == expected)
    // merged column is the concatenation, by construction of the contract
    val m = Curation.bpeMerges(df, numMerges = 3)
      .select("left", "right", "merged").as[(String, String, String)].collect()
    assert(m.forall { case (a, b, ab) => a + b == ab })
  }

  test("x68 BPE: minFreq floor stops early; a no-pair corpus learns nothing") {
    import spark.implicits._
    // every word a single char → no adjacent pairs at all
    val lone = Seq((0L, "a b c d e")).toDF("doc_id", "text")
    assert(Curation.bpeMerges(lone, numMerges = 5).count() == 0)
    // one word repeated once → its pairs have freq 1 < minFreq 2
    val once = Seq((0L, "unique")).toDF("doc_id", "text")
    assert(Curation.bpeMerges(once, numMerges = 5, minFreq = 2L).count() == 0)
    // and with the floor lowered the same corpus DOES learn
    assert(Curation.bpeMerges(once, numMerges = 2, minFreq = 1L).count() == 2)
  }

  test("x68 BPE incremental: adversarial tie corpus where a created pair chains to the top") {
    import spark.implicits._
    // "abcd"×18: pairs (a,b)=(b,c)=(c,d)=18. Sequential merges (a,b)
    // first (lex tie-break); the merge CREATES (`ab`,c)=18 which ties
    // (c,d)=18 and wins lexicographically, so the correct second merge
    // is (`ab`,c), not (c,d) — the created-pair-chains property that
    // sank the batched-round design and that the incremental index must
    // track exactly (its count structure is updated mid-stream, not
    // recomputed per round).
    val df = (0L until 6L).map(i => (i, "abcd abcd abcd")).toDF("doc_id", "text")
    val expected = referenceBpe(Map("abcd" -> 18L), 6)
    assert(expected(1)._2 == "ab" && expected(1)._3 == "c") // the trap is armed
    val got = Curation.bpeMerges(df, numMerges = 6)
      .select("rank", "left", "right", "pair_freq")
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == expected, s"$got != $expected")
  }

  test("x68 BPE incremental: exact on random tie-dense corpora (vs the naive reference)") {
    import spark.implicits._
    // tiny alphabet ⇒ dense pair ties, merged-symbol collisions
    // (("a","bc") after ("ab","c")), overlapping same-symbol runs — the
    // hazard paths of incremental count maintenance. The indexed kernel
    // must equal the recount-everything reference exactly.
    val rnd = new scala.util.Random(421)
    (1 to 4).foreach { trial =>
      val alphabet = "abcde"
      val lexicon = (1 to 40).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val text = (1 to 120).map(_ => lexicon(rnd.nextInt(lexicon.length))).mkString(" ")
      val df = Seq((0L, text)).toDF("doc_id", "text")
      val wordFreq = text.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (w, ws) => w -> ws.size.toLong }
      val expected = referenceBpe(wordFreq, 25, minFreq = 1L)
      val got = Curation.bpeMerges(df, numMerges = 25, minFreq = 1L)
        .select("rank", "left", "right", "pair_freq")
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      assert(got == expected, s"trial=$trial: $got != $expected")
    }
  }

  test("x109 distributed BPE: merge-for-merge equality with the kernel and the naive reference") {
    import spark.implicits._
    // the x68 agreement fixture: all three learners (naive reference,
    // single-task kernel, distributed per-round) must agree exactly
    val corpus = Seq(
      (0L, "lower lower lowest newer newer newer wider low low low"),
      (1L, "newer wider wider lowest lower new new low"),
      (2L, "the newest the widest the lowest newer lower"))
    val df = corpus.toDF("doc_id", "text")
    val wordFreq = corpus.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val expected = referenceBpe(wordFreq, 12)
    val kernel = Curation.bpeMerges(df, numMerges = 12)
      .select("rank", "left", "right", "pair_freq")
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val dist = Curation.bpeMergesDistributed(df, numMerges = 12)
      .select("rank", "left", "right", "pair_freq")
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(dist == expected, s"distributed != reference:\n$dist\n$expected")
    assert(dist == kernel, "the three learners must agree merge-for-merge")

    // the created-pair-chains trap (the property that sank batched
    // rounds): per-round recounting must pick ('ab','c') at rank 2
    val chain = (0L until 6L).map(i => (i, "abcd abcd abcd")).toDF("doc_id", "text")
    val chainExp = referenceBpe(Map("abcd" -> 18L), 6)
    assert(chainExp(1)._2 == "ab" && chainExp(1)._3 == "c")
    val chainGot = Curation.bpeMergesDistributed(chain, numMerges = 6)
      .select("rank", "left", "right", "pair_freq")
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(chainGot == chainExp, s"$chainGot != $chainExp")

    // one tie-dense randomized trial (rounds are Spark jobs — keep the
    // trial count low here; the kernel path covers 4 trials)
    val rnd = new scala.util.Random(422)
    val alphabet = "abcde"
    val lexicon = (1 to 40).map { _ =>
      (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val text = (1 to 120).map(_ => lexicon(rnd.nextInt(lexicon.length))).mkString(" ")
    val tdf = Seq((0L, text)).toDF("doc_id", "text")
    val tFreq = text.split(" ").filter(_.nonEmpty).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val tExp = referenceBpe(tFreq, 15, minFreq = 1L)
    val tGot = Curation.bpeMergesDistributed(tdf, numMerges = 15, minFreq = 1L)
      .select("rank", "left", "right", "pair_freq")
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(tGot == tExp, s"$tGot != $tExp")

    // minFreq floor + empty-corpus totality
    assert(Curation.bpeMergesDistributed(
      Seq((0L, "a b c")).toDF("doc_id", "text"), numMerges = 3).count() == 0)
  }

  test("x68 BPE: minWordFreq thresholds the dictionary; maxVocab guards loudly") {
    import spark.implicits._
    val df = Seq((0L, "zz zz zz qq"), (1L, "zz qq ww")).toDF("doc_id", "text")
    // minWordFreq=2 drops the hapax 'ww' before learning: with minFreq=1
    // the learned table is exactly the one from the thresholded corpus
    val thresholded = Curation.bpeMerges(df, numMerges = 5, minFreq = 1L,
        minWordFreq = 2L)
      .select("left", "right", "pair_freq").as[(String, String, Long)].collect().toSeq
    val manual = referenceBpe(Map("zz" -> 4L, "qq" -> 2L), 5, minFreq = 1L)
      .map(m => (m._2, m._3, m._4))
    assert(thresholded == manual, s"$thresholded != $manual")
    // the vocabulary guard names the knob instead of OOMing the task
    val e = intercept[IllegalArgumentException](
      Curation.bpeMerges(df, numMerges = 2, maxVocab = 1L))
    assert(e.getMessage.contains("minWordFreq"))
  }

  test("x68 BPE: argmax ties break in code-point order, not UTF-16 code-unit order") {
    // U+E000 (BMP private-use) vs U+10000 (supplementary 𐀀): by code
    // points E000 < 10000 is FALSE numerically — 0xE000=57344 <
    // 0x10000=65536 — so U+E000 sorts first; by raw UTF-16 units the
    // supplementary char starts with the surrogate 0xD800=55296 < 0xE000
    // and would wrongly win the tie. The kernel must match the
    // engine-side (UTF8String binary ≡ code-point) semantics.
    assert(Curation.codePointOrder.compare("\uE000", "\uD800\uDC00") < 0)
    assert(Curation.codePointOrder.compare("a", "ab") < 0) // prefix sorts first
    val vocab = Array(
      (Array("\uD800\uDC00", "a"), 1L), // (𐀀, a) — count 1
      (Array("\uE000", "a"), 1L))       // (U+E000, a) — count 1, tie
    val got = Curation.learnBpeKernel(vocab, numMerges = 1, minFreq = 1L)
    assert(got.length == 1 && got(0)._2 == "\uE000",
      s"tie must go to U+E000 by code points, got left=${got(0)._2.codePointAt(0).toHexString}")
  }

  test("x68 BPE: merges on the sf0.001 corpus are deterministic and frequency-monotone-ish") {
    import spark.implicits._
    val a = Curation.bpeMerges(docs, numMerges = 8)
      .select("rank", "merged", "pair_freq").as[(Int, String, Long)].collect().toSeq
    val b = Curation.bpeMerges(docs, numMerges = 8)
      .select("rank", "merged", "pair_freq").as[(Int, String, Long)].collect().toSeq
    assert(a == b && a.size == 8)
    // rank 1 is the global max pair frequency: no later merge can beat
    // it (merging only removes or re-associates pair occurrences of the
    // merged pair's neighbors; a brand-new pair's count is bounded by
    // its constituents' pre-merge counts)
    assert(a.forall(_._3 <= a.head._3))
  }

  // ------------------------------------------------------------------
  // x69 — BPE encoding
  // ------------------------------------------------------------------

  /** Independent reference of Sennrich et al.'s apply_bpe: repeatedly
    * merge the LOWEST-RANK pair present anywhere in the word (leftmost
    * occurrence first) until no table pair remains. A different
    * algorithm from the operator's one-pass-per-rank kernel — agreement
    * between the two is the equivalence proof. */
  private def referenceEncode(word: String,
                              merges: Seq[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toList
    var continue = true
    while (continue && syms.length > 1) {
      val present = syms.zip(syms.tail).zipWithIndex
        .filter { case (p, _) => rank.contains(p) }
      if (present.isEmpty) continue = false
      else {
        val (pair @ (a, b), i) =
          present.minBy { case (p, i) => (rank(p), i) }
        syms = syms.take(i) ::: (a + b) :: syms.drop(i + 2)
      }
    }
    syms
  }

  test("x69 BPE encode: kernel equals the priority-queue apply_bpe on every corpus word") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "lower lower lowest newer newer newer wider low low low"),
      (1L, "newer wider wider lowest lower new new low"),
      (2L, "the newest the widest the lowest newer lower aaaa aaa"))
    val df = corpus.toDF("doc_id", "text")
    val merges = Curation.bpeMerges(df, numMerges = 12)
      .select("left", "right").as[(String, String)].collect().toSeq
    assert(merges.nonEmpty)
    val words = corpus.flatMap(_._2.split(" ")).distinct
    val units = merges.map { case (a, b) => a + b }.toSet
    words.foreach { w =>
      val got = Curation.encodeWord(w, merges.toArray).toList
      // two different algorithms agree
      assert(got == referenceEncode(w, merges),
        s"word '$w': kernel $got != reference ${referenceEncode(w, merges)}")
      // concatenation invariant: units rejoin to the word
      assert(got.mkString == w)
      // unit closure: every unit is a single char or a table entry
      assert(got.forall(u => u.length == 1 || units.contains(u)))
      // saturation: no table pair survives adjacent in the output
      assert(!got.zip(got.tail).exists { case (a, b) => merges.contains((a, b)) })
    }
  }

  test("x69 BPE encode: rank-heap kernel == pass kernel == apply_bpe, incl. adversarial tables") {
    import spark.implicits._
    // three independent algorithms must agree word-for-word: the
    // one-pass-per-rule form, the (rank, leftmost) reference above, and
    // the shipped rank-heap kernel
    def all3(w: String, merges: Seq[(String, String)]): Unit = {
      val heap = Curation.encodeWordRankHeap(w, Curation.rankTable(merges)).toList
      assert(heap == Curation.encodeWord(w, merges.toArray).toList, s"word '$w' vs pass form")
      assert(heap == referenceEncode(w, merges), s"word '$w' vs apply_bpe reference")
      assert(heap.mkString == w, s"word '$w': units do not rejoin")
    }
    // the chained-argmax table: merge 2 consumes merge 1's output
    val chained = Seq(("a", "b"), ("ab", "c"), ("abc", "d"), ("c", "d"))
    Seq("abcd", "abcdabcd", "aabbccdd", "dcba", "abcabd", "").foreach(all3(_, chained))
    // overlapping same-pair occurrences: leftmost-first tie-break
    val aa = Seq(("a", "a"), ("aa", "a"))
    Seq("aaa", "aaaa", "aaaaa", "aaaaaaa", "baab", "aabaa").foreach(all3(_, aa))
    // random tie-dense corpora: LEARN a table, then encode random words
    // drawn from the same tiny alphabet (ties everywhere by design)
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 15) {
      val vocabWords = Seq.fill(8)((1 to (2 + rnd.nextInt(5)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      val vocab = vocabWords.groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toArray, ws.size.toLong) }.toArray
      val merges = Curation.learnBpeKernel(vocab, numMerges = 6, minFreq = 1L)
        .map(m => (m._2, m._3)).toSeq
      val words = Seq.fill(30)((1 to (1 + rnd.nextInt(8)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      (vocabWords ++ words).foreach(all3(_, merges))
    }
  }

  test("x69 BPE encode: learn→encode is consistent and the entry is deterministic") {
    import spark.implicits._
    val merges = Curation.bpeMerges(docs, numMerges = 8)
      .select("left", "right").as[(String, String)].collect().toSeq
    val a = Curation.bpeEncode(docs, merges)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val b = Curation.bpeEncode(docs, merges)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(a == b && a.nonEmpty)
    // every document: units can never outnumber characters nor
    // undercut words (each word is >= 1 unit), and merging with a
    // LONGER table can only shrink or preserve the unit count
    val words = docs.select(col("doc_id"),
        size(filter(split(col("text"), " ", -1), w => length(w) > 0)).cast("long"))
      .as[(Long, Long)].collect().toMap
    a.foreach { case (id, nWords, nUnits, nDistinct) =>
      assert(nWords == words(id))
      assert(nUnits >= nWords && nDistinct <= nUnits)
    }
    val fewer = Curation.bpeEncode(docs, merges.take(3))
      .as[(Long, Long, Long, Long)].collect().toSeq
    fewer.zip(a).foreach { case ((id1, _, u3, _), (id2, _, u8, _)) =>
      assert(id1 == id2 && u8 <= u3)
    }
  }

  test("phraseMatches: occurrences, overlaps, and duplicate-token phrases") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "the cat sat on the mat while the cat sat again"), // "the cat sat" twice
      (11L, "a b a b a"),                                      // overlapping "a b a": anchors 0 and 2
      (12L, "nothing relevant here"),
      (13L, "The CAT sat")                                     // case-folded match at 0
    ).toDF("doc_id", "text")
    val phrases = Seq(
      (1L, Seq("the", "cat", "sat")),
      (2L, Seq("a", "b", "a"))                                 // duplicate token in phrase
    ).toDF("query_id", "ph")
    val out = graft.operators.Curation.phraseMatches(corpus, phrases)
      .orderBy("query_id", "doc_id")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 10L, 2L, 0),   // two occurrences, first at 0
      (1L, 13L, 1L, 0),   // lowercasing unifies
      (2L, 11L, 2L, 0)))  // OVERLAPPING occurrences both count (anchors 0, 2)
  }

  test("phraseMatches: partial term hits never produce a match") {
    import spark.implicits._
    val corpus = Seq((20L, "cat sat the on mat")).toDF("doc_id", "text") // all terms, wrong order
    val phrases = Seq((1L, Seq("the", "cat", "sat"))).toDF("query_id", "ph")
    assert(graft.operators.Curation.phraseMatches(corpus, phrases).count() == 0)
  }

  test("x87 bigramScore: hand-computed interpolated xent; <2-token docs absent") {
    import spark.implicits._
    // corpus: uni a=3 b=3 c=1 (total 7); bigrams (a,b)=3 (b,a)=1; ctx a=3 b=1
    val corpus = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"), (4L, ""))
      .toDF("doc_id", "text")
    val r = Curation.bigramScore(corpus).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    // every transition in docs 1,2 is MLE-certain: p = 0.9*1 + 0.1*uni(w2)
    val expected = BigDecimal(-math.log(0.9 + 0.1 * (3.0 / 7)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.keySet == Set(1L, 2L)) // no bigram => unscorable => absent
    assert(r(1L) == ((3L, expected)) && r(2L) == ((1L, expected)))
  }

  test("x87 bigramScore: token salad scores above natural transitions") {
    import spark.implicits._
    // same unigram profile, different transition structure: x35 is blind
    // to this pair; the bigram model must separate them
    val base = Seq.fill(8)("the cat sat on the mat").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val corpus = (base :+ (100L -> "the the cat cat sat sat on mat on mat"))
      .toDF("doc_id", "text")
    val r = Curation.bigramScore(corpus).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(100L) > r(0L),
      s"salad ${r(100L)} should out-score natural ${r(0L)}")
    assert(r.values.forall(_ >= 0.0), "interpolated p<=1 => xent >= 0")
  }

  test("x118 bigramScoreKN: hand-computed KN xent; discount=0 reduces to the bigram MLE (x87 at lambda=1)") {
    import spark.implicits._
    // model: cb(a,b)=3 cb(b,a)=1; cw1(a)=3 n1+(a·)=1; cw1(b)=1 n1+(b·)=1;
    // N1+(·a)=1 N1+(·b)=1; bigram types N=2
    val corpus = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"), (4L, ""))
      .toDF("doc_id", "text")
    val r = Curation.bigramScoreKN(corpus).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    val pBA = (3.0 - 0.75) / 3 + 0.75 * 1 / 3.0 * (1 / 2.0) // P(b|a) = 0.875
    val pAB = (1.0 - 0.75) / 1 + 0.75 * 1 / 1.0 * (1 / 2.0) // P(a|b) = 0.625
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.keySet == Set(1L, 2L)) // <2-token docs absent, exactly as x87
    assert(r(1L) == ((3L, r6(-(2 * math.log(pBA) + math.log(pAB)) / 3))))
    assert(r(2L) == ((1L, r6(-math.log(pBA)))))

    // algebraic-reduction lever: D=0 makes P the bigram MLE, which is
    // bigramScore's lambda=1 arm exactly (0.0 * unigram adds nothing)
    val kn0 = Curation.bigramScoreKN(docs, discount = 0.0)
      .withColumnRenamed("xent", "kn").join(
        Curation.bigramScore(docs, lambda = 1.0), Seq("doc_id", "n_bigrams"))
    assert(kn0.count() > 0 && kn0.filter(col("kn") =!= col("xent")).count() == 0)
  }

  test("x118 bigramScoreKN: continuation back-off demotes single-collocation tokens (the francisco property)") {
    import spark.implicits._
    // 'francisco' is unigram-frequent but follows ONLY {san, of};
    // 'q' is unigram-rare but follows six distinct contexts. Both test
    // transitions are equally rare (cb=1) from the same context 'of'.
    // x87's unigram back-off props up francisco; KN's continuation
    // distribution inverts the ranking — the published rationale.
    val corpus = (
      (1L to 20L).map(i => (i, "san francisco")) ++
      Seq(21L -> "a q", 22L -> "b q", 23L -> "c q", 24L -> "d q", 25L -> "e q",
          101L -> "of francisco", 102L -> "of q")
    ).toDF("doc_id", "text")
    def xents(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    val x87 = xents(Curation.bigramScore(corpus))
    val kn = xents(Curation.bigramScoreKN(corpus))
    assert(x87(101L) < x87(102L),
      s"x87 should favor the boilerplate-inflated token: ${x87(101L)} vs ${x87(102L)}")
    assert(kn(101L) > kn(102L),
      s"KN should favor the diverse-context token: ${kn(101L)} vs ${kn(102L)}")
    assert(kn.values.forall(x => x > 0.0), "D<1 and every scored bigram has c>=1 => p in (0,1)")
  }

  test("x120 hashed KN model: fixed-width bound; n_bigrams identical to x118") {
    import spark.implicits._
    val kn = Curation.bigramScoreKN(docs)
      .select(col("doc_id"), col("n_bigrams").as("nb_kn"))
    val knh = Curation.bigramScoreKNHashed(docs)
      .select(col("doc_id"), col("n_bigrams").as("nb_h"), col("xent"))
    val j = kn.join(knh, Seq("doc_id"), "full").cache()
    assert(j.filter(col("nb_kn").isNull || col("nb_h").isNull).count() == 0,
      "bucketing renames tokens, never drops them: same doc set")
    assert(j.filter(col("nb_kn") =!= col("nb_h")).count() == 0,
      "n_bigrams must be identical to x118's by construction")
    assert(j.filter(col("xent") <= 0.0).count() == 0,
      "every scored bucketed bigram has c >= 1 > D => p in (0,1) => xent > 0")

    // exercise the FOLD itself (the 31-word fixture vocab can't): a
    // 400-token vocabulary must collide into <= 256 buckets, so the
    // bucketed model is strictly SMALLER than the open bigram-type set
    // while per-doc bigram counts are preserved exactly
    val big = Seq((1L, (0 until 400).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val openTypes = 399L // each adjacent pair is distinct by construction
    val foldedTypes = big.select(explode(transform(
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)),
        t => substring(md5(t), 1, 2))).as("b"))
      .distinct().count()
    assert(foldedTypes <= 256, "bucket ids are 2-hex by key shape")
    assert(foldedTypes < 400, "400 tokens cannot stay distinct in 256 buckets")
    val hb = Curation.bigramScoreKNHashed(big).collect()
    assert(hb.length == 1 && hb(0).getLong(1) == openTypes,
      "folding renames model keys but never changes a doc's bigram count")
  }

  test("x119 paretoQualitySample: acceptance monotone in quality, bounded by the alpha=9 floor") {
    import graft.functions.{TextFunctions => TF}
    val kept = Curation.paretoQualitySample(docs).cache()
    val n = docs.count()
    val k = kept.count()
    // p(keep | q) = min(1, (2-q)^-9) in [2^-9, 1]: strictly inside
    assert(k > n / 512 && k < n, s"kept $k of $n")
    // every emitted row passed its own unrounded test; rounded key < 1 + eps
    assert(kept.filter(col("accept_key") >= 1.0).count() == 0)
    assert(kept.filter(col("quality") < 0.0 || col("quality") > 1.0).count() == 0)
    // bucket-level monotonicity: acceptance rate in the top quality half
    // strictly exceeds the bottom half (the Pareto rule's whole point —
    // a hard threshold would make the bottom rate exactly 0)
    val q = docs.select(col("doc_id"),
      round(TF.qualityScore(col("text")), 6).as("q"))
    val med = q.selectExpr("percentile(q, 0.5) AS m").collect()(0).getDouble(0)
    val withKeep = q.join(kept.select(col("doc_id"), lit(1).as("kept")),
      Seq("doc_id"), "left")
    val rates = withKeep.groupBy((col("q") > med).as("hi"))
      .agg(avg(coalesce(col("kept"), lit(0))).as("rate"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(rates(true) > rates(false),
      s"top-half acceptance ${rates(true)} must exceed bottom-half ${rates(false)}")
    assert(rates(false) > 0.0,
      "the Pareto tail must admit SOME low-quality docs (vs a hard threshold)")
  }

  test("x120 foldEarlyBm: bucketing before the type aggregation is value-identical (the measured-negative branch cannot rot)") {
    // the A/B receipt claims the two fold orders build the IDENTICAL
    // bucketed-bigram model (occurrence counts are associative); this
    // pins the unwired branch to that claim so it stays correct code,
    // not decaying prose
    val late = Curation.bigramScoreKNHashed(docs).collect().map(_.toSeq).toSet
    val early = Curation.bigramScoreKNHashed(docs, foldEarlyBm = true)
      .collect().map(_.toSeq).toSet
    assert(late.nonEmpty)
    assert(late == early,
      s"fold orders diverged: ${late.size} vs ${early.size} distinct rows")
  }

  test("x126 paretoClassifierSample: exact composition of the x124 score and the x119 keep rule") {
    import spark.implicits._
    val kept = Curation.paretoClassifierSample(docs).cache()
    val x124 = Curation.qualityClassifierFixed(docs).cache()
    // (a) the score column IS x124's, value for value (the lang-riding
    // groupBy renames no groups: lang is functionally dependent on doc_id)
    val joined = kept.join(
      x124.withColumnRenamed("q_score", "q124"), "doc_id")
    assert(joined.count() == kept.count(), "a kept doc is missing an x124 score")
    assert(joined.filter(col("q_score") =!= col("q124")).count() == 0,
      "x126's score diverged from x124's")
    // (b) driver-side replay of the full keep rule over EVERY scored doc:
    // md5-uniform (independent "paretoc:" seed), the (2-q)^9 chain in the
    // exact multiplication order, the unrounded u*g9 < 1 test
    def md5u(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"paretoc:$id".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 1152921504606846976.0
    }
    val expected = x124.collect().collect {
      case r if {
        val q = r.getDouble(1); val g1 = 2.0 - q; val g2 = g1 * g1
        md5u(r.getLong(0)) * ((g2 * g2) * (g2 * g2) * g1) < 1.0
      } => r.getLong(0)
    }.toSet
    val got = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"keep set diverged from the driver replay: ${got.size} vs ${expected.size}")
    assert(got.nonEmpty && got.size < x124.count(),
      "degenerate acceptance: the Pareto rule must keep a strict subset")
    // (c) the x124/x87 drop rule: a zero-token doc is scoreless and absent
    val tiny = Seq((1L, "en", "alpha beta"), (2L, "en", "!!! ???"))
      .toDF("doc_id", "lang", "text")
    assert(Curation.paretoClassifierSample(tiny)
      .filter(col("doc_id") === 2L).count() == 0)
    kept.unpersist(); x124.unpersist()
  }

  test("x130 trained Pareto sample: the shared admission stage replays exactly; the entry's rows are self-consistent under the closed-form rule") {
    import spark.implicits._
    def md5u(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"paretoc:$id".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 1152921504606846976.0
    }
    def chain(q: Double): Double = {
      val g1 = 2.0 - q; val g2 = g1 * g1
      (g2 * g2) * (g2 * g2) * g1
    }
    // (a) the shared paretoKeepStage on a HAND-scored relation (scores
    // are inputs, so the whole stage is deterministic): keep set equals
    // the driver replay of u·(2−q)⁹ < 1 exactly — this is the stage
    // x126's hash pins at fixed weights and x130 reuses at trained ones
    val hand = (0L until 400L).map(i => (i, (i % 100).toDouble / 100.0))
    val kept = Curation.paretoKeepStage(
      hand.toDF("doc_id", "q_score"), Nil).collect()
    val expected = hand.collect {
      case (id, q) if md5u(id) * chain(q) < 1.0 => id
    }.toSet
    assert(kept.map(_.getLong(0)).toSet == expected,
      s"stage keep set diverged: ${kept.length} vs ${expected.size}")
    assert(expected.nonEmpty && expected.size < hand.size,
      "degenerate hand fixture: need both kept and rejected docs")
    // (b) the real entry at trained weights: every output row is
    // independently re-derivable from its OWN carried score (u is a
    // deterministic md5 of doc_id; the chain is closed-form), rejected
    // docs exist, and the carried label matches the DSIR convention
    val out = Curation.paretoClassifierSampleTrained(docs).collect()
    assert(out.nonEmpty, "trained sampler kept nothing")
    assert(out.length < docs.count(), "trained sampler kept everything")
    out.foreach { r =>
      val (id, isT, q, key) =
        (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))
      val exact = md5u(id) * chain(q)
      assert(exact < 1.0, s"doc $id kept with accept key $exact >= 1")
      assert(math.abs(exact - key) <= 5e-7,
        s"doc $id accept_key $key != recomputed $exact")
      assert(isT == (if (id % Curation.BenchMod == 0) 1 else 0),
        s"doc $id carried label $isT breaks the DSIR convention")
    }
  }

  test("x132 temperatureSample: rarest stratum keeps (essentially) everything, rates fall with stratum size, keep set replays exactly") {
    val out = Curation.temperatureSample(docs).cache()
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    // re-derive the rates with the operator's documented arithmetic
    val nTot = counts.map(_._2).sum.toDouble
    val withSq = counts.map { case (l, n) =>
      val p = n / nTot; (l, p, math.sqrt(p))
    }
    val z = withSq.foldLeft(0.0)(_ + _._3)
    val withQ = withSq.map { case (l, p, sq) => (l, p, sq / z) }
    val sMin = withQ.map { case (_, p, q) => p / q }.min
    val rates = withQ.map { case (l, p, q) => l -> (q * sMin) / p }.toMap
    // the rarest stratum IS the feasibility binder: rate 1 up to the two
    // roundings of q·(p/q)/p
    val rarest = counts.minBy(_._2)._1
    assert(math.abs(rates(rarest) - 1.0) < 1e-12,
      s"rarest stratum '$rarest' rate ${rates(rarest)} != 1")
    // temperature damps by 1/√p̄: strictly larger strata get strictly
    // smaller keep rates
    counts.sortBy(_._2).sliding(2).foreach { case Array((l1, n1), (l2, n2)) =>
      if (n2 > n1) assert(rates(l2) < rates(l1),
        s"rate not decreasing: $l1($n1)=${rates(l1)} vs $l2($n2)=${rates(l2)}")
    }
    // exact keep-set replay: the same md5-uniform + the same rate per
    // stratum decides every document
    def md5u(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tsample:$id".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 1152921504606846976.0
    }
    val expected = docs.select("doc_id", "lang").collect().collect {
      case r if md5u(r.getLong(0)) < rates(r.getString(1)) => r.getLong(0)
    }.toSet
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected,
      s"keep set diverged from the replay: ${got.size} vs ${expected.size}")
    assert(got.nonEmpty && got.size < docs.count(),
      "degenerate sampling: need both kept and dropped docs")
    out.unpersist()
  }

  test("x127 classifierCalibration: total exact fold; the trained twin separates where the fixed ramp cannot") {
    import spark.implicits._
    val cal = Curation.classifierCalibration(docs).cache()
    // totality: the decile fold partitions exactly the scored (tokenized)
    // docs — nothing dropped, nothing double-counted
    val scoredN = Curation.qualityClassifierFixed(docs).count()
    assert(cal.agg(sum("n_docs")).collect()(0).getLong(0) == scoredN)
    assert(cal.filter(col("decile") < 0 || col("decile") > 9).count() == 0)
    // exactness: target_rate IS the integer-count ratio, per row
    assert(cal.filter(col("n_target") > col("n_docs")).count() == 0)
    assert(cal.filter(round(col("n_target").cast("double") / col("n_docs"), 6)
      =!= col("target_rate")).count() == 0)
    // the evaluation twin: the IDENTICAL fold over x125's TRAINED scores
    // (constructed two-domain corpus) shows the separation the fixed
    // affine ramp cannot have — targets sit in strictly higher deciles
    val docsT = (0L until 80L).map { i =>
      val t =
        if (i % 4 == 0)
          s"reference article citation neutral summary section v$i prose"
        else
          s"buy cheap click winner prize now offer${i % 7} deal$i"
      (i, t)
    }.toDF("doc_id", "text")
    val trained = Curation.qualityClassifierTrained(docsT, benchMod = 4,
        iters = 30, lr = 1.0)
      .select(col("doc_id"), (col("is_target") === 1).as("is_t"),
        col("q_score"))
    val t = Curation.calibrationTable(trained).collect()
    val nT = t.map(_.getLong(2)).sum.toDouble
    val nO = t.map(r => r.getLong(1) - r.getLong(2)).sum.toDouble
    assert(nT > 0 && nO > 0)
    val meanDecT = t.map(r => r.getLong(0) * r.getLong(2)).sum / nT
    val meanDecO = t.map(r => r.getLong(0) * (r.getLong(1) - r.getLong(2))).sum / nO
    assert(meanDecT > meanDecO + 1.0,
      s"trained targets do not separate by decile: $meanDecT vs $meanDecO")
    cal.unpersist()
  }

  test("x86 corpusDiff: delta rows only; whitespace-only edits are not changes") {
    import spark.implicits._
    val old = Seq((1L, "alpha beta"), (2L, "a  b"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val neu = Seq((1L, "alpha beta"),   // identical -> absent
                  (2L, "a b"),          // whitespace-only -> absent (fingerprint contract)
                  (3L, "gamma prime"),  // changed
                  (6L, "epsilon"))      // added; 4 removed
      .toDF("doc_id", "text")
    val got = Curation.corpusDiff(old, neu).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> "changed", 4L -> "removed", 6L -> "added"))
  }

  test("x90 tokenizerFertility: zero-merge = chars/word, saturating merges reach 1.0, agrees with x69") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "ab ab cd"),
      (2L, "en", "abcd"),
      (3L, "de", "ab cd")
    ).toDF("doc_id", "lang", "text")

    // zero merges: every unit is a single character, so n_units = n_chars
    // (chars_per_unit exactly 1) and fertility = chars per word
    val z = Curation.tokenizerFertility(docs, Seq.empty).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(z("en").getLong(2) == 4L && z("en").getLong(4) == 10L)
    assert(z("en").getDouble(5) == 2.5 && z("en").getDouble(6) == 1.0)
    assert(z("de").getDouble(5) == 2.0 && z("de").getDouble(6) == 1.0)

    // a table that merges every corpus word to ONE unit drives fertility
    // to exactly 1.0; chars_per_unit becomes mean word length
    val sat = Seq(("a", "b"), ("c", "d"), ("ab", "cd"))
    val f = Curation.tokenizerFertility(docs, sat).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(f("en").getDouble(5) == 1.0 && f("en").getDouble(6) == 2.5)
    assert(f("de").getDouble(5) == 1.0 && f("de").getDouble(6) == 2.0)

    // agreement with the x69 per-doc kernel on a real corpus + learned table
    val corpus = Tables.documents(spark, TestSpark.Sf0001)
    val merges = Curation.bpeMerges(corpus, numMerges = 10)
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val fert = Curation.tokenizerFertility(corpus, merges).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val perDoc = Curation.bpeEncode(corpus, merges)
      .join(corpus.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("w"), sum("n_units").as("u"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fert == perDoc)
  }

  test("x93 dsirSelect: target-like docs outrank off-target; eval slice never selected") {
    import spark.implicits._
    // ids 0 and 97 are the target slice (doc_id % 97 == 0); the corpus
    // docs range from pure target vocabulary to pure off-target
    val docs = Seq(
      (0L,  "heart dose patient trial heart dose"),
      (97L, "patient trial dose heart patient"),
      (1L,  "heart dose patient trial"),            // pure target vocab
      (2L,  "statute court appeal verdict"),        // pure off-target
      (3L,  "heart dose statute court"),            // mixed
      (4L,  "statute court appeal verdict statute court appeal verdict")
    ).toDF("doc_id", "text")
    val out = Curation.dsirSelect(docs, benchMod = 97, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val w = out.toMap
    // eval-slice docs are candidates' TARGET, never candidates themselves
    assert(out.forall(_._1 % 97 != 0))
    // monotone in target-likeness
    assert(w(1L) > w(3L) && w(3L) > w(2L), s"got $w")
    // pure target vocab scores positive, pure off-target negative
    assert(w(1L) > 0 && w(2L) < 0)
    // per-token ratios are length-additive: doubling an off-target doc
    // doubles its (negative) log weight
    // (2e-6 tolerance: each side rounds to 6 decimals independently)
    assert(math.abs(w(4L) - 2 * w(2L)) < 2e-6, s"${w(4L)} vs 2*${w(2L)}")
    // deterministic
    val again = Curation.dsirSelect(docs, benchMod = 97, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq == again.toSeq)
  }

  test("x96 dsirSelectHashed: equals exact DSIR when buckets are collision-free; model is fixed-width") {
    import spark.implicits._
    val docs = Seq(
      (0L,  "heart dose patient trial heart dose"),
      (97L, "patient trial dose heart patient"),
      (1L,  "heart dose patient trial"),
      (2L,  "statute court appeal verdict"),
      (3L,  "heart dose statute court"),
      (4L,  "statute court appeal verdict statute court appeal verdict")
    ).toDF("doc_id", "text")
    // the 8 planted tokens hash to 8 DISTINCT md5 3-hex prefixes
    // (precondition asserted), so bucket counts == token counts and the
    // hashed scores must EQUAL the exact x93 scores row for row
    val prefixes = Seq("heart", "dose", "patient", "trial",
      "statute", "court", "appeal", "verdict")
      .map(t => java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString.take(3))
    assert(prefixes.distinct.size == prefixes.size, s"fixture collision: $prefixes")
    val exact = Curation.dsirSelect(docs, benchMod = 97, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val hashed = Curation.dsirSelectHashed(docs, benchMod = 97, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(hashed == exact, s"hashed $hashed vs exact $exact")

    // the fixed-width claim on a real corpus: the model relation never
    // exceeds 16^3 buckets no matter the vocabulary
    val corpus = Tables.documents(spark, TestSpark.Sf0001)
    val buckets = corpus
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .select(substring(md5(col("t")), 1, 3).as("b")).distinct().count()
    assert(buckets <= 4096L)
  }

  test("x98 dashboard: covers exactly the bm25 query slice; no-signal rows are well-formed") {
    import spark.implicits._
    import graft.queries.CurationQueries
    val out = CurationQueries.decontamDashboard(spark, TestSpark.Sf0001).collect()
    val expectedIds = docs
      .filter(col("doc_id") % Curation.BenchMod === 0 &&
              col("doc_id") < Curation.BmQueryIdMax)
      .select("doc_id").as[Long].collect().toSet
    assert(out.map(_.getLong(0)).toSet == expectedIds) // full slice coverage
    out.foreach { r =>
      def l(i: Int) = r.getAs[Number](i).longValue
      val (span, grams, coll) = (l(1), l(2), l(3))
      val (t1doc, t1score) = (l(4), r.getDouble(5))
      assert(span >= 0 && grams >= 0 && coll >= 0)
      // a shared span implies shared grams and at least one colliding doc
      if (span > 0) assert(grams > 0 && coll > 0)
      // the sentinel contract: no retrieved neighbor <=> zero score
      assert((t1doc == -1L) == (t1score == 0.0))
    }
  }

  test("x100 signal agreement: equals an independent in-memory Pearson; values in [-1,1]") {
    import spark.implicits._
    import graft.queries.CurationQueries
    val out = CurationQueries.signalAgreement(spark, TestSpark.Sf0001).collect().head
    val q = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("v"))
      .as[(Long, Double)].collect().toMap
    val u = Curation.unigramScore(docs).select(col("doc_id"), col("xent"))
      .as[(Long, Double)].collect().toMap
    val b = Curation.bigramScore(docs).select(col("doc_id"), col("xent"))
      .as[(Long, Double)].collect().toMap
    val ids = (q.keySet intersect u.keySet intersect b.keySet).toSeq.sorted
    def pearson(x: Seq[Double], y: Seq[Double]): Double = {
      val n = x.size
      val (sx, sy) = (x.sum, y.sum)
      val (sxx, syy) = (x.map(v => v * v).sum, y.map(v => v * v).sum)
      val sxy = x.zip(y).map { case (a, c) => a * c }.sum
      (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    val (qs, us, bs) = (ids.map(q), ids.map(u), ids.map(b))
    assert(out.getLong(0) == ids.size.toLong)
    assert(math.abs(out.getDouble(1) - pearson(qs, us)) < 1e-5)
    assert(math.abs(out.getDouble(2) - pearson(qs, bs)) < 1e-5)
    assert(math.abs(out.getDouble(3) - pearson(us, bs)) < 1e-5)
    (1 to 3).foreach(i => assert(math.abs(out.getDouble(i)) <= 1.0))
  }

  test("x99 release gate: one row, each figure equals its source audit") {
    import graft.queries.ExtendedQueries
    val rows = ExtendedQueries.releaseGate(spark, TestSpark.Sf0001).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_docs") == docs.count())
    assert(r.getAs[Long]("n_leak_pairs") ==
      ExtendedQueries.splitLeakage(spark, TestSpark.Sf0001).count())
    assert(r.getAs[Long]("n_quarantined") ==
      ExtendedQueries.leakageQuarantine(spark, TestSpark.Sf0001).count())
    val distinctFps = docs.select(
      graft.functions.TextFunctions.fingerprint(col("text"))).distinct().count()
    assert(r.getAs[Long]("n_exact_dups") == docs.count() - distinctFps)
    val z = Curation.zipfFit(docs).collect().head
    assert(r.getAs[Double]("zipf_slope") == z.getDouble(1) &&
      r.getAs[Double]("zipf_r2") == z.getDouble(3))
    // n_repetitive == the x107 profile thresholded by the per-doc rule
    // (min-length floor + per-term coalesce, the repetitiveFlag contract)
    val expectedRep = Curation.repetitionProfile(docs)
      .filter(col("n_tokens") >= Curation.RepMinTokens &&
        (coalesce(col("top2_frac") > Curation.RepTop2Max, lit(false)) ||
         coalesce(col("top3_frac") > Curation.RepTop3Max, lit(false)) ||
         coalesce(col("dup5_frac") > Curation.RepDup5Max, lit(false))))
      .count()
    assert(r.getAs[Long]("n_repetitive") == expectedRep,
      s"n_repetitive=${r.getAs[Long]("n_repetitive")} profile says $expectedRep")
  }

  test("x105 clean splits: train never quarantined; totals reconcile with the corpus and x97") {
    import graft.queries.ExtendedQueries
    val out = ExtendedQueries.cleanSplits(spark, TestSpark.Sf0001).collect()
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
    // shipping + quarantined is a partition of the corpus
    assert(out.map(r => r.getLong(1) + r.getLong(3)).sum == docs.count())
    // the x97 rule never touches train (removing training data is
    // x37's dedup decision, not eval hygiene)
    assert(out.find(_.getString(0) == "train").get.getLong(3) == 0L)
    // quarantined total equals the x97 list
    assert(out.map(_.getLong(3)).sum ==
      ExtendedQueries.leakageQuarantine(spark, TestSpark.Sf0001).count())
  }

  test("x104 selection pipeline: every stage binds on a planted corpus; fixture result is stage-consistent") {
    import spark.implicits._
    val passage = (1 to 20).map(i => s"tok$i").mkString(" ")
    val planted = Seq(
      (1L, "a", passage),                       // clean survivor
      (2L, "a", "!!! ??? !!!"),                 // junk: quality gate drops it
      (3L, "b", s"$passage extra words here"),  // dup pair: same fingerprint...
      (4L, "b", s"$passage  extra words here"), // ...but doubled space lowers
                                                // tokenCount => quality differs
      (5L, "c", passage + " c1"),               // domain-cap source: 3 docs,
      (6L, "c", passage + " c2"),               // cap 2 keeps the two smallest
      (7L, "c", passage + " c3"),               // content hashes
      (8L, "d", (1 to 30).map(i => s"d$i").mkString(" ")), // budget source:
      (9L, "d", (1 to 30).map(i => s"e$i").mkString(" "))  // second doc busts it
    ).toDF("doc_id", "source", "text")
    // junk still scores ~0.51 (token-length term + zero stopwords), so
    // the gate must sit above it; budget 50 lets both c docs (21+21)
    // through but cuts d's second 30-token doc (30+30 > 50)
    val out = Curation.curationPipeline(planted,
      minQuality = 0.6, cap = 2, budget = 50).cache()
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(2L), "quality gate failed to drop the junk doc")
    // exactly ONE of the fingerprint-equal pair survives, and it is the
    // higher-quality member (the keeper rule, not first-id)
    val pair = planted.filter(col("doc_id").isin(3L, 4L))
      .select(col("doc_id"),
        round(graft.functions.TextFunctions.qualityScore(col("text")), 6).as("q"))
      .as[(Long, Double)].collect().toMap
    val winner = if (pair(3L) >= pair(4L)) 3L else 4L
    assert(pair(3L) != pair(4L), "fixture must make the dup pair's qualities differ")
    assert(ids.contains(winner) && !ids.contains(if (winner == 3L) 4L else 3L),
      s"keep-best dedup kept the wrong member: $ids (winner $winner)")
    // domain cap binds on source c
    assert(out.filter(col("source") === "c").count() == 2)
    // budget binds on source d: 30 tokens then +30 busts 35 (first kept)
    assert(out.filter(col("source") === "d").count() == 1)
    assert(ids.contains(1L))
    out.unpersist()

    // fixture run (default params): stage-consistency properties
    val full = Curation.curationPipeline(docs).cache()
    assert(full.count() > 0)
    assert(full.select("doc_id").distinct().count() == full.count())
    assert(full.filter(col("quality") < Curation.PipeMinQuality).count() == 0)
    val perSource = full.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= Curation.PipeDomainCap))
    // cum_tokens really is the running sum in doc_id order, and within
    // budget except possibly a lone oversized first doc
    val bad = full.filter(col("cum_tokens") > Curation.PipeTokenBudget &&
      col("cum_tokens") =!= col("n_tokens")).count()
    assert(bad == 0, "a budget-busting non-first doc survived")
    full.unpersist()
  }

  test("x106 release pipeline: near-dup stage and quarantine stage each remove docs the other keeps") {
    import spark.implicits._
    // split membership by Curation.splitOf (md5 of the id string):
    // 1,2,4,6 -> train; 5 -> val; 3 -> test. Two planted near-dup pairs:
    //  - (1,2): BOTH train, equal quality -> only the NEAR-DUP stage
    //    acts (doc_id tie-break keeps 1, removes 2); the quarantine
    //    never sees a same-split pair.
    //  - (4,5): train/val, 5 strictly higher quality (4 extra unique
    //    words raise the length term) -> the near-dup keeper IS 5, so
    //    only the QUARANTINE removes it (cross-split, non-train); 4
    //    falls to the near-dup stage (train members are never
    //    quarantined — x97's rule).
    // Singletons 3 and 6 survive. Neither stage subsumes the other.
    val a = "quick brown foxes jumped over seven lazy sleeping dogs near"
    val b = "silver quartz garnet beryl topaz jasper amber opal agate flint"
    val planted = Seq(
      (1L, "a", s"$a alpha"),
      (2L, "a", s"$a omega"),          // same token count as 1 => equal quality
      (4L, "b", s"$b coral"),
      (5L, "b", s"$b coral pearl onyx jade amethyst"), // more tokens => better
      (3L, "c", "completely distinct trigram content for the test split doc"),
      (6L, "c", "another entirely unrelated passage for the train singleton"),
      // a template flood (5-token phrase ×6 = 30 tokens ≥ the rule's
      // floor; every fraction breaches): shares no trigram with any
      // other doc and is no one's exact dup, so ONLY the stage-1
      // repetition rule can remove it — the x107-battery-as-filter
      // proof. (All OTHER planted docs sit under the 20-token floor,
      // so the rule never perturbs the pair-stage fixture.)
      (7L, "d", Seq.fill(6)("mint sage basil thyme dill").mkString(" "))
    ).toDF("doc_id", "source", "text")
    // preconditions the construction relies on
    val q = planted.select(col("doc_id"),
        round(graft.functions.TextFunctions.qualityScore(col("text")), 6).as("q"))
      .as[(Long, Double)].collect().toMap
    assert(q(1L) == q(2L), s"pair (1,2) must tie on quality: $q")
    assert(q(5L) > q(4L), s"doc 5 must outscore doc 4: $q")
    val splits = planted.select(col("doc_id"),
        Curation.splitOf(col("doc_id")).as("s")).as[(Long, String)].collect().toMap
    assert(splits.filter(_._1 <= 6L) == Map(1L -> "train", 2L -> "train",
      4L -> "train", 5L -> "val", 3L -> "test", 6L -> "train"),
      s"split fixture drifted: $splits") // doc 7 never reaches a pair stage

    val out = Curation.releasePipeline(planted, minQuality = 0.0,
      cap = 100, budget = 100000L).cache()
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 6L), s"survivors: $ids")
    // the split column the pipeline emits agrees with splitOf
    val outSplits = out.select("doc_id", "split").as[(Long, String)]
      .collect().toMap
    assert(outSplits == Map(1L -> "train", 3L -> "test", 6L -> "train"))
    out.unpersist()

    // with the near-dup threshold unreachable, BOTH pair stages go
    // quiet — every removal above came from them EXCEPT doc 7, which
    // only the stage-1 repetition rule explains (the pair stages are
    // off and it survives when the rule is silenced below)
    val loose = Curation.releasePipeline(planted, minQuality = 0.0,
      cap = 100, budget = 100000L, threshold = 1.1)
      .select("doc_id").as[Long].collect().toSet
    assert(loose == Set(1L, 2L, 3L, 4L, 5L, 6L), s"got $loose")

    // rule silenced (fractions are capped at 1, so thresholds ≥ 1
    // never fire): doc 7 is re-admitted — no other stage touches it
    val repSilenced = Curation.releasePipeline(planted, minQuality = 0.0,
      cap = 100, budget = 100000L, threshold = 1.1,
      repTop2 = 2.0, repTop3 = 2.0, repDup5 = 2.0)
      .select("doc_id").as[Long].collect().toSet
    assert(repSilenced == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L), s"got $repSilenced")

    // algebraic reduction: with the pair stages AND the repetition rule
    // silenced, x106 IS x104 (same survivors, same budgets) — the
    // composition adds stages, it never perturbs the ones it inherited
    val reduced = Curation.releasePipeline(docs, threshold = 1.1,
        repTop2 = 2.0, repTop3 = 2.0, repDup5 = 2.0)
      .drop("split").orderBy("source", "doc_id").collect().toSeq
    val x104rows = Curation.curationPipeline(docs)
      .orderBy("source", "doc_id").collect().toSeq
    assert(reduced == x104rows,
      "silenced x106 must equal x104 row-for-row")

    // default params on the sf0.001 fixture: x106 ⊆ x104's survivor set
    // is NOT an invariant (the cap re-opens slots), but the pipeline
    // must stay total, deduped, within cap and budget — x104's own
    // stage-consistency contract
    val full = Curation.releasePipeline(docs).cache()
    assert(full.count() > 0)
    assert(full.select("doc_id").distinct().count() == full.count())
    assert(full.filter(col("quality") < Curation.PipeMinQuality).count() == 0)
    assert(full.groupBy("source").count().collect()
      .forall(_.getLong(1) <= Curation.PipeDomainCap))
    assert(full.filter(col("cum_tokens") > Curation.PipeTokenBudget &&
      col("cum_tokens") =!= col("n_tokens")).count() == 0)
    full.unpersist()
  }

  test("x107 repetition profile: exact planted values, NULL on short docs, kernel == naive recomputation") {
    import spark.implicits._
    val planted = Seq(
      // alternating pair: top 2-gram "a b" covers 3 of 5 positions ->
      // 6/5 capped at 1.0; no 5-gram repeats (both positions distinct)
      (1L, "a b a b a b"),
      // period-5 template: EVERY 5-gram position duplicated -> 1.0
      (2L, "x y z w v x y z w v x y z w v"),
      // all-distinct tokens: top2 = 2/6, top3 = 3/5, dup5 = 0
      (3L, "q w e r t y u"),
      // shorter than every gram: NULLs, not NaN (n_tokens = 1: the
      // family's split-on-space counts empty text as one empty token)
      (4L, ""),
      (5L, "lone")
    ).toDF("doc_id", "text")
    val out = Curation.repetitionProfile(planted).orderBy("doc_id").collect()
    def row(i: Int) = out(i)
    assert(row(0).getLong(1) == 6 && row(0).getDouble(2) == 1.0 &&
      row(0).getDouble(3) == 1.0 && row(0).getDouble(4) == 0.0, row(0).toString)
    assert(row(1).getDouble(4) == 1.0, "period-5 template must read dup5 = 1")
    assert(math.abs(row(2).getDouble(2) - 0.333333) < 1e-9 &&
      math.abs(row(2).getDouble(3) - 0.6) < 1e-9 &&
      row(2).getDouble(4) == 0.0, row(2).toString)
    Seq(3, 4).foreach { i =>
      assert(row(i).isNullAt(2) && row(i).isNullAt(3) && row(i).isNullAt(4),
        s"short doc must yield NULL signals: ${row(i)}")
    }

    // randomized differential: the codegen'd multiplicity kernels agree
    // with a naive in-memory recomputation on arbitrary small-alphabet
    // strings (seeded — deterministic across runs)
    val rnd = new scala.util.Random(107)
    def naiveCounts(s: String, n: Int): Map[String, Int] = {
      val t = s.split(" ", -1)
      if (t.length < n) Map.empty
      else t.sliding(n).map(_.mkString(" ")).toSeq.groupBy(identity)
        .map { case (k, v) => k -> v.size }
    }
    (1 to 60).foreach { _ =>
      val s = Seq.fill(1 + rnd.nextInt(30))(('a' + rnd.nextInt(3)).toChar.toString)
        .mkString(" ")
      (1 to 5).foreach { n =>
        val m = naiveCounts(s, n)
        assert(graft.functions.NgramKernel.topNgramCount(s, n) ==
          (if (m.isEmpty) 0L else m.values.max.toLong), s"top($n) on '$s'")
        assert(graft.functions.NgramKernel.dupNgramPositions(s, n) ==
          m.values.filter(_ > 1).sum.toLong, s"dup($n) on '$s'")
      }
    }

    // fixture run: totality + signals live in [0, 1]
    val full = Curation.repetitionProfile(docs).cache()
    assert(full.count() == docs.count())
    Seq("top2_frac", "top3_frac", "dup5_frac").foreach { c =>
      assert(full.filter(col(c) < 0.0 || col(c) > 1.0).count() == 0, c)
    }
    full.unpersist()
  }

  test("x103 snapshot drift: zero on identical snapshots; positive/symmetric JS on a shift; equals in-memory recomputation") {
    import spark.implicits._
    val a = Seq((1L, "alpha beta beta gamma"), (2L, "delta epsilon alpha"))
      .toDF("doc_id", "text")
    // identical snapshots: every joint-vocab count matches, p = q
    // exactly per token, so every divergence is EXACTLY 0
    val same = Curation.snapshotDrift(a, a).collect().head
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0 &&
      same.getDouble(5) == 0.0, s"identical snapshots must read 0 drift: $same")

    // a genuinely shifted snapshot
    val b = Seq((1L, "alpha zeta zeta zeta"), (2L, "eta theta theta iota"))
      .toDF("doc_id", "text")
    val ab = Curation.snapshotDrift(a, b).collect().head
    val ba = Curation.snapshotDrift(b, a).collect().head
    assert(ab.getDouble(3) > 0.0 && ab.getDouble(4) > 0.0 && ab.getDouble(5) > 0.0)
    // JS is symmetric; the two KLs swap roles
    assert(ab.getDouble(5) == ba.getDouble(5), "JS must be symmetric")
    assert(ab.getDouble(3) == ba.getDouble(4) && ab.getDouble(4) == ba.getDouble(3))
    // JS bounded by ln 2
    assert(ab.getDouble(5) <= math.log(2.0) + 1e-9)

    // independent in-memory recomputation over the same smoothing
    def counts(rows: Seq[String]) = rows.flatMap(
      _.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (ca, cb) = (counts(Seq("alpha beta beta gamma", "delta epsilon alpha")),
                    counts(Seq("alpha zeta zeta zeta", "eta theta theta iota")))
    val joint = (ca.keySet ++ cb.keySet).toSeq
    val (no, nn, v) = (ca.values.sum, cb.values.sum, joint.size.toLong)
    val ps = joint.map(t => (ca.getOrElse(t, 0L) + 1).toDouble / (no + v))
    val qs = joint.map(t => (cb.getOrElse(t, 0L) + 1).toDouble / (nn + v))
    val klAB = ps.zip(qs).map { case (p, q) => p * math.log(p / q) }.sum
    val js = ps.zip(qs).map { case (p, q) =>
      val m = (p + q) / 2; (p * math.log(p / m) + q * math.log(q / m)) / 2 }.sum
    assert(math.abs(ab.getDouble(3) - klAB) < 1e-5, s"KL ${ab.getDouble(3)} vs $klAB")
    assert(math.abs(ab.getDouble(5) - js) < 1e-5, s"JS ${ab.getDouble(5)} vs $js")
    assert(same.getLong(0) == counts(Seq("alpha beta beta gamma",
      "delta epsilon alpha")).size.toLong)
  }

  test("x101 hashed bigram model: fixed-width 256-bucket bound; n_bigrams identical to x87") {
    import spark.implicits._
    val full = Curation.bigramScore(docs).select("doc_id", "n_bigrams")
      .as[(Long, Long)].collect().toMap
    val hashed = Curation.bigramScoreHashed(docs)
      .select("doc_id", "n_bigrams", "xent").collect()
    assert(hashed.nonEmpty && hashed.length == full.size)
    hashed.foreach { r =>
      assert(full(r.getLong(0)) == r.getLong(1),
        "bucketing renames tokens, it must never change bigram counts")
      assert(!r.isNullAt(2) && !r.getDouble(2).isNaN && r.getDouble(2) > 0.0,
        s"hashed xent must stay finite and positive: $r")
    }
    // the fixed-width proof: every model key is a 2-hex md5 prefix, so
    // the bigram model is <= 256² rows and the context/unigram models
    // <= 256 rows at ANY corpus size — by the shape of the key, not by
    // the luck of this fixture
    val buckets = docs.select(explode(transform(
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)),
        t => substring(md5(t), 1, 2))).as("b"))
      .distinct().as[String].collect()
    assert(buckets.forall(_.matches("[0-9a-f]{2}")),
      s"non-2-hex bucket id found: ${buckets.filterNot(_.matches("[0-9a-f]{2}")).take(3).mkString(",")}")
    assert(buckets.length <= 256)
  }

  test("x99 gate verdict: clean corpus passes; floods trip exactly the gauges that own them") {
    import spark.implicits._
    import graft.queries.ExtendedQueries
    def b(r: org.apache.spark.sql.Row, name: String) = r.getAs[Boolean](name)
    val allBreaches = Seq("breach_exact_dups", "breach_leakage",
      "breach_quarantine", "breach_repetition", "breach_zipf", "breach_quality")

    // a genuinely clean corpus: seeded-random docs over a Zipf(0.8)
    // vocabulary — global spectrum Zipfian (slope in the envelope, r2
    // high), no doc internally repetitive (a token repeats, its BIGRAMS
    // rarely do), no dups, no cross-split near-dups. The old x89
    // construction (one token flooded per doc) is no longer usable as
    // "clean": the repetition gauge correctly reads a doc of one
    // repeated token as a template flood.
    val rnd = new scala.util.Random(42)
    val V = 2000
    val weights = (1 to V).map(r => math.pow(r, -0.8))
    val cum = weights.scanLeft(0.0)(_ + _).tail.toArray
    def draw(): Int = {
      val x = rnd.nextDouble() * cum.last
      val i = java.util.Arrays.binarySearch(cum, x)
      (if (i >= 0) i else -i - 1) + 1
    }
    val cleanRows = (1 to 200).map { d =>
      (d.toLong, Seq.fill(30)(s"w${draw()}").mkString(" "))
    }
    val clean = cleanRows.toDF("doc_id", "text")
    val ok = ExtendedQueries.releaseGateOn(clean).collect().head
    allBreaches.foreach(c => assert(!b(ok, c), c))
    assert(b(ok, "pass"))

    // the SAME clean corpus plus 5 distinct template-flood docs (a
    // 5-token phrase repeated 6×; suffixed per doc so they are neither
    // exact dups nor near-dups of anything): every added doc breaches
    // the per-doc rule on all three fractions, 5/205 > the 1% budget —
    // the repetition gauge, and ONLY the repetition gauge, trips
    val spammed = (cleanRows ++ (1 to 5).map { d =>
      val phrase = s"spam$d ham$d eggs$d bacon$d toast$d"
      ((200 + d).toLong, Seq.fill(6)(phrase).mkString(" "))
    }).toDF("doc_id", "text")
    val rep = ExtendedQueries.releaseGateOn(spammed).collect().head
    assert(rep.getAs[Long]("n_repetitive") == 5L)
    assert(b(rep, "breach_repetition"),
      "template-flood docs must trip the repetition gauge")
    allBreaches.filterNot(_ == "breach_repetition")
      .foreach(c => assert(!b(rep, c), s"$c must not trip"))
    assert(!b(rep, "pass"))

    // a FLAT spectrum (every count equal): varY = 0 => r2 NULL by the
    // degenerate-input contract, slope 0 outside the envelope — the
    // zipf gauge must trip and the gate must name it. The construction
    // floods one token per doc, so the repetition gauge fires too (its
    // own correct verdict on this corpus); the quality/dup/leak gauges
    // stay clean.
    val uniform = (1 to 10)
      .map(r => (r.toLong, Seq.fill(252)(s"tok$r").mkString(" ")))
      .toDF("doc_id", "text")
    val bad = ExtendedQueries.releaseGateOn(uniform).collect().head
    assert(bad.isNullAt(bad.fieldIndex("zipf_r2")),
      "flat spectrum must yield NULL r2, not NaN")
    assert(b(bad, "breach_zipf"), "uniform spectrum must trip the zipf gauge")
    assert(b(bad, "breach_repetition"),
      "a one-token-per-doc flood is the definition of repetitive")
    Seq("breach_exact_dups", "breach_leakage", "breach_quarantine",
        "breach_quality").foreach(c => assert(!b(bad, c), s"$c must not trip"))
    assert(!b(bad, "pass"))
  }

  test("x99 gate on an EMPTY corpus: unjudgeable blocks — every breach true, pass false") {
    import spark.implicits._
    import graft.queries.ExtendedQueries
    // n_docs = 0 makes every rate fraction 0/0: without the explicit
    // n_docs = 0 guard Spark's double division yields NaN (NaN > t =
    // false => the breach silently waves through) while DuckDB yields
    // NULL — the engines would disagree on the degenerate input. The
    // contract: a corpus the gate cannot judge BLOCKS.
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = ExtendedQueries.releaseGateOn(empty).collect().head
    def b(name: String) = r.getAs[Boolean](name)
    assert(r.getAs[Long]("n_docs") == 0L)
    Seq("breach_exact_dups", "breach_leakage", "breach_quarantine",
        "breach_repetition", "breach_zipf", "breach_quality").foreach(c =>
      assert(b(c), s"$c must be TRUE (not NULL/false) on the empty corpus"))
    assert(!b("pass"), "an empty corpus must never pass the gate")
  }

  test("x89/x100 zero-variance guard: degenerate inputs yield NULLs, never NaN") {
    import spark.implicits._
    // one distinct token => varX = 0 => the whole fit is undefined
    val mono = Seq((1L, "aaa aaa aaa aaa")).toDF("doc_id", "text")
    val z = Curation.zipfFit(mono).collect().head
    assert(z.getLong(0) == 1L)
    assert(z.isNullAt(1) && z.isNullAt(2) && z.isNullAt(3),
      s"degenerate fit must be NULL: $z")
    // a single document: n*sxx - sx*sx = v^2 - v^2 = 0 EXACTLY (the
    // one constant-signal case free of fp-summation residue), so every
    // pairwise correlation is undefined (NULL), n_docs still reported
    val const = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val sa = graft.queries.CurationQueries.signalAgreementOn(const).collect().head
    assert(sa.getLong(0) == 1L)
    (1 to 3).foreach(i => assert(sa.isNullAt(i), s"corr $i must be NULL: $sa"))
  }

  test("x89 zipfFit: exact power-law corpora fit slope -1 and -2 with r2 1") {
    import spark.implicits._
    // counts K/r are EXACT integers for K = 2520, r = 1..10, so
    // ln(cnt_r) = ln(K) - ln(r) exactly: OLS must recover slope -1,
    // intercept ln(K), r2 1 up to double rounding.
    val K = 2520
    val zipf = (1 to 10)
      .map(r => (r.toLong, Seq.fill(K / r)(s"tok$r").mkString(" ")))
      .toDF("doc_id", "text")
    val f = Curation.zipfFit(zipf, k = 10).collect().head
    assert(f.getLong(0) == 10L)
    assert(math.abs(f.getDouble(1) + 1.0) < 1e-6, s"slope ${f.getDouble(1)}")
    assert(math.abs(f.getDouble(2) - math.log(K.toDouble)) < 1e-6)
    assert(f.getDouble(3) > 1.0 - 1e-9, s"r2 ${f.getDouble(3)}")

    // a steeper spectrum (counts K2/r², exact integers for K2 = 3600,
    // r = 1..6) must fit slope -2 — the gauge separates spectra, not
    // just "is it Zipf"
    val K2 = 3600
    val steep = (1 to 6)
      .map(r => (r.toLong, Seq.fill(K2 / (r * r))(s"tok$r").mkString(" ")))
      .toDF("doc_id", "text")
    val g = Curation.zipfFit(steep, k = 6).collect().head
    assert(math.abs(g.getDouble(1) + 2.0) < 1e-6, s"slope ${g.getDouble(1)}")
    assert(g.getDouble(3) > 1.0 - 1e-9)
  }

  test("x112 ccnet buckets: per-lang tercile monotonicity, totality, approx twin agrees, empty input") {
    import spark.implicits._
    val b = Curation.ccnetBuckets(docs).cache()
    // totality: exactly the x87-scorable docs, each bucketed once
    assert(b.count() == Curation.bigramScore(docs).count())
    assert(b.select("doc_id").distinct().count() == b.count())
    // tercile semantics: within every language, every head xent <= t1 <
    // every middle xent <= t2 < every tail xent — so the bucket bands
    // are totally ordered (max(head) <= min(middle) <= max(middle) <=
    // min(tail) wherever both bands are non-empty)
    val bands = b.groupBy("lang", "bucket")
      .agg(min("xent").as("lo"), max("xent").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    val langs = bands.keys.map(_._1).toSet
    for (l <- langs) {
      for ((a, c) <- Seq(("head", "middle"), ("middle", "tail")))
        (bands.get((l, a)), bands.get((l, c))) match {
          case (Some((_, hiA)), Some((loC, _))) =>
            assert(hiA <= loC, s"$l: $a band [$hiA] overlaps $c band [$loC]")
          case _ => // a band may be empty on tiny language groups
        }
      // the dominant bands exist: at least head is always non-empty
      assert(bands.contains((l, "head")), s"$l has no head bucket")
    }
    // the t-digest scale twin agrees with the exact thresholds on almost
    // every doc (divergence is confined to docs at a tercile boundary)
    val ap = Curation.ccnetBuckets(docs, approx = true)
      .select(col("doc_id"), col("bucket").as("ab"))
    val joined = b.join(ap, "doc_id")
    val agree = joined.filter(col("bucket") === col("ab")).count().toDouble /
      joined.count()
    assert(agree >= 0.98, s"approx-percentile bucket agreement $agree below 0.98")
    // the 100 TB composition (fixed-width hashed model + t-digest
    // thresholds) honors the same contracts on ITS OWN score: total over
    // the scorable docs, bands monotone per language (the hashed xent
    // differs by design — collisions fold rare transitions — so
    // value-agreement with the exact twin is not a contract)
    val h = Curation.ccnetBuckets(docs, approx = true, hashed = true).cache()
    assert(h.count() == b.count())
    val hBands = h.groupBy("lang", "bucket")
      .agg(min("xent").as("lo"), max("xent").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    val hLangs: Set[String] = hBands.keys.map(_._1).toSet
    for (l <- hLangs) {
      for ((a, c) <- Seq(("head", "middle"), ("middle", "tail")))
        (hBands.get((l, a)), hBands.get((l, c))) match {
          case (Some((_, hiA)), Some((loC, _))) =>
            assert(hiA <= loC, s"hashed $l: $a band [$hiA] overlaps $c [$loC]")
          case _ =>
        }
    }
    h.unpersist()
    // empty corpus: empty output, no throw (totality contract)
    val empty = docs.filter(lit(false))
    assert(Curation.ccnetBuckets(empty).count() == 0)
    b.unpersist()
  }

  test("x125 trained quality classifier: loss descends, separates a two-domain corpus, score feeds the Pareto keep rule") {
    import spark.implicits._
    // a corpus with REAL separation (the fixture's target slice is a
    // distributional stand-in, so the learner is proven on constructed
    // domains): target-slice docs speak wiki-ish vocabulary, the rest
    // spam-ish, with per-doc noise tokens so the fit can't just memorize
    val docsT = (0L until 80L).map { i =>
      val t =
        if (i % 4 == 0)
          s"reference article citation neutral summary section v$i prose"
        else
          s"buy cheap click winner prize now offer${i % 7} deal$i"
      (i, t)
    }.toDF("doc_id", "text")
    // (a) the descent is real: mean log-loss strictly falls over the fit
    val feats = Curation.qcFeatures(docsT, benchMod = 4).localCheckpoint()
    val (_, _, losses) = Curation.qcFit(feats, iters = 30, lr = 1.0)
    assert(losses.head > losses.last,
      s"loss did not descend: ${losses.head} -> ${losses.last}")
    assert(losses.last < losses.head * 0.7,
      s"descent too shallow: $losses")
    // (b) separation: rank the trained scores by label (AUC)
    val scored = Curation.qualityClassifierTrained(docsT, benchMod = 4,
        iters = 30, lr = 1.0)
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    val pos = scored.filter(_._1 == 1).map(_._2)
    val neg = scored.filter(_._1 == 0).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty)
    val auc = pos.map(p =>
      neg.count(_ < p) + 0.5 * neg.count(_ == p)).sum /
      (pos.length.toDouble * neg.length)
    assert(auc >= 0.9, s"trained classifier AUC $auc below 0.9")
    // (c) the x119 consumption contract: the score is a valid Pareto q —
    // the keep rule u·(2−q)^9 < 1 rejects classifier-preferred docs
    // LESS at every u, i.e. their rejection mass (2−q)^9 is smaller
    val mass = scored.map { case (y, q) => (y, math.pow(2.0 - q, 9)) }
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val mT = mean(mass.filter(_._1 == 1).map(_._2).toSeq)
    val mO = mean(mass.filter(_._1 == 0).map(_._2).toSeq)
    assert(mT < mO,
      s"target docs carry MORE Pareto rejection mass ($mT >= $mO)")
    // (d) the real-fixture entry path runs end-to-end and scores every
    // tokenized doc exactly once
    val fixture = Curation.qualityClassifierTrained(docs, iters = 5)
    assert(fixture.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    assert(fixture.count() > 0)
  }

  test("x133 stored model: load-don't-refit serves the fit's exact scores; a stale fingerprint refits, never serves silently") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_x133_spec_").toString + "/model"
    val docsT = (0L until 40L).map { i =>
      val t =
        if (i % 4 == 0) s"reference article citation neutral summary v$i"
        else s"buy cheap click winner prize offer${i % 7} deal$i"
      (i, t)
    }.toDF("doc_id", "text")
    // first use fits and persists
    val (w1, b1, fitted1) = Curation.qcLoadOrFit(docsT, root,
      benchMod = 4, iters = 10, lr = 1.0)
    assert(fitted1, "empty store must fit")
    // second use LOADS — the doubles round-trip parquet losslessly, so
    // the stored-weights scores equal the fit-run scores EXACTLY
    val (w2, b2, fitted2) = Curation.qcLoadOrFit(docsT, root,
      benchMod = 4, iters = 10, lr = 1.0)
    assert(!fitted2, "matching fingerprint must load, not refit")
    assert(w1.toSeq == w2.toSeq && b1 == b2,
      "stored weights diverged from the fitted ones")
    val run1 = Curation.qualityClassifierStored(docsT, root, benchMod = 4,
      iters = 10, lr = 1.0).collect().toSeq
    val run2 = Curation.qualityClassifierStored(docsT, root, benchMod = 4,
      iters = 10, lr = 1.0).collect().toSeq
    assert(run1 == run2, "stored-model serves must be run-identical")
    // x125 twin at the same weights: the serve tail is ONE definition
    val viaServe = Curation.qcServeScores(
        Curation.qcFeatures(docsT, benchMod = 4), w1, b1)
      .orderBy("doc_id").collect().toSeq
    assert(run1 == viaServe)
    // staleness: a mutated corpus must REFIT (fingerprint mismatch) —
    // never score the new corpus with the old weights
    val mutated = docsT.withColumn("text",
      concat(col("text"), lit(" drifted")))
    val (_, _, fitted3) = Curation.qcLoadOrFit(mutated, root,
      benchMod = 4, iters = 10, lr = 1.0)
    assert(fitted3, "stale fingerprint must refit")
    // and the refit overwrote the store: the ORIGINAL corpus now
    // mismatches and refits in turn
    val (_, _, fitted4) = Curation.qcLoadOrFit(docsT, root,
      benchMod = 4, iters = 10, lr = 1.0)
    assert(fitted4, "store must hold the LAST-fitted corpus's model")
    // a torn save (marker removed) is treated as absent, not served
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root, "_FP"), false)
    assert(graft.store.ModelStore.load(spark, root).isEmpty,
      "a store without its completeness marker must read as absent")
    // the registry composition keeps the x130 admission stage verbatim:
    // every kept row's accept_key re-derives under the closed-form rule
    val kept = Curation.paretoClassifierSampleStored(docsT, root,
      benchMod = 4, iters = 10, lr = 1.0).collect()
    assert(kept.nonEmpty)
    kept.foreach { r => assert(r.getDouble(3) < 1.0) }
  }

  test("x133 O(metadata) staleness: steady-state load runs NO corpus-sized fingerprint scan; a rewritten-identical corpus revalidates by rows once; mutation still refits") {
    import spark.implicits._
    import graft.store.ModelStore
    val base = java.nio.file.Files
      .createTempDirectory("graft_x133_meta_").toString
    val corpusDir = s"$base/corpus"; val root = s"$base/model"
    def rows(suffix: String) = (0L until 40L).map { i =>
      val t =
        if (i % 4 == 0) s"reference article citation neutral summary v$i$suffix"
        else s"buy cheap click winner prize offer${i % 7} deal$i$suffix"
      (i, t)
    }
    rows("").toDF("doc_id", "text").coalesce(1).write.parquet(corpusDir)
    def docs = spark.read.parquet(corpusDir)
    def fitOnce() = Curation.qcLoadOrFit(docs, root,
      benchMod = 4, iters = 5, lr = 1.0)

    val (w1, _, fitted1) = fitOnce()
    assert(fitted1, "empty store must fit")
    val scans0 = ModelStore.fpScans.get()
    // steady state: the file-metadata record validates the store with
    // no Spark job — the VERDICT r18 contract (at 100 TB the row
    // fingerprint would dwarf the serve it amortizes)
    val (w2, _, fitted2) = fitOnce()
    assert(!fitted2 && w1.toSeq == w2.toSeq)
    assert(ModelStore.fpScans.get() == scans0,
      "steady-state load ran a corpus-sized fingerprint scan")
    // rewrite with IDENTICAL rows: file list changes, rows do not — one
    // full-scan revalidation, NO refit, and the meta record refreshes
    rows("").toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(corpusDir)
    val (w3, _, fitted3) = fitOnce()
    assert(!fitted3, "identical rows after a file rewrite must load, not refit")
    assert(w1.toSeq == w3.toSeq)
    assert(ModelStore.fpScans.get() == scans0 + 1,
      "a file rewrite must revalidate by rows exactly once")
    val (_, _, fitted4) = fitOnce()
    assert(!fitted4)
    assert(ModelStore.fpScans.get() == scans0 + 1,
      "the refreshed meta record must restore the no-scan steady state")
    // mutation: staleness stays loud through the metadata tier
    rows(" drifted").toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(corpusDir)
    val (_, _, fitted5) = fitOnce()
    assert(fitted5, "a mutated corpus must refit — never silently stale")
  }
}
