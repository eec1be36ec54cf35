package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.VectorFunctions

/** Dedup-family invariants: exact keeper semantics, MinHash recall on
  * planted near-duplicates, the SimHash pigeonhole recall guarantee, and
  * LSH-vs-exact recall for embedding near-dup. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  /** Deterministic 40-word doc from a seed. */
  private def doc(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(40)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
  }

  test("exact dedup keeps exactly one row (smallest id) per normalized text") {
    val df = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "different text entirely"),
      (4L, "HELLO WORLD")).toDF("doc_id", "text")
    val kept = Dedup.exact(df, "text", "doc_id").select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L)) // 2 and 4 normalize to doc 1's text
  }

  test("minhash finds planted near-duplicates and nothing else") {
    val base = doc(1)
    val nearDup = base.split(" ").updated(39, "zulu").mkString(" ") // last word changed
    val docs = (Seq((100L, base), (101L, nearDup), (102L, base)) ++
      (0 until 20).map(i => (i.toLong, doc(i + 10)))).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 101L)) && pairs.contains((100L, 102L)) && pairs.contains((101L, 102L)))
    // random docs share few trigrams — no spurious pairs at 0.7
    assert(pairs.forall { case (a, b) => a >= 100L && b >= 100L })
    // and the exact-dup pair has jaccard exactly 1.0
    val j = Dedup.minhashNearDups(docs, threshold = 0.7)
      .filter(col("id_a") === 100 && col("id_b") === 102)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhash 8-chunk banding: output EQUALS brute-force hamming<=7 pairs (recall 1.0)") {
    val docs = (Seq((100L, doc(1)), (101L, doc(1)), // exact dup → hamming 0
      (102L, doc(1).split(" ").updated(0, "zulu").mkString(" "))) ++ // near dup
      (0 until 15).map(i => (i.toLong, doc(i + 50)))).toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(docs).as[(Long, Long, Long)].collect()
      .map { case (id, hi, lo) => id -> (hi, lo) }.toMap
    val expected = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      if java.lang.Long.bitCount(sigs(a)._1 ^ sigs(b)._1) +
        java.lang.Long.bitCount(sigs(a)._2 ^ sigs(b)._2) <= 7
    } yield (a, b)).toSet
    val actual = Dedup.simhashNearDups(docs, maxHamming = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(actual == expected)          // exact: guaranteed recall AND exact verify
    assert(expected.contains((100L, 101L))) // the planted exact dup is in there
  }

  test("simhash bucket cap binds: a saturated chunk bucket is excluded from pair generation") {
    // 12 identical docs saturate every bucket they touch under cap 5 —
    // zero pairs survive; under the default cap they are all pairs.
    val docs = (0 until 12).map(i => (i.toLong, doc(1))).toDF("doc_id", "text")
    assert(Dedup.simhashNearDups(docs, maxHamming = 7, maxBucketSize = 5).count() === 0L)
    assert(Dedup.simhashNearDups(docs, maxHamming = 7).count() === 66L)
  }

  test("simhash rejects maxHamming beyond the banding guarantee") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] {
      Dedup.simhashNearDups(docs, maxHamming = 8)
    }
  }

  test("embedding exact near-dup refuses an over-bound corpus (O(n^2) guard)") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(emb, maxRows = 10)
    }
    assert(e.getMessage.contains("embeddingNearDupsLsh"))
  }

  test("winnowing rejects a non-integral id column with a clear message") {
    val docs = Seq(("a", "some text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.winnowingOverlaps(docs)
    }
    assert(e.getMessage.contains("integral id column"))
  }

  test("embedding LSH near-dup: recall >= 0.5 vs the exact baseline at threshold 0.3") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val exact = Dedup.embeddingNearDups(emb, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupsLsh(emb, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact)) // precision 1.0: every LSH pair is cosine-verified
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall below 0.5 (${lsh.size}/${exact.size})")
  }

  test("x117 fixed-planes pair generator equals the adaptive path where adaptive resolves to 4") {
    // at sf0.001 (500 vectors) the adaptive count is max(4, ceil(log2(500/64))) = 4,
    // so the hash-checked fixed twin and the rows-only adaptive entry must
    // be row-identical there — the algebraic reduction pinning that the twin
    // exercises the SAME machinery
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    def rows(planes: Int): Set[(Long, Long)] =
      Dedup.embeddingNearDupsLsh(emb, threshold = 0.3, planes = planes)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val adaptive = rows(0)
    val fixed = rows(4)
    assert(adaptive == fixed && fixed.nonEmpty)
  }

  test("winnowing: a shared passage of >= w+k-1 tokens is always detected") {
    val passage = "quick brown foxes jump over the lazy sleeping dog tonight again"
    val docs = Seq(
      (1L, s"${doc(70)} $passage ${doc(71)}"),
      (2L, s"${doc(72)} $passage"),
      (3L, doc(73)), (4L, doc(74))).toDF("doc_id", "text")
    val pairs = Dedup.winnowingOverlaps(docs, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"shared passage missed: $pairs")
    // kernel: determinism + fingerprint shape
    import graft.functions.TextFunctions.winnow
    val fp = winnow(s"${doc(70)} $passage ${doc(71)}").toSeq
    assert(fp.nonEmpty && fp == fp.sorted && fp.distinct == fp)
    assert(fp == winnow(s"${doc(70)} $passage ${doc(71)}").toSeq)
    // the winnowing guarantee itself: shared run >= w+k-1 tokens (here 11
    // > 4+3-1) shares at least one selected fingerprint
    assert(winnow(s"${doc(72)} $passage").toSet.intersect(fp.toSet).nonEmpty)
    // short docs: below k tokens → empty; below w grams → single min
    assert(winnow("a b").isEmpty)
    assert(winnow("a b c d").length == 1)
  }

  test("ngram jaccard: shared-shingle blocking never emits zero-overlap pairs") {
    val docs = Seq(
      (1L, "w x y z w x y"), (2L, "w x y q r s t"), (3L, "completely different words here now")
    ).toDF("doc_id", "text")
    val out = Dedup.ngramJaccardTopK(docs, n = 3, k = 10)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.forall(_._3 > 0.0))
    assert(out.map(t => (t._1, t._2)).toSet == Set((1L, 2L))) // only the w-x-y sharers
  }

  test("df-capped pairs: boilerplate shingle prunes candidates, values stay exact") {
    // 6 docs: a/b are genuine near-dups (share rare shingles); EVERY doc
    // carries the same boilerplate tail, so 'p q r' has df = 6. With
    // maxDf = 5 the boilerplate can't generate candidates; a-b still
    // qualify via their rare shingles, and their jaccard must equal the
    // uncapped (exact) value — the cap restricts CANDIDATES, not math.
    val boiler = "p q r p q r"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $boiler"),
      (2L, s"alpha beta gamma delta epsilon eta $boiler"),
      (3L, s"one two three four five six $boiler"),
      (4L, s"seven eight nine ten eleven twelve $boiler"),
      (5L, s"red orange yellow green blue indigo $boiler"),
      (6L, s"cat dog bird fish horse goat $boiler")
    ).toDF("doc_id", "text")

    val uncapped = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.1)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    val capped = Dedup.ngramJaccardPairsCapped(docs, n = 3, threshold = 0.1, maxDf = 5)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap

    // uncapped: all 15 pairs share boilerplate shingles → all candidates
    assert(uncapped.keySet.size == 15, s"fixture broken: ${uncapped.keySet}")
    // capped: only the genuine near-dup pair survives candidate generation
    assert(capped.keySet == Set((1L, 2L)), s"got ${capped.keySet}")
    // and its similarity is the EXACT full-shingle-set jaccard
    assert(math.abs(capped((1L, 2L)) - uncapped((1L, 2L))) < 1e-12)

    // a cap that never binds reproduces the uncapped operator exactly
    val loose = Dedup.ngramJaccardPairsCapped(docs, n = 3, threshold = 0.1, maxDf = 100)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    assert(loose.keySet == uncapped.keySet)
    loose.foreach { case (k, j) => assert(math.abs(j - uncapped(k)) < 1e-12) }
  }

  test("containment: embedded quote scores 1.0 one-way where Jaccard is near zero") {
    // article: 60 unique words → 58 unique trigrams; quote: its words 20..29
    // verbatim → every quote trigram is an article trigram (containment
    // quote→article = 1.0) while Jaccard = 8/58 ≈ 0.14.
    val words = (0 until 60).map(i => s"w$i")
    val article = words.mkString(" ")
    val quote = words.slice(20, 30).mkString(" ")
    val docs = (Seq((1L, article), (2L, quote)) ++
      (10 until 20).map(i => (i.toLong, doc(i)))).toDF("doc_id", "text")

    val cont = Dedup.ngramContainmentPairsCapped(docs, n = 3, threshold = 0.8, maxDf = 100)
      .as[(Long, Long, Double, Double)].collect()
      .map { case (a, b, ab, ba) => (a, b) -> ((ab, ba)) }.toMap
    assert(cont.keySet == Set((1L, 2L)), s"got ${cont.keySet}")
    val (aInB, bInA) = cont((1L, 2L))
    assert(bInA == 1.0)                      // quote (b) fully inside article
    assert(aInB == 8.0 / 58.0)               // article barely inside quote
    // the same pair is INVISIBLE to a symmetric Jaccard threshold of 0.8
    val jac = Dedup.ngramJaccardPairsCapped(docs, n = 3, threshold = 0.8, maxDf = 100)
      .as[(Long, Long, Double)].collect()
    assert(!jac.exists(p => p._1 == 1L && p._2 == 2L))
  }

  test("containment: exact-dup pair is 1.0 both ways; df cap drops boilerplate-only pairs") {
    val boiler = "p q r p q r"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $boiler"),
      (2L, s"alpha beta gamma delta epsilon zeta $boiler"), // exact dup of 1
      (3L, s"one two three four five six $boiler"),
      (4L, s"seven eight nine ten eleven twelve $boiler"),
      (5L, s"red orange yellow green blue indigo $boiler"),
      (6L, s"cat dog bird fish horse goat $boiler")
    ).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairsCapped(docs, n = 3, threshold = 0.8, maxDf = 5)
      .as[(Long, Long, Double, Double)].collect()
      .map { case (a, b, ab, ba) => (a, b) -> ((ab, ba)) }.toMap
    // only the exact-dup pair survives the cap; both directions exactly 1.0
    assert(cont.keySet == Set((1L, 2L)), s"got ${cont.keySet}")
    assert(cont((1L, 2L)) == ((1.0, 1.0)))
  }

  test("x95 maxSharedSpan: island lengths exact; incoming-only dups and clean docs report zero") {
    val incoming = Seq(
      // one 6-token reference passage embedded → 3 consecutive matched
      // 4-grams, one island of 6 tokens
      (1L, "xxx yyy one two three four five six zzz www"),
      // two isolated shared 4-grams, far apart → two spans of 4
      (2L, "g1 g2 g3 g4 m1 m2 m3 m4 m5 h1 h2 h3 h4"),
      // nothing shared
      (3L, "totally unique tokens nothing here matches"),
      // exact copy of a 7-token reference doc → one island of all 7
      (4L, "r1 r2 r3 r4 r5 r6 r7"),
      // docs 5/6 share a passage ONLY with each other — cross-corpus
      // span audit must not count incoming-side duplication
      (5L, "q1 q2 q3 q4 q5 alpha beta"),
      (6L, "gamma q1 q2 q3 q4 q5 delta")
    ).toDF("doc_id", "text")
    val reference = Seq(
      (11L, "aaa bbb one two three four five six ccc ddd"),
      (12L, "g1 g2 g3 g4 spacer h1 h2 h3 h4"),
      (13L, "r1 r2 r3 r4 r5 r6 r7")
    ).toDF("doc_id", "text")
    val out = Dedup.maxSharedSpan(incoming, reference, n = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((6L, 3L, 1L)), s"got ${out(1L)}")
    assert(out(2L) == ((4L, 2L, 2L)), s"got ${out(2L)}")
    assert(out(3L) == ((0L, 0L, 0L)))
    assert(out(4L) == ((7L, 4L, 1L)), s"got ${out(4L)}")
    assert(out(5L) == ((0L, 0L, 0L)) && out(6L) == ((0L, 0L, 0L)))
    assert(out.size == 6) // full outer coverage: every incoming doc reports
  }

  test("df-capped top-k: boilerplate-only pairs fall out of the ranking; exact values") {
    val boiler = "p q r p q r"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $boiler"),
      (2L, s"alpha beta gamma delta epsilon eta $boiler"),
      (3L, s"one two three four five six $boiler"),
      (4L, s"seven eight nine ten eleven twelve $boiler"),
      (5L, s"red orange yellow green blue indigo $boiler"),
      (6L, s"cat dog bird fish horse goat $boiler")
    ).toDF("doc_id", "text")

    val uncapped = Dedup.ngramJaccardTopK(docs, n = 3, k = 15)
      .as[(Long, Long, Double)].collect()
    assert(uncapped.length == 15) // every pair shares boilerplate

    // cap binds: only the genuine pair survives candidate generation,
    // at its exact uncapped similarity
    val capped = Dedup.ngramJaccardTopKCapped(docs, n = 3, k = 15, maxDf = 5)
      .as[(Long, Long, Double)].collect()
    assert(capped.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)), capped.mkString(","))
    val uncappedTop = uncapped.find(t => t._1 == 1L && t._2 == 2L).get
    assert(math.abs(capped.head._3 - uncappedTop._3) < 1e-12)

    // a non-binding cap reproduces the uncapped ranking exactly
    val loose = Dedup.ngramJaccardTopKCapped(docs, n = 3, k = 15, maxDf = 100)
      .as[(Long, Long, Double)].collect()
    assert(loose.toSeq == uncapped.toSeq)
  }

  test("df-capped cross-corpus: per-side cap prunes shared boilerplate; exact values") {
    // cross-corpus boilerplate: the SAME license tail on both sides.
    // Incoming doc 1 is a genuine near-dup of reference doc 11.
    val boiler = "all rights reserved all rights"
    val incoming = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta $boiler"),
      (2L, s"one two three four five six $boiler"),
      (3L, s"red orange yellow green blue indigo $boiler")
    ).toDF("doc_id", "text")
    val reference = Seq(
      (11L, s"alpha beta gamma delta epsilon eta $boiler"),
      (12L, s"seven eight nine ten eleven twelve $boiler"),
      (13L, s"cat dog bird fish horse goat $boiler")
    ).toDF("doc_id", "text")

    val uncapped = Dedup.ngramJaccardCross(incoming, reference, threshold = 0.01)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    assert(uncapped.keySet.size == 9, s"fixture broken: ${uncapped.keySet}")

    // boilerplate df = 3 per side; with maxDf = 2 only the genuine
    // rare-shingle pair generates a candidate, and its jaccard is the
    // exact full-shingle-set value
    val capped = Dedup.ngramJaccardCrossCapped(incoming, reference,
        threshold = 0.01, maxDf = 2)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    assert(capped.keySet == Set((1L, 11L)), s"got ${capped.keySet}")
    assert(math.abs(capped((1L, 11L)) - uncapped((1L, 11L))) < 1e-12)

    // non-binding cap reproduces the uncapped operator exactly
    val loose = Dedup.ngramJaccardCrossCapped(incoming, reference,
        threshold = 0.01, maxDf = 100)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    assert(loose.keySet == uncapped.keySet)
    loose.foreach { case (k, j) => assert(math.abs(j - uncapped(k)) < 1e-12) }
  }

  test("cross-corpus jaccard == within-corpus jaccard restricted to the split") {
    val docs = graft.Tables.documents(spark, TestSpark.Sf0001)
    val srcNum = expr("CAST(substring(source, 4) AS INT)")
    val cross = Dedup.ngramJaccardCross(
        docs.filter(srcNum < 10), docs.filter(srcNum >= 10), threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap

    // independent reference: the full-corpus pair list restricted to
    // (incoming, reference) membership must agree exactly — same pairs,
    // same jaccard values
    val split = docs.select(col("doc_id"),
        (srcNum < 10).as("in_incoming")).as[(Long, Boolean)].collect().toMap
    val expected = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, j) =>
        if (split(a) && !split(b)) Some((a, b) -> j)
        else if (split(b) && !split(a)) Some((b, a) -> j)
        else None
      }.toMap
    assert(cross.nonEmpty, "vacuous: no cross-corpus near-dups in the fixture")
    assert(cross.keySet == expected.keySet)
    cross.foreach { case (k, j) => assert(math.abs(j - expected(k)) < 1e-12) }
  }

  test("bloom cross-dedup: exact result, no false negatives, candidates pruned") {
    // 200 incoming docs, 100 reference docs; 20 incoming are exact copies
    // of reference docs (possibly whitespace-mangled — fingerprint grain)
    val reference = (0 until 100).map(i => (1000L + i, doc(i))).toDF("doc_id", "text")
    val incoming = (0 until 200).map { i =>
      val text = if (i % 10 == 0) "  " + doc(i / 10) + " " else doc(10000 + i)
      (i.toLong, text)
    }.toDF("doc_id", "text")

    val out = Dedup.bloomCrossDedup(incoming, reference)
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == (0 until 200 by 10).map(_.toLong),
      s"expected exactly the 20 planted copies, got ${out.toSeq}")

    // the pre-filter alone: a superset of the true duplicates (no false
    // negatives) and a small fraction of the incoming corpus (fpp 0.01
    // over 180 non-dups => a handful of false positives at most)
    val cand = Dedup.bloomCandidates(incoming, reference,
      "doc_id", "text", 1L << 20, 0.01)
      .select("doc_id").as[Long].collect().toSet
    assert((0 until 200 by 10).forall(i => cand(i.toLong)),
      "bloom pre-filter dropped a true duplicate")
    assert(cand.size <= 20 + 18, s"bloom pruned too little: ${cand.size} of 200")
  }

  test("x48 semdedup: totality, one keeper per group, keep-least-typical, in-cell agreement") {
    graft.functions.VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val out = Dedup.semDedup(spark, emb, threshold = 0.3).cache()

    // totality: every input row appears exactly once, keep is a partition
    assert(out.count() == emb.count())
    assert(out.select("vec_id").distinct().count() == emb.count())

    // exactly one keeper per component, and it is the argmin
    // (cos_to_center, vec_id) of its group — the SemDeDup keep rule
    import org.apache.spark.sql.functions._
    val badGroups = out.groupBy("component")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"),
        min(struct(col("cos_to_center"), col("vec_id"))).as("best"),
        min_by(struct(col("cos_to_center"), col("vec_id")), when(col("keep"), 0).otherwise(1))
          .as("kept"))
      .filter(col("keepers") =!= 1 || col("best") =!= col("kept"))
    assert(badGroups.count() == 0, "a group has !=1 keeper or the wrong keeper")

    // agreement: every exact-baseline pair (cosine >= t) whose two ends
    // share a CELL must land in the same component (cross-cell misses
    // are the algorithm's documented approximation)
    val cells = out.select(col("vec_id"), col("cluster"), col("component"))
    val exact = Dedup.embeddingNearDups(emb, threshold = 0.3)
      .select("id_a", "id_b")
      .join(cells.select(col("vec_id").as("id_a"), col("cluster").as("c_a"),
        col("component").as("k_a")), "id_a")
      .join(cells.select(col("vec_id").as("id_b"), col("cluster").as("c_b"),
        col("component").as("k_b")), "id_b")
    assert(exact.filter(col("c_a") === col("c_b") && col("k_a") =!= col("k_b")).count() == 0,
      "an in-cell above-threshold pair was not merged into one component")
    // and the dedup is real on this fixture: some duplicates exist
    assert(out.filter(!col("keep")).count() > 0, "fixture produced no semantic dups")
    out.unpersist()
  }

  test("x102 semdedup cellCap: a planted 50-clique's pair work is bounded — no component exceeds the cap") {
    graft.functions.VectorFunctions.register(spark)
    val dim = 8
    def vec(f: Int => Float): Array[Float] = Array.tabulate(dim)(f)
    // 50 near-identical vectors (pairwise cosine ~0.999 — one mass-dup
    // clique) + 10 scattered near-one-hot vectors (pairwise and
    // vs-clique cosine far below threshold)
    val clique = (0 until 50).map(i => (i.toLong,
      vec(j => (1.0 + 0.001 * ((i + j) % 5 - 2)).toFloat)))
    val scattered = (0 until 10).map(i => (100L + i,
      vec(j => if (j == i % dim) 1f else 0.01f * ((i * 3 + j) % 7))))
    val emb = (clique ++ scattered).toDF("vec_id", "embedding")

    val capped = Dedup.semDedup(spark, emb, threshold = 0.9, nClusters = 4,
      cellCap = 10).cache()
    // totality survives the cap: every row present exactly once
    assert(capped.count() == 60)
    assert(capped.select("vec_id").distinct().count() == 60)
    // the bound: components only form among a cell's <=cap examined
    // members, so no duplicate group can exceed the cap
    val maxComp = capped.groupBy("component").count()
      .agg(max("count")).head.getLong(0)
    assert(maxComp <= 10, s"cap failed to bound the clique: component of $maxComp")
    // and the cap BINDS here: uncapped, the clique collapses into one
    // >=50-member component (the quadratic regime the cap exists for)
    val uncapped = Dedup.semDedup(spark, emb, threshold = 0.9, nClusters = 4)
    val maxUn = uncapped.groupBy("component").count()
      .agg(max("count")).head.getLong(0)
    assert(maxUn >= 50, s"fixture clique did not form uncapped: $maxUn")
    // unexamined members pass through as keepers, so the capped run
    // keeps strictly more rows than the uncapped one
    assert(capped.filter(col("keep")).count() >
      uncapped.filter(col("keep")).count())
    capped.unpersist()
  }

  test("x108 fixed-centroid semdedup: planted dup collapses, keeper is least typical, machinery == learned variant's contract") {
    graft.functions.VectorFunctions.register(spark)
    val dim = 4
    // ids 0..3 are BOTH corpus rows and the frozen centroids (one-hot
    // directions); 10/11 are an exact dup pair near centroid 2; 12 sits
    // in centroid 0's cell at a distinct angle
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f)), (3L, Array(0f, 0f, 0f, 1f)),
      (10L, Array(0f, 0f, 1f, 0.01f)), (11L, Array(0f, 0f, 1f, 0.01f)),
      (12L, Array(0.9f, 0.44f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.semDedupFixedCentroids(emb, threshold = 0.3,
      nClusters = 4).cache()

    // totality + keep is a partition with exactly one keeper per group
    assert(out.count() == 7)
    assert(out.select("vec_id").distinct().count() == 7)
    val badGroups = out.groupBy("component")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("keepers"),
        min(struct(col("cos_to_center"), col("vec_id"))).as("best"),
        min_by(struct(col("cos_to_center"), col("vec_id")),
          when(col("keep"), 0).otherwise(1)).as("kept"))
      .filter(col("keepers") =!= 1 || col("best") =!= col("kept"))
    assert(badGroups.count() == 0, "a group has !=1 keeper or the wrong keeper")

    // the planted dup pair shares a component with its centroid row
    // (cos(10,11)=1, cos(10,2)≈0.99995 — all ≥ 0.3), and the keeper is
    // the LEAST typical member: 10 and 11 tie below 2, id-asc keeps 10
    val rows = out.collect().map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Long]("component"), r.getAs[Boolean]("keep"))).toMap
    assert(rows(10L)._1 == rows(11L)._1 && rows(10L)._1 == rows(2L)._1)
    assert(rows(10L)._2 && !rows(11L)._2 && !rows(2L)._2,
      s"keeper rule picked the wrong member: $rows")
    // 12 links to centroid row 0 in cell 0 (cos ≈ 0.898): 12 is the
    // less typical member and keeps; 0 is dropped
    assert(rows(12L)._1 == rows(0L)._1)
    assert(rows(12L)._2 && !rows(0L)._2)
    // untouched one-hot centroids are singleton keepers
    assert(rows(1L)._2 && rows(3L)._2)
    out.unpersist()
  }

  // ------------------------------------------------------------------
  // x64/x65 — exact duplicated-substring spans
  // ------------------------------------------------------------------

  private def spanRows(docs: Seq[(Long, String)], n: Int = 4) =
    Dedup.duplicatedSpans(docs.toDF("doc_id", "text"), n = n)
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_grams")
      .as[(Long, Int, Int, Int, Long)].collect().toSet

  test("duplicated spans: a planted shared passage is recovered with EXACT boundaries") {
    val passage = (1 to 10).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      10L -> s"a1 a2 a3 $passage a4 a5 a6", // passage at tokens 3..12
      11L -> s"b1 b2 $passage b3",          // passage at tokens 2..11
      12L -> (1 to 30).map(i => s"u$i").mkString(" ")) // all-unique filler
    // width-4 grams fully inside the 10-token passage: 7 start positions
    assert(spanRows(docs) == Set((10L, 3, 12, 10, 7L), (11L, 2, 11, 10, 7L)))
  }

  test("duplicated spans: separated passages stay distinct islands; back-to-back merge") {
    val p1 = (1 to 8).map(i => s"x$i").mkString(" ")
    val p2 = (1 to 8).map(i => s"y$i").mkString(" ")
    val docs = Seq(
      20L -> s"$p1 g1 g2 g3 g4 g5 g6 $p2", // p1 at 0..7, p2 at 14..21
      21L -> s"h1 $p1 h2",                 // p1 at 1..8
      22L -> s"k1 k2 $p2",                 // p2 at 2..9
      23L -> s"$p1 $p2")                   // adjacent: one merged span 0..15
    val got = spanRows(docs)
    // doc 20: two islands (6 unique tokens between passages break the chain)
    assert(got.filter(_._1 == 20L) == Set((20L, 0, 7, 8, 5L), (20L, 14, 21, 8, 5L)))
    // doc 23: p2's first flagged start (pos 8) is adjacent to p1's span
    // end (pos 7), so the whole 16 tokens merge into ONE span
    assert(got.filter(_._1 == 23L) == Set((23L, 0, 15, 16, 10L)))
  }

  test("duplicated spans: repetition WITHIN one document is duplication (location grain)") {
    val phrase = (1 to 5).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      30L -> s"$phrase f1 f2 f3 f4 f5 f6 $phrase", // phrase at 0..4 and 11..15
      31L -> (1 to 25).map(i => s"v$i").mkString(" "))
    assert(spanRows(docs) == Set((30L, 0, 4, 5, 2L), (30L, 11, 15, 5, 2L)))
  }

  test("duplicated spans: an all-unique corpus yields no spans") {
    val docs = (0 until 5).map(d =>
      (d.toLong, (0 until 20).map(i => s"w${d}_$i").mkString(" ")))
    assert(spanRows(docs).isEmpty)
  }

  test("span cleaning: first occurrence survives verbatim, later copies lose the span") {
    val passage = (1 to 10).map(i => s"s$i").mkString(" ")
    val a = s"a1 a2 a3 $passage a4"
    val b = s"b1 b2 $passage b3"
    val c = (1 to 20).map(i => s"c$i").mkString(" ")
    val out = Dedup.spanDedupClean(
        Seq(50L -> a, 51L -> b, 52L -> c).toDF("doc_id", "text"))
      .select("doc_id", "cleaned_text", "kept_tokens", "removed_tokens")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(50L) == ((50L, a, 14L, 0L))) // keeper doc: byte-identical
    assert(out(51L) == ((51L, "b1 b2 b3", 3L, 10L)))
    assert(out(52L) == ((52L, c, 20L, 0L)))
  }

  test("span cleaning: exact duplicate empties; intra-doc repeat keeps the first copy") {
    val phrase = (1 to 5).map(i => s"t$i").mkString(" ")
    val fill = (1 to 6).map(i => s"f$i").mkString(" ")
    val twin = (1 to 12).map(i => s"w$i").mkString(" ")
    val out = Dedup.spanDedupClean(Seq(
        60L -> s"$phrase $fill $phrase", // intra-doc repeat
        61L -> twin, 62L -> twin)        // exact corpus duplicate
      .toDF("doc_id", "text"))
      .select("doc_id", "cleaned_text", "kept_tokens", "removed_tokens")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(60L) == ((60L, s"$phrase $fill", 11L, 5L)))
    assert(out(61L) == ((61L, twin, 12L, 0L))) // first copy untouched
    assert(out(62L) == ((62L, "", 0L, 12L)))   // later copy fully cleaned
    // conservation: kept + removed == token count, every doc present
    assert(out.values.forall { case (_, _, k, r) => k + r == 12 || k + r == 16 })
  }

  test("cross-corpus span cleaning: reference passages scrubbed, incoming-only dups kept") {
    val evalPassage = (1 to 8).map(i => s"e$i").mkString(" ")
    val incOnly = (1 to 6).map(i => s"m$i").mkString(" ")
    val incoming = Seq(
      80L -> s"i1 i2 $evalPassage i3",      // contains the reference passage
      81L -> s"$incOnly j1 j2 $incOnly",    // duplicated only WITHIN incoming
      82L -> evalPassage,                   // is exactly a reference passage
      83L -> "k1 k2 k3 k4 k5 k6")           // clean
    val reference = Seq(90L -> s"r1 $evalPassage r2")
    val out = Dedup.crossSpanClean(
        incoming.toDF("doc_id", "text"), reference.toDF("doc_id", "text"))
      .select("doc_id", "cleaned_text", "kept_tokens", "removed_tokens")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(80L, 81L, 82L, 83L)) // reference never emitted
    assert(out(80L) == ((80L, "i1 i2 i3", 3L, 8L)))
    // incoming-internal duplication is NOT this operator's business
    assert(out(81L) == ((81L, s"$incOnly j1 j2 $incOnly", 14L, 0L)))
    assert(out(82L) == ((82L, "", 0L, 8L)))
    assert(out(83L) == ((83L, "k1 k2 k3 k4 k5 k6", 6L, 0L)))
  }

  test("span cleaning: a document over the 2^20-token position bound fails loudly") {
    val big = Seq.tabulate(1 << 20)(i => "z").mkString(" ") // 2^20 tokens
    val e = intercept[Exception] {
      // collect(), not count(): a bare count lets the optimizer
      // eliminate the aggregated outer-join branch (distinct join keys
      // ⇒ EliminateOuterJoin) and with it the guarded scan
      Dedup.spanDedupClean(Seq(70L -> big).toDF("doc_id", "text")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("position bound")))
  }

  test("span profile: totality, zero rows for clean docs, agreement with spans") {
    val passage = (1 to 10).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      40L -> s"$passage c1 c2 c3 c4 c5 c6 c7 c8 c9 c10", // half duplicated
      41L -> passage,                                    // fully duplicated
      42L -> (1 to 15).map(i => s"z$i").mkString(" "))   // clean
    val df = docs.toDF("doc_id", "text")
    val prof = Dedup.spanDupProfile(df)
      .select("doc_id", "n_spans", "dup_tokens", "total_tokens", "dup_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(prof.keySet == Set(40L, 41L, 42L)) // one row per doc, clean included
    assert(prof(40L) == ((40L, 1L, 10L, 20L, 0.5)))
    assert(prof(41L) == ((41L, 1L, 10L, 10L, 1.0)))
    assert(prof(42L) == ((42L, 0L, 0L, 15L, 0.0)))
    // profile is exactly the per-doc aggregation of duplicatedSpans
    val agg = Dedup.duplicatedSpans(df).groupBy("doc_id")
      .agg(count(lit(1)).as("s"), sum("span_tokens").as("t"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    for ((id, (_, nSpans, dupToks, _, _)) <- prof if nSpans > 0)
      assert(agg(id) == ((id, nSpans, dupToks)))
  }

  // ------------------------------------------------------------------
  // x70 — edit-distance similarity join
  // ------------------------------------------------------------------

  /** Plain-JVM Levenshtein for the brute-force oracle — shares no code
    * with Spark's expression. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("x70 edit distance: EQUALS brute-force all-pairs under a non-binding cap") {
    // 26-to-30-char synthetic titles with planted substitution /
    // deletion / insertion typos; q(d+1) = 24 <= every length, so the
    // Gravano count-filter guarantee applies and blocking may not lose
    // a single true pair.
    val base = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "the quack brown fox jumps high"),   // 1 substitution vs 1
      (3L, "the quick brown fox jumps hig"),    // 1 deletion vs 1
      (4L, "xthe quick brown fox jumps high"),  // 1 insertion vs 1
      (5L, "a completely different string x"),
      (6L, "zz ww qq ee rr tt yy uu ii oo"),
      (7L, "the quick brown dog jumps high"))   // 3 subs vs 1
    val df = base.toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(df, prefixLen = 30, q = 4, maxDist = 5,
        maxOcc = 1000000)
      .as[(Long, Long, Long)].collect().toSet
    val titles = base.map { case (id, t) => (id, t.toLowerCase.take(30)) }
    val want = (for {
      (ia, ta) <- titles; (ib, tb) <- titles if ia < ib
      d = lev(ta, tb) if d <= 5
    } yield (ia, ib, d.toLong)).toSet
    assert(want.exists(_._3 > 0) && want.size >= 6) // fixture is non-trivial
    assert(got == want)
  }

  test("x70 edit distance: titles shorter than q(d+1) are excluded up front") {
    val df = Seq((1L, "short title"), (2L, "short titel")).toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(df, prefixLen = 30, q = 4, maxDist = 5,
      maxOcc = 100).count() == 0)
  }

  test("x70 edit distance: maxOcc caps boilerplate grams; pairs return when raised") {
    // 40 docs with IDENTICAL titles: every gram has occ 40 > cap 10, so
    // the capped join generates no candidates — the documented
    // boilerplate-guard semantics; raising the cap restores all pairs.
    val df = (1L to 40L).map(i => (i, "identical boilerplate title here"))
      .toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(df, maxOcc = 10).count() == 0)
    assert(Dedup.editDistancePairs(df, maxOcc = 40).count() == 40L * 39 / 2)
  }

  test("x70 edit distance: count filter admits far-apart same-gram strings only via verify") {
    // two titles sharing grams but at distance > d: blocking may emit
    // the candidate, verify must kill it — threshold levenshtein's -1
    // sentinel must never leak through as a row
    val df = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff"),
      (2L, "ffff eeee dddd cccc bbbb aaaa")).toDF("doc_id", "text")
    val out = Dedup.editDistancePairs(df, prefixLen = 30, q = 4, maxDist = 5,
      maxOcc = 1000).as[(Long, Long, Long)].collect()
    assert(out.forall(r => r._3 >= 0 && r._3 <= 5))
    assert(out.isEmpty) // the reversal is far beyond 5 edits
  }
}
