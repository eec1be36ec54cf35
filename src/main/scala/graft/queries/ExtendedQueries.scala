package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions => TF, VectorFunctions}
import graft.operators.{AsOfJoin, Components, Curation, Dedup, Multimodal, Sessionize, SimilaritySearch}
import graft.operators.SimilaritySearch.{AnnEval => A}

/** Beyond-reference operators (SURVEY.md §7.7 / north star): text
  * analysis, dedup family, similarity search, multimodal plumbing —
  * each exposed as a driver-checkable query. SQL-expressible ones carry a
  * DuckDB oracle; hash-based ones (MinHash/SimHash/LSH/codec) get the
  * rows-only check plus ScalaTest invariants (see test/…).
  *
  * Oracle-parity note: the SQL for occurrence counting / language ID is
  * GENERATED from the same marker-word constants the Spark implementation
  * uses (single source of truth — the two sides cannot drift apart).
  */
object ExtendedQueries {

  // ---- SQL generators mirroring TextFunctions -------------------------

  /** DuckDB expression: whole-word occurrence count of `w` in padded text
    * `p` (same replace-arithmetic as TF.wordOccurrences). */
  private def occSql(p: String, w: String): String =
    s"CAST((length($p) - length(regexp_replace($p, ' $w ', ' ', 'g'))) / ${w.length + 1} AS BIGINT)"

  private def langScoreSql(p: String, lang: String): String =
    TF.LangMarkers.toMap.apply(lang).map(occSql(p, _)).mkString("(", " + ", ")")

  private[queries] val normalizedSql = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

  // ---------------------------------------------------------------------
  // x01 — token counting (whitespace + BPE-ish regex)
  // ---------------------------------------------------------------------
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
              TF.tokenCount(col("text")).cast("long").as("n_tokens"),
              TF.wordpieceCount(col("text")).cast("long").as("n_wordpieces"),
              length(col("text")).cast("long").as("n_chars_computed"))
      .orderBy("doc_id")

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_wordpieces,
      |  CAST(length(text) AS BIGINT) AS n_chars_computed
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x02 — quality scoring (length / stopword / alnum ratios)
  // ---------------------------------------------------------------------
  def textQuality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
              TF.avgTokenLen(col("text")).as("avg_token_len"),
              TF.stopwordRatio(col("text")).as("stopword_ratio"),
              TF.alnumRatio(col("text")).as("alnum_ratio"),
              TF.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val textQualitySql: String = {
    val p = "(' ' || text || ' ')"
    val nTok = "CAST(len(string_split(text, ' ')) AS BIGINT)"
    val stopOcc = Seq("the", "a", "and", "of").map(occSql(p, _)).mkString(" + ")
    s"""SELECT doc_id,
       |  CASE WHEN $nTok = 0 THEN 0.0
       |       ELSE CAST(length(text) - $nTok + 1 AS DOUBLE) / $nTok END AS avg_token_len,
       |  CASE WHEN $nTok = 0 THEN 0.0
       |       ELSE CAST($stopOcc AS DOUBLE) / $nTok END AS stopword_ratio,
       |  CASE WHEN length(text) = 0 THEN 0.0
       |       ELSE CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / length(text) END AS alnum_ratio,
       |  0.3 * least(CAST($nTok AS DOUBLE) / 64.0, 1.0)
       |  + 0.2 * (CASE WHEN (CASE WHEN $nTok = 0 THEN 0.0
       |                      ELSE CAST(length(text) - $nTok + 1 AS DOUBLE) / $nTok END) BETWEEN 3.0 AND 8.0
       |           THEN 1.0 ELSE 0.5 END)
       |  + 0.2 * (CASE WHEN length(text) = 0 THEN 0.0
       |           ELSE CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / length(text) END)
       |  + 0.3 * (1.0 - CASE WHEN $nTok = 0 THEN 0.0
       |                 ELSE CAST($stopOcc AS DOUBLE) / $nTok END) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x03 — language ID (marker-word n-gram heuristic)
  // ---------------------------------------------------------------------
  def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang").as("labeled_lang"),
              TF.langId(col("text")).as("pred_lang"),
              TF.langScore(col("text"), "en").cast("long").as("en_score"))
      .orderBy("doc_id")

  val langIdSql: String = {
    val p = "(' ' || text || ' ')"
    val scores = TF.LangMarkers.map { case (l, _) => l -> langScoreSql(p, l) }
    val mx = scores.map(_._2).mkString("greatest(", ", ", ")")
    val caseArm = scores.map { case (l, e) => s"WHEN $e = $mx AND $mx > 0 THEN '$l'" }.mkString(" ")
    s"""SELECT doc_id, lang AS labeled_lang,
       |  CASE $caseArm ELSE 'und' END AS pred_lang,
       |  ${scores.toMap.apply("en")} AS en_score
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x04 — document fingerprinting
  // ---------------------------------------------------------------------
  def fingerprintQ(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  val fingerprintSql: String =
    s"SELECT doc_id, md5($normalizedSql) AS fp FROM documents ORDER BY doc_id"

  // ---------------------------------------------------------------------
  // x05 — exact dedup stats per source
  // ---------------------------------------------------------------------
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactStats(Tables.documents(s, dir)).orderBy("source")

  val dedupExactSql: String =
    s"""SELECT source, COUNT(*) AS n_docs,
       |  COUNT(DISTINCT md5($normalizedSql)) AS distinct_texts,
       |  COUNT(*) - COUNT(DISTINCT md5($normalizedSql)) AS dup_docs
       |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------
  // x06 — MinHash-LSH near-dups. Fully hash-checked since the
  // permutation family moved to engine-shared md5-top-60 + affine maps
  // mod 2^31−1 (the x16 promotion pattern) and the band key became the
  // slice VALUES (collision-free): the oracle recomputes the shingle
  // sets, all 32 minhashes, the 8 band keys, the 200-cap bucket prune,
  // the candidate self-join, and the exact-Jaccard verification.
  // ---------------------------------------------------------------------
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(Tables.documents(s, dir), threshold = 0.9)
      .orderBy("id_a", "id_b")
  // (defaults: word-trigram shingles, 32 hashes in 8×4 bands — see
  // Dedup.minhashNearDups scale rationale; recall invariants in DedupSpec)

  val dedupMinhashSql: String = {
    val p = Dedup.minhashPrime
    val minTerms = (0 until 32).map { i =>
      s"MIN((${Dedup.minhashSeedA(i)}*g + ${Dedup.minhashSeedB(i)}) % $p) AS h$i"
    }.mkString(", ")
    val bandRows = (0 until 8).map { b =>
      val key = (0 until 4).map(r => s"CAST(h${b * 4 + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $key AS bh FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), shraw AS (
       |  SELECT DISTINCT doc_id,
       |         w[pos+1] || ' ' || w[pos+2] || ' ' || w[pos+3] AS sh
       |  FROM (SELECT doc_id, w, unnest(range(len(w) - 2)) AS pos
       |        FROM toks WHERE len(w) >= 3)
       |), gh AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) % $p AS g
       |  FROM shraw
       |), sig AS (
       |  SELECT doc_id, $minTerms FROM gh GROUP BY doc_id
       |), bandrows AS (
       |  $bandRows
       |), pruned AS (
       |  SELECT doc_id, band, bh FROM (
       |    SELECT doc_id, band, bh, COUNT(*) OVER (PARTITION BY band, bh) AS bsz
       |    FROM bandrows) t
       |  WHERE bsz <= 200
       |), cands AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM pruned a JOIN pruned b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |), sz AS (
       |  SELECT doc_id, COUNT(*) AS n_sh FROM shraw GROUP BY doc_id
       |), inter AS (
       |  SELECT id_a, id_b, COUNT(*) AS n_int
       |  FROM cands
       |  JOIN shraw sa ON sa.doc_id = id_a
       |  JOIN shraw sb ON sb.doc_id = id_b AND sa.sh = sb.sh
       |  GROUP BY 1, 2
       |)
       |SELECT id_a, id_b,
       |       CAST(n_int AS DOUBLE) / (za.n_sh + zb.n_sh - n_int) AS jaccard
       |FROM inter
       |JOIN sz za ON za.doc_id = id_a
       |JOIN sz zb ON zb.doc_id = id_b
       |WHERE CAST(n_int AS DOUBLE) / (za.n_sh + zb.n_sh - n_int) >= 0.9
       |ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x07 — SimHash near-dups. Fully hash-checked since the token hash
  // moved to engine-shared md5 (first 16 hex chars as two 32-bit halves
  // — a single signed 64-bit signature would be unrepresentable at bit
  // 63 on one engine or the other): the oracle recomputes all 64
  // per-bit sign sums, both signature halves, the 8-bit chunk banding,
  // the 200-cap bucket prune (load-bearing at scale — see
  // Dedup.simhashNearDups), the candidate self-join, and the exact
  // XOR-popcount hamming filter.
  // ---------------------------------------------------------------------
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(Tables.documents(s, dir), maxHamming = 7)
      .orderBy("id_a", "id_b")

  val dedupSimhashSql: String = {
    val sums = (0 until 64).map { j =>
      val src = if (j < 32) s"(hlo >> $j)" else s"(hhi >> ${j - 32})"
      s"SUM(CASE WHEN $src & 1 = 1 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(", ")
    def half(lowBit: Int) = (0 until 32).map { j =>
      s"(CASE WHEN b${lowBit + j} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    val ham = "bit_count(xor(ha, hb)) + bit_count(xor(la, lb))"
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
       |), h AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) AS hhi,
       |         CAST(('0x' || substr(md5(t), 9, 8)) AS BIGINT) AS hlo
       |  FROM tok
       |), bits AS (
       |  SELECT doc_id, $sums FROM h GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, ${half(32)} AS sh_hi, ${half(0)} AS sh_lo FROM bits
       |), chunks0 AS (
       |  SELECT doc_id, sh_hi, sh_lo, c AS chunk,
       |         CASE WHEN c < 4 THEN (sh_lo >> (c * 8)) & 255
       |              ELSE (sh_hi >> ((c - 4) * 8)) & 255 END AS ch
       |  FROM sig CROSS JOIN (SELECT unnest(range(8)) AS c)
       |), chunks AS (
       |  SELECT doc_id, sh_hi, sh_lo, chunk, ch FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY chunk, ch) AS bsz
       |    FROM chunks0) t
       |  WHERE bsz <= 200
       |), pairs AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |         x.sh_hi AS ha, x.sh_lo AS la, y.sh_hi AS hb, y.sh_lo AS lb
       |  FROM chunks x JOIN chunks y
       |    ON x.chunk = y.chunk AND x.ch = y.ch AND x.doc_id < y.doc_id
       |)
       |SELECT id_a, id_b, CAST($ham AS BIGINT) AS hamming
       |FROM pairs WHERE $ham <= 7
       |ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x08 — n-gram Jaccard top-k (exact; oracle via lateral unnest)
  // ---------------------------------------------------------------------
  def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardTopK(Tables.documents(s, dir), n = 3, k = 50)

  // No lateral table function (DuckDB rejects column-parameterized
  // generate_series): shingles come from unnest(list_transform(range(…))).
  // range(len-2) is empty for len<3 — same short-doc semantics as
  // TF.shingles (no truncated shingle).
  val ngramJaccardSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), grams AS (
      |  SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(greatest(len(w) - 2, 0)),
      |                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
      |  FROM toks
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      |  FROM grams a JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT id_a, id_b,
      |       CAST(i AS DOUBLE) / (za.sz + zb.sz - i) AS jaccard
      |FROM inter
      |JOIN sizes za ON id_a = za.doc_id
      |JOIN sizes zb ON id_b = zb.doc_id
      |ORDER BY jaccard DESC, id_a, id_b LIMIT 50""".stripMargin

  // ---------------------------------------------------------------------
  // x09 — embedding-cosine near-dup (exact pairs ≥ threshold)
  // ---------------------------------------------------------------------
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Dedup.embeddingNearDups(Tables.embeddings(s, dir), threshold = 0.3)
      .orderBy("id_a", "id_b")
  }

  /** Double-precision cosine in DuckDB (list_cosine_similarity is
    * float32 — not oracle-grade). */
  private[queries] val cosSql =
    """list_sum(list_transform(list_zip(a.embedding, b.embedding),
      |  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
      |/ (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * x)))
      |   * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * x))))""".stripMargin

  val embeddingNearDupSql: String =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cosSql AS cosine
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |WHERE $cosSql >= 0.3
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // x84 — SEMANTIC split-leakage audit: x83's embedding-space twin.
  // Lexical leakage (x83) misses paraphrases — a test doc rewritten in
  // different words shares no trigram with its train twin but sits at
  // cosine ≈ 1 in embedding space. Same composition discipline: the
  // x09 exact pair relation (hash-green cosine, double-precision both
  // engines) labeled by the pure row-local split-of-id function — zero
  // extra shuffles, no split-relation join. Together x83 + x84 audit
  // both faces of eval contamination before training. Scale path:
  // swap the exact pair generator for the x14 LSH bucketing (same
  // caveat as x09, served on /entries).
  // ---------------------------------------------------------------------
  def semanticSplitLeakage(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Dedup.embeddingNearDups(Tables.embeddings(s, dir), threshold = 0.3)
      .withColumn("split_a", Curation.splitOf(col("id_a")))
      .withColumn("split_b", Curation.splitOf(col("id_b")))
      .filter(col("split_a") =!= col("split_b"))
      .select("id_a", "split_a", "id_b", "split_b", "cosine")
      .orderBy("id_a", "id_b")
  }

  val semanticSplitLeakageSql: String = {
    def splitCase(id: String) =
      s"""CASE WHEN substr(md5(CAST($id AS VARCHAR)), 1, 2) < '${graft.operators.Curation.TrainUpper}' THEN 'train'
         |     WHEN substr(md5(CAST($id AS VARCHAR)), 1, 2) < '${graft.operators.Curation.ValUpper}' THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cosSql AS cosine
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |  WHERE $cosSql >= 0.3
       |), lab AS (
       |  SELECT id_a, ${splitCase("id_a")} AS split_a,
       |         id_b, ${splitCase("id_b")} AS split_b, cosine
       |  FROM pairs)
       |SELECT id_a, split_a, id_b, split_b, cosine FROM lab
       |WHERE split_a <> split_b ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x85 — semantic split-leakage, LSH-bucketed SCALE path: x84 with the
  // x14 candidate generator swapped in. x84's caveat used to say "swap
  // the exact pair generator for x14's LSH bucketing at scale" — this IS
  // that composition as runnable code, built exactly the way x83
  // composes the df-capped lexical generator: bucketed candidates
  // (O(n · tables · E[bucket]) instead of O(n²)), exact cosine
  // verification inside cells, then the pure row-local split-of-id
  // label — zero additional shuffles, no split-relation join. Precision
  // vs x84 is 1.0 by construction (every emitted pair is
  // cosine-verified); recall < 1 only through bucketing, so the spec
  // asserts the exact containment invariant: the entry equals x84
  // restricted to pairs the bucketing co-locates (CurationSpec).
  // Rows-only for the driver (bucket membership is not SQL-expressible
  // in the oracle), same as x14.
  // ---------------------------------------------------------------------
  def semanticSplitLeakageLsh(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Dedup.embeddingNearDupsLsh(Tables.embeddings(s, dir), threshold = 0.3)
      .withColumn("split_a", Curation.splitOf(col("id_a")))
      .withColumn("split_b", Curation.splitOf(col("id_b")))
      .filter(col("split_a") =!= col("split_b"))
      .select("id_a", "split_a", "id_b", "split_b", "cosine")
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------------------
  // x115 — x85 with x110's MULTI-PROBED query side (r15, verdict #6):
  // the eval split (val ∪ test — the small side by construction)
  // probes its base bucket plus the 2 least-confident plane flips per
  // table, against x85's BIT-IDENTICAL adaptive-plane item index. The
  // adaptive planes keep buckets bounded as the corpus grows (x14's
  // receipt); what they trade — wide-angle recall — the probing buys
  // back on the query side at (1+probes)× eval keys, never touching
  // the corpus-sized side. Total for cross-split auditing: every
  // cross-split pair has a non-train member, so the asymmetric
  // generator can't miss a pair class. Rows-only like x85 (adaptive
  // plane count is data-dependent, so the planes aren't static SQL
  // literals); spec pins probes=0 ≡ x85 and recall dominance over it.
  // ---------------------------------------------------------------------
  def semanticSplitLeakageProbed(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    Dedup.embeddingNearDupsLshMultiProbe(emb,
        emb.filter(Curation.splitOf(col("vec_id")) =!= "train"),
        threshold = 0.3, probes = 2)
      .withColumn("split_a", Curation.splitOf(col("id_a")))
      .withColumn("split_b", Curation.splitOf(col("id_b")))
      .filter(col("split_a") =!= col("split_b"))
      .select("id_a", "split_a", "id_b", "split_b", "cosine")
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------------------
  // x14 — embedding near-dup, LSH-bucketed scale path (rows-only check;
  // recall-vs-exact invariant in DedupSpec)
  // ---------------------------------------------------------------------
  def embeddingNearDupLsh(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Dedup.embeddingNearDupsLsh(Tables.embeddings(s, dir), threshold = 0.3)
      .orderBy("id_a", "id_b")
  }

  // ---------------------------------------------------------------------
  // x10 — brute-force top-k cosine search (exact ANN baseline)
  // ---------------------------------------------------------------------
  def knnBruteForce(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.bruteForceTopK(emb, emb.filter(col("vec_id") < A.QuerySlice), k = A.K)
      .orderBy("query_id", "rank")
  }

  val knnBruteForceSql: String =
    s"""SELECT query_id, vec_id, cosine, rank FROM (
       |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, $cosSql AS cosine,
       |         CAST(row_number() OVER (PARTITION BY a.vec_id
       |                            ORDER BY $cosSql DESC, b.vec_id) AS BIGINT) AS rank
       |  FROM (SELECT * FROM embeddings WHERE vec_id < ${A.QuerySlice}) a
       |  JOIN embeddings b ON a.vec_id <> b.vec_id
       |) WHERE rank <= ${A.K} ORDER BY query_id, rank""".stripMargin

  // ---------------------------------------------------------------------
  // x11 — LSH-bucketed ANN (scale path). HASH-CHECKED since r15 via the
  // x111 literal-plane pattern: the seeded Gaussian hyperplanes are
  // materialized as literal lists in the oracle SQL (generated from the
  // SAME Scala array), so the oracle recomputes the sign-bit bucketing,
  // the (table, bucket) candidate join, and the exact cosine rerank
  // value-for-value. "Probabilistic buckets" was never the blocker —
  // the buckets are deterministic given the planes; only the planes'
  // PROVENANCE (a JVM RNG) was engine-private, and literals fix that.
  // ---------------------------------------------------------------------
  def knnLsh(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.lshTopK(s, emb, emb.filter(col("vec_id") < A.QuerySlice), k = A.K)
      .orderBy("query_id", "rank")
  }

  /** One hyperplane as a DuckDB literal list. Each Float is rendered as
    * the shortest round-trip repr of its DOUBLE widening — NOT
    * Float.toString ("0.1f" reads back as the double 0.1, which is a
    * DIFFERENT value than (double)0.1f); printing the widened double
    * makes DuckDB's correctly-rounded parse reproduce exactly the
    * double the Spark kernel's (double) cast sees. */
  private def planeLit(row: Array[Float]): String =
    row.map(_.toDouble.toString).mkString("[", ", ", "]")

  /** The [[planeLit]] projection as the same left-to-right double fold
    * the dot_product kernel runs (the established cosine parity
    * contract). */
  private def planeProj(row: Array[Float]): String =
    s"""list_sum(list_transform(list_zip(embedding, ${planeLit(row)}),
       |           x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))""".stripMargin

  /** Shared scaffolding of the three hyperplane-LSH oracles (x11, x110,
    * x117): the per-plane projection column defs and, per table, the
    * sign-bit bucket key and the UNION ALL bucket-key arms over a named
    * source CTE. The genuinely distinct cand logic (top-k join, probe
    * keys, symmetric pair join) stays at each call site (ADVICE r15). */
  private def lshScaffold(hp: Array[Array[Array[Float]]])
      : (String, Int => String, String => String) = {
    val projDefs = (for { t <- hp.indices; j <- hp(t).indices } yield
      s"${planeProj(hp(t)(j))} AS p_${t}_$j").mkString(",\n       ")
    def bucket(t: Int): String = hp(t).indices
      .map(j => s"(CASE WHEN p_${t}_$j >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")
    def arms(from: String): String = hp.indices
      .map(t => s"SELECT vec_id, $t AS tbl, ${bucket(t)} AS bucket FROM $from")
      .mkString("\n  UNION ALL\n  ")
    (projDefs, bucket, arms)
  }

  /** Shared tail of the two LSH oracles: exact-cosine scoring of the
    * DISTINCT candidate pairs + the top-10 rank cut (identical to the
    * Spark side's distinct → cosine → topKPerQuery contract). */
  private def lshScoreAndRankSql(candCte: String): String =
    s"""$candCte, scored AS (
       |  SELECT c.query_id, c.vec_id,
       |         ${cosSqlOn("qe.embedding", "ie.embedding")} AS cosine
       |  FROM cand c
       |  JOIN embeddings qe ON qe.vec_id = c.query_id
       |  JOIN embeddings ie ON ie.vec_id = c.vec_id
       |), fin AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |                 ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT query_id, vec_id, cosine, rank FROM fin
       |WHERE rank <= ${A.K} ORDER BY query_id, rank""".stripMargin

  val knnLshSql: String = {
    val hp = SimilaritySearch.hyperplanes(64, 4, 8, 42L)
    val (projDefs, _, arms) = lshScaffold(hp)
    lshScoreAndRankSql(
      s"""WITH p AS (
         |  SELECT vec_id,
         |       $projDefs
         |  FROM embeddings
         |), b AS (
         |  ${arms("p")}
         |), cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, i.vec_id AS vec_id
         |  FROM b q JOIN b i
         |    ON q.tbl = i.tbl AND q.bucket = i.bucket AND q.vec_id <> i.vec_id
         |  WHERE q.vec_id < ${A.QuerySlice}
         |)""".stripMargin)
  }

  // ---------------------------------------------------------------------
  // x110 — multi-probe LSH ANN (Lv et al. 2007): x11 with each query
  // additionally probing the buckets reached by flipping its least-
  // confident planes. Recall amplification on the QUERY side instead of
  // more tables (which would re-bucket the corpus-sized item side).
  // HASH-CHECKED since r15 (same literal-plane pattern as x11): the
  // oracle additionally recomputes the per-plane confidence ranks
  // (|projection| order, index tie-break) and the XOR probe keys, so
  // the probe-selection logic itself is value-level verified. The
  // probes=0 ≡ x11 algebraic reduction and the recall-dominance
  // invariant remain spec-asserted in SimilaritySearchSpec.
  // ---------------------------------------------------------------------
  def knnLshMultiProbe(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.lshMultiProbeTopK(s, emb, emb.filter(col("vec_id") < A.QuerySlice),
        k = A.K, probes = 2)
      .orderBy("query_id", "rank")
  }

  val knnLshMultiProbeSql: String = {
    val hp = SimilaritySearch.hyperplanes(64, 4, 8, 42L)
    val planes = hp(0).length; val probes = 2
    val (projDefs, bucket, arms) = lshScaffold(hp)
    // plane j's confidence rank = how many OTHER planes have strictly
    // smaller |projection| (index tie-break: j2 < j wins ties) — the
    // exact comparison tree of lshMultiProbeTopK's rank column
    def flipIncluded(t: Int, j: Int): String = {
      val cnt = (0 until planes).filter(_ != j).map { j2 =>
        val cmp = if (j2 < j) "<=" else "<"
        s"(CASE WHEN abs(p_${t}_$j2) $cmp abs(p_${t}_$j) THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"($cnt) < $probes"
    }
    val itemArms = arms("p")
    val baseArms = hp.indices
      .map(t => s"SELECT vec_id, $t AS tbl, ${bucket(t)} AS bucket FROM qp")
    val flipArms = for { t <- hp.indices; j <- 0 until planes } yield
      s"SELECT vec_id, $t AS tbl, xor(${bucket(t)}, ${1L << j}) AS bucket " +
        s"FROM qp WHERE ${flipIncluded(t, j)}"
    val probeArms = (baseArms ++ flipArms).mkString("\n  UNION ALL\n  ")
    lshScoreAndRankSql(
      s"""WITH p AS (
         |  SELECT vec_id,
         |       $projDefs
         |  FROM embeddings
         |), b AS (
         |  $itemArms
         |), qp AS (
         |  SELECT * FROM p WHERE vec_id < ${A.QuerySlice}
         |), qk AS (
         |  $probeArms
         |), cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, i.vec_id AS vec_id
         |  FROM qk q JOIN b i
         |    ON q.tbl = i.tbl AND q.bucket = i.bucket AND q.vec_id <> i.vec_id
         |)""".stripMargin)
  }

  // ---------------------------------------------------------------------
  // x111 — Johnson–Lindenstrauss sign-projection ANN (Achlioptas 2003):
  // compressed candidate generation (16-dim reduced cosine, 4× fewer
  // flops/bytes than the 64-dim scan) + exact rerank of the k·overfetch
  // shortlist. Data-INDEPENDENT unlike IVF/PQ — no fit, no codebook —
  // and therefore the one compressed-candidate ANN whose every stage is
  // a closed-form expression: the oracle recomputes the ±1 projections,
  // reduced norms and cosines, the candidate cut, and the exact rerank
  // value-for-value (the family's learned paths are rows-only by
  // nature; this pins the shared shortlist-then-rerank machinery).
  // ---------------------------------------------------------------------
  def knnJl(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.jlTopK(s, emb, emb.filter(col("vec_id") < A.QuerySlice), k = A.K)
      .orderBy("query_id", "rank")
  }

  /** [[cosSql]] over arbitrary operand expressions (the x111 rerank
    * re-scores carried arrays, not table-aliased columns). */
  private[queries] def cosSqlOn(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
       |  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
       |/ (sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * x)))
       |   * sqrt(list_sum(list_transform($b, x -> CAST(x AS DOUBLE) * x))))""".stripMargin

  val knnJlSql: String = {
    val m = 32
    val signs = SimilaritySearch.jlSigns(64, m, 7L)
    // each projection is the SAME left-to-right double fold the Spark
    // side's dot_product kernel runs (the cosine hash-parity contract),
    // against the identical literal ±1 vector
    def proj(row: Array[Int]): String = {
      val lst = row.map(s => if (s > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      s"""list_sum(list_transform(list_zip(embedding, $lst),
         |         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))""".stripMargin
    }
    val rpDefs = signs.zipWithIndex
      .map { case (row, j) => s"${proj(row)} AS rp$j" }
      .mkString(",\n       ")
    val normSq = (0 until m).map(j => s"rp$j*rp$j").mkString(" + ")
    val rdot = (0 until m).map(j => s"q.rp$j*i.rp$j").mkString(" + ")
    s"""WITH p AS (
       |  SELECT vec_id, embedding,
       |       $rpDefs
       |  FROM embeddings
       |), n AS (
       |  SELECT *, sqrt($normSq) AS rnorm FROM p
       |), cand0 AS (
       |  SELECT q.vec_id AS query_id, i.vec_id AS vec_id,
       |         ($rdot) / (q.rnorm * i.rnorm) AS rcos,
       |         q.embedding AS qe, i.embedding AS ie
       |  FROM (SELECT * FROM n WHERE vec_id < ${A.QuerySlice}) q
       |  JOIN n i ON q.vec_id <> i.vec_id
       |), cand AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |                               ORDER BY rcos DESC, vec_id) AS crank
       |  FROM cand0
       |), rr AS (
       |  SELECT query_id, vec_id,
       |         ${cosSqlOn("qe", "ie")} AS cosine
       |  FROM cand WHERE crank <= 100
       |), fin AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |                 ORDER BY cosine DESC, vec_id) AS BIGINT) AS rank
       |  FROM rr
       |)
       |SELECT query_id, vec_id, cosine, rank FROM fin
       |WHERE rank <= ${A.K} ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x128 — the PCA fit pass as a hash-checked relation: exact
  // integer-quantized second-moment sufficient statistics (upper
  // triangle + per-dim sums + count) of the embedding corpus. Integer
  // sums are exact under ANY summation order — the property that lets a
  // cross-row aggregate of float-derived data hash at all (a
  // double-summed scatter would be at the mercy of Spark's
  // nondeterministic partial-merge order AND of catastrophic
  // cancellation in near-zero cross moments). The oracle re-quantizes
  // with the identical floor(x·2^20 + 0.5) double arithmetic and
  // re-sums in BIGINT. x129 consumes this exact relation as its fit.
  // ---------------------------------------------------------------------
  def embeddingScatterQ(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.embeddingScatter(Tables.embeddings(s, dir))
      .orderBy("i", "j")

  val embeddingScatterSql: String = {
    val dim = SimilaritySearch.PcaFixed.Dim
    val q = SimilaritySearch.PcaFixed.Quant
    s"""WITH q AS (
       |  SELECT vec_id AS vid, list_transform(embedding,
       |           x -> CAST(floor(CAST(x AS DOUBLE) * $q + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings
       |), v AS (
       |  SELECT vid, CAST(unnest(range($dim)) AS INTEGER) AS i, qv
       |  FROM q
       |), w AS (
       |  SELECT vid, i, qv[i + 1] AS val FROM v
       |)
       |SELECT a.i AS i, b.i AS j, CAST(SUM(a.val * b.val) AS BIGINT) AS s
       |FROM w a JOIN w b ON a.vid = b.vid AND b.i >= a.i
       |GROUP BY 1, 2
       |UNION ALL
       |SELECT i, $dim, CAST(SUM(val) AS BIGINT) FROM w GROUP BY 1
       |UNION ALL
       |SELECT $dim, $dim, (SELECT COUNT(*) FROM q)
       |ORDER BY i, j""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x129 — PCA reduced-scan ANN (learned principal basis over x128's
  // hash-checked fit statistics; eigensolve is fp-order-sensitive ⇒
  // rows-only, machinery pinned by x111's hash + the SimilaritySearchSpec
  // battery: orthonormality, descending moments, recall ≥ JL at equal m,
  // overfetch-degenerate ≡ exact).
  // ---------------------------------------------------------------------
  def knnPca(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.pcaTopK(s, emb, emb.filter(col("vec_id") < A.QuerySlice),
        k = A.K)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------------
  // x131 — PCA × IVF composition (project, then bucket the projections —
  // x129's named scale path made real; all stages learned ⇒ rows-only,
  // recall + pruning specs in SimilaritySearchSpec).
  // ---------------------------------------------------------------------
  def knnPcaIvf(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.pcaIvfTopK(s, emb,
        emb.filter(col("vec_id") < A.QuerySlice), k = A.K)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------------
  // x134 — probe-amplified PCA × IVF: x131 queried at PcaFixed.NProbeWide
  // of the 16 principal-space cells instead of 6 — the s41/x110
  // query-side recall knob composed into the PCA-cell regime, closing
  // x131's "widen nProbe on diffuse spectra" caveat with a measured
  // setting (recall@10 0.76 → 0.90 on the fixture = the x129 basis
  // ceiling; SimilaritySearchSpec carries the curve). Purely query-side:
  // the index is x131's, never re-bucketed.
  // ---------------------------------------------------------------------
  def knnPcaIvfProbed(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.pcaIvfTopK(s, emb,
        emb.filter(col("vec_id") < A.QuerySlice), k = A.K,
        nProbe = SimilaritySearch.PcaFixed.NProbeWide)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------------
  // x16 — winnowing (rolling-hash) fingerprint overlap pairs. Fully
  // hash-checked since the gram hash moved to engine-shared md5 top-60:
  // the oracle recomputes the positional gram hashes, the sliding-window
  // minimum (a window MIN over w rows — the i ≤ n_grams−w clamp keeps
  // exactly the kernel's windows, and greatest(...,0) reproduces the
  // short-doc global-min fallback), the df cap, and the pair counts.
  // Shared-passage guarantee additionally tested in DedupSpec.
  // ---------------------------------------------------------------------
  def winnowingOverlap(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowingOverlaps(Tables.documents(s, dir))
      .orderBy("id_a", "id_b")

  val winnowingOverlapSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), pos_h AS (
       |  SELECT doc_id,
       |         unnest(range(greatest(len(w) - 2, 0))) AS pos,
       |         len(w) - 2 AS n_grams, w
       |  FROM toks WHERE len(w) >= 3
       |), h AS (
       |  SELECT doc_id, pos, n_grams,
       |         CAST(('0x' || substr(md5(w[pos+1] || ' ' || w[pos+2] || ' ' ||
       |                                  w[pos+3]), 1, 15)) AS BIGINT) AS gh
       |  FROM pos_h
       |), sel AS (
       |  SELECT DISTINCT doc_id, wmin FROM (
       |    SELECT doc_id, pos, n_grams,
       |           MIN(gh) OVER (PARTITION BY doc_id ORDER BY pos
       |                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
       |    FROM h) t
       |  WHERE pos <= greatest(n_grams - 4, 0)
       |), rare AS (
       |  SELECT wmin FROM sel GROUP BY wmin HAVING COUNT(*) <= 20
       |), kept AS (
       |  SELECT doc_id, wmin FROM sel JOIN rare USING (wmin))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |       CAST(COUNT(*) AS BIGINT) AS shared_fps
       |FROM kept a JOIN kept b ON a.wmin = b.wmin AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING COUNT(*) >= 3
       |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // x15 — IVF ANN (learned coarse quantizer; rows-only check + recall
  // spec vs the exact baseline)
  // ---------------------------------------------------------------------
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.ivfTopK(s, emb, emb.filter(col("vec_id") < A.QuerySlice), k = A.K)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------------
  // x45 — PQ-ADC ANN (learned codebooks ⇒ rows-only check; recall spec
  // vs the exact baseline in SimilaritySearchSpec)
  // ---------------------------------------------------------------------
  def knnPq(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.pqTopK(s, emb, emb.filter(col("vec_id") < A.QuerySlice), k = A.K)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------------
  // x46 — IVF × PQ composed ANN (probe cells, ADC within them — the
  // deployable 100 TB shape; learned quantizers ⇒ rows-only check;
  // recall spec vs the exact baseline in SimilaritySearchSpec)
  // ---------------------------------------------------------------------
  def knnIvfPq(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.ivfPqTopK(s, emb, emb.filter(col("vec_id") < A.QuerySlice), k = A.K)
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------------
  // x114 — x45/x46's HASH-CHECKED twin: IVF×PQ with FIXED coarse
  // centroids (embeddings of vec_id 0..7) and FIXED codebooks (subspace
  // slices of vec_id 0..15) — the x108 fixed-centroid pattern applied
  // to the PQ family. The oracle recomputes cell assignment, the
  // per-subspace Euclidean-nearest encode, probe-cell selection, the
  // ADC lookup-sum (addends summed in subspace order for fold parity),
  // the k·refine shortlist cut, and the exact rerank value-for-value.
  // The learned x45/x46 stay the quality path (recall specs); the twin
  // pins their shared machinery at value level.
  // ---------------------------------------------------------------------
  private val X114K = SimilaritySearch.IvfPqFixed.K

  def knnIvfPqFixed(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    SimilaritySearch.ivfPqFixedTopK(emb, emb.filter(col("vec_id") < A.QuerySlice), k = X114K)
      .orderBy("query_id", "rank")
  }

  val knnIvfPqFixedSql: String = knnIvfPqFixedSqlFor("TRUE")

  /** The x114/s45/s47 PQ-ADC oracle parameterized by the INDEXED-item
    * cut: `vecPred` (over `e.vec_id`) restricts which vectors the code
    * store carries — "TRUE" is the full-table x114 convention; s49's
    * retention oracle passes the watermark predicate. The quantizer
    * CTEs (cents/cbk) and the query side stay unrestricted: the fixed
    * quantizer is a reference artifact, never retention-filtered. */
  private[queries] def knnIvfPqFixedSqlFor(vecPred: String): String = {
    // derived from the SAME constants the entry's call resolves to
    // (SimilaritySearch.IvfPqFixed + X114K), so a change to either side
    // desyncs at compile time, not at hash-check time (ADVICE r15)
    import SimilaritySearch.{IvfPqFixed => P}
    val (nLists, nProbe, m, codes) = (P.NLists, P.NProbe, P.M, P.Codes)
    val dsub = 64 / m // fixture embedding dim = 64 (TESTDATA.md)
    val kRefine = X114K * P.Refine
    def cos(a: String, b: String) =
      s"""(list_sum(list_transform(list_zip($a.embedding, $b.embedding),
         |  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         |/ (sqrt(list_sum(list_transform($a.embedding, x -> CAST(x AS DOUBLE) * x)))
         |   * sqrt(list_sum(list_transform($b.embedding, x -> CAST(x AS DOUBLE) * x)))))""".stripMargin
    def sl(rel: String) = s"list_slice($rel.embedding, js.j*$dsub+1, js.j*$dsub+$dsub)"
    def dotSl(a: String, b: String) =
      s"""list_sum(list_transform(list_zip(${sl(a)}, ${sl(b)}),
         |             x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))""".stripMargin
    lshScoreAndRankSql(
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < $nLists
         |), cbk AS (
         |  SELECT vec_id AS c, embedding FROM embeddings WHERE vec_id < $codes
         |), assign AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT e.vec_id, c.cid,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cos("e", "c")} DESC, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cents c WHERE ($vecPred)) t
         |  WHERE rn = 1
         |), js AS (SELECT unnest(range($m)) AS j
         |), enc AS (
         |  SELECT vec_id, j, c AS code FROM (
         |    SELECT e.vec_id, js.j, cbk.c,
         |           row_number() OVER (PARTITION BY e.vec_id, js.j ORDER BY
         |             (list_sum(list_transform(${sl("cbk")}, x -> CAST(x AS DOUBLE) * x))
         |              - 2 * ${dotSl("e", "cbk")}) ASC, cbk.c) AS rn
         |    FROM embeddings e CROSS JOIN js CROSS JOIN cbk) t
         |  WHERE rn = 1
         |), probes AS (
         |  SELECT query_id, cid AS cell FROM (
         |    SELECT q.vec_id AS query_id, c.cid,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${cos("q", "c")} DESC, c.cid) AS rn
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < ${A.QuerySlice}) t
         |  WHERE rn <= $nProbe
         |), adcq AS (
         |  SELECT q.vec_id AS query_id, js.j, cbk.c,
         |         ${dotSl("q", "cbk")} AS dp
         |  FROM embeddings q CROSS JOIN js CROSS JOIN cbk
         |  WHERE q.vec_id < ${A.QuerySlice}
         |), approx AS (
         |  SELECT p.query_id, a.vec_id,
         |         list_sum(list(adcq.dp ORDER BY adcq.j)) AS approx
         |  FROM assign a
         |  JOIN probes p ON a.cell = p.cell AND p.query_id <> a.vec_id
         |  JOIN enc ON enc.vec_id = a.vec_id
         |  JOIN adcq ON adcq.query_id = p.query_id AND adcq.j = enc.j
         |           AND adcq.c = enc.code
         |  GROUP BY 1, 2
         |), cand AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |               ORDER BY approx DESC, vec_id) AS rn
         |    FROM approx) t
         |  WHERE rn <= $kRefine
         |)""".stripMargin)
  }

  // ---------------------------------------------------------------------
  // s49 oracle — the PQ-ADC serve over the RETAINED code store: the
  // x114 SQL with the indexed-vector side restricted by the retention
  // watermark max(vec_id)//4 (the s46 discipline at the code grain —
  // BIGINT floor division matches the stream's Scala long division).
  // ---------------------------------------------------------------------
  lazy val retainedPqServeSql: String = knnIvfPqFixedSqlFor(
    "e.vec_id >= (SELECT max(vec_id) // 4 FROM embeddings)")

  // ---------------------------------------------------------------------
  // s37 oracle — the streamed ANN serving pipeline's batch ground
  // truth: IVF top-k with the x114 fixed centroids and NO PQ stage
  // (assignment → probe cells → exact cosine on probed candidates →
  // top-10 cut). Lives here to share cosSqlOn and the
  // lshScoreAndRankSql tail with the rest of the ANN oracles.
  // ---------------------------------------------------------------------
  private def annServeSqlAt(nProbe: Int): String = {
    import SimilaritySearch.{IvfPqFixed => P}
    def cos(a: String, b: String) = cosSqlOn(s"$a.embedding", s"$b.embedding")
    lshScoreAndRankSql(
      s"""WITH cents AS (
         |  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < ${P.NLists}
         |), assign AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT e.vec_id, c.cid,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${cos("e", "c")} DESC, c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cents c) t
         |  WHERE rn = 1
         |), probes AS (
         |  SELECT query_id, cid AS cell FROM (
         |    SELECT q.vec_id AS query_id, c.cid,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${cos("q", "c")} DESC, c.cid) AS rn
         |    FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < ${A.QuerySlice}) t
         |  WHERE rn <= $nProbe
         |), cand AS (
         |  SELECT p.query_id, a.vec_id
         |  FROM assign a JOIN probes p ON a.cell = p.cell
         |                             AND p.query_id <> a.vec_id
         |)""".stripMargin)
  }

  val annServeStreamSql: String =
    annServeSqlAt(SimilaritySearch.IvfPqFixed.NProbe)

  /** s41 oracle — s37's pipeline at the amplified serve-time probe
    * count; the index-side assignment CTE is byte-identical. */
  val annServeProbedSql: String =
    annServeSqlAt(SimilaritySearch.IvfPqFixed.NProbeWide)

  // ---------------------------------------------------------------------
  // x48 — SemDeDup: semantic dedup within learned k-means cells
  // (cluster-as-blocking + components + keep-least-typical; learned
  // centroids ⇒ rows-only check; keeper rule + totality + in-cell
  // agreement with the exact baseline spec-asserted in DedupSpec)
  // ---------------------------------------------------------------------
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Dedup.semDedup(s, Tables.embeddings(s, dir)).orderBy("vec_id")
  }

  // ---------------------------------------------------------------------
  // x102 — x48 with the cell-size cap ENGAGED (the df-cap story,
  // embedding edition): only each cell's `cellCap` most-typical members
  // participate in pair generation, bounding pair work at
  // nClusters·cellCap² on ANY corpus — mass-duplicated cliques
  // included; uncapped members pass through as keepers. Rows-only like
  // x48 (learned centroids); the cap's bound and bind are asserted on
  // a planted clique in DedupSpec.
  // ---------------------------------------------------------------------
  private val SemDedupCellCap = 25

  def semDedupCapped(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Dedup.semDedup(s, Tables.embeddings(s, dir), cellCap = SemDedupCellCap)
      .orderBy("vec_id")
  }

  // ---------------------------------------------------------------------
  // x108 — x48/x102's HASH-CHECKED twin: SemDeDup with FIXED centroids
  // (the embeddings of vec_id 0..7) instead of a learned fit. The only
  // non-SQL-expressible piece of the learned variants is the k-means
  // fit; with frozen centroids the oracle recomputes assignment
  // (argmax cosine), the cell cap, in-cell pairs, connected components
  // (WITH RECURSIVE reachability — the x106 pattern), and the
  // least-typical keeper rule, so the whole shared machinery gets a
  // value-level hash check the rows-only entries cannot give.
  // ---------------------------------------------------------------------
  def semDedupFixed(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Dedup.semDedupFixedCentroids(Tables.embeddings(s, dir),
      threshold = 0.3, nClusters = 8, cellCap = SemDedupCellCap)
      .orderBy("vec_id")
  }

  val semDedupFixedSql: String = {
    def cos(a: String, b: String) =
      s"""(list_sum(list_transform(list_zip($a.embedding, $b.embedding),
         |  x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         |/ (sqrt(list_sum(list_transform($a.embedding, x -> CAST(x AS DOUBLE) * x)))
         |   * sqrt(list_sum(list_transform($b.embedding, x -> CAST(x AS DOUBLE) * x)))))""".stripMargin
    s"""WITH RECURSIVE cents AS (
       |  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 8
       |), assign AS (
       |  SELECT vec_id, cluster, round(rawcos, 6) AS cos_to_center FROM (
       |    SELECT e.vec_id, c.cid AS cluster, ${cos("e", "c")} AS rawcos,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cos("e", "c")} DESC, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cents c) t
       |  WHERE rn = 1
       |), examined AS (
       |  SELECT cluster, vec_id, cos_to_center FROM (
       |    SELECT a.*, row_number() OVER (PARTITION BY cluster
       |      ORDER BY cos_to_center DESC, vec_id) AS rn
       |    FROM assign a) t
       |  WHERE rn <= $SemDedupCellCap
       |), pairs AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM examined x
       |  JOIN examined y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
       |  JOIN embeddings ea ON ea.vec_id = x.vec_id
       |  JOIN embeddings eb ON eb.vec_id = y.vec_id
       |  WHERE ${cos("ea", "eb")} >= 0.3
       |), edges AS (
       |  SELECT id_a AS a, id_b AS b FROM pairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM pairs
       |), reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |), comp AS (
       |  SELECT a AS vid, LEAST(a, MIN(b)) AS component
       |  FROM reach GROUP BY a
       |), labeled AS (
       |  SELECT s.vec_id, s.cluster,
       |         COALESCE(c.component, s.vec_id) AS component, s.cos_to_center
       |  FROM assign s LEFT JOIN comp c ON s.vec_id = c.vid
       |), keepers AS (
       |  SELECT component, vec_id AS keeper FROM (
       |    SELECT labeled.*, row_number() OVER (PARTITION BY component
       |      ORDER BY cos_to_center, vec_id) AS rn
       |    FROM labeled) t
       |  WHERE rn = 1)
       |SELECT l.vec_id, l.cluster, l.component, l.cos_to_center,
       |       (l.vec_id = k.keeper) AS keep
       |FROM labeled l JOIN keepers k ON l.component = k.component
       |ORDER BY l.vec_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x40 — semantic embedding clustering (SemDeDup-style topic buckets):
  // per-cluster size + cohesion summary. Centroids are learned ⇒
  // rows-only check; nearest-centroid = argmax-cosine is spec-proven.
  // ---------------------------------------------------------------------
  def embeddingClusters(s: SparkSession, dir: String): DataFrame = {
    val (assignments, _) = SimilaritySearch.clusterEmbeddings(
      s, Tables.embeddings(s, dir), nClusters = 8)
    assignments.groupBy(col("cluster"))
      .agg(count(lit(1)).as("size"),
           round(avg(col("cos_to_center")), 6).as("cohesion"))
      .orderBy("cluster")
  }

  // ---------------------------------------------------------------------
  // x116 — x40's HASH-CHECKED twin (r15): clusterEmbeddings' exact
  // max_by argmax-cosine assignment path with FIXED centroids
  // (vec_id 0..7), then the same per-cluster size/cohesion rollup. The
  // learned x40 stays the quality path; this pins the assignment
  // aggregate (the PlanSpec-pinned no-window shape) at value level.
  // cos_to_center rounds 6 in-plan so both engines average identical
  // summands.
  // ---------------------------------------------------------------------
  def embeddingClustersFixed(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    SimilaritySearch.clusterEmbeddingsFixed(Tables.embeddings(s, dir), nClusters = 8)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("size"),
           round(avg(col("cos_to_center")), 6).as("cohesion"))
      .orderBy("cluster")
  }

  val embeddingClustersFixedSql: String =
    s"""WITH cents AS (
       |  SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 8
       |), assign AS (
       |  SELECT vec_id, cluster, round(rawcos, 6) AS c6 FROM (
       |    SELECT e.vec_id, c.cid AS cluster,
       |           ${cosSqlOn("e.embedding", "c.embedding")} AS rawcos,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSqlOn("e.embedding", "c.embedding")} DESC, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cents c) t
       |  WHERE rn = 1
       |)
       |SELECT cluster, CAST(count(*) AS BIGINT) AS size,
       |       round(avg(c6), 6) AS cohesion
       |FROM assign GROUP BY cluster ORDER BY cluster""".stripMargin

  // ---------------------------------------------------------------------
  // x117 — the SYMMETRIC near-dup pair generator's HASH twin (r15):
  // embeddingNearDupsLsh with the planes FIXED at 4 (the adaptive
  // count is the only non-SQL-expressible piece — it depends on
  // count(); x14/x85 keep it and stay rows-only), so the oracle
  // recomputes bucketing, the co-bucket self-join, the DISTINCT pair
  // union across tables, and the exact cosine threshold — the pair
  // path x11/x110 (top-k) and x115 (asymmetric) do not cover.
  // ---------------------------------------------------------------------
  def embeddingNearDupLshFixed(s: SparkSession, dir: String): DataFrame = {
    VectorFunctions.register(s)
    Dedup.embeddingNearDupsLsh(Tables.embeddings(s, dir), threshold = 0.3,
        planes = 4)
      .orderBy("id_a", "id_b")
  }

  val embeddingNearDupLshFixedSql: String = {
    val hp = SimilaritySearch.hyperplanes(64, 4, 8, 42L)
    val (projDefs, _, arms) = lshScaffold(hp)
    s"""WITH p AS (
       |  SELECT vec_id,
       |       $projDefs
       |  FROM embeddings
       |), b AS (
       |  ${arms("p")}
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
       |  FROM b a JOIN b b2
       |    ON a.tbl = b2.tbl AND a.bucket = b2.bucket AND a.vec_id < b2.vec_id
       |), scored AS (
       |  SELECT c.id_a, c.id_b,
       |         ${cosSqlOn("ea.embedding", "eb.embedding")} AS cosine
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.id_a
       |  JOIN embeddings eb ON eb.vec_id = c.id_b
       |)
       |SELECT id_a, id_b, cosine FROM scored
       |WHERE cosine >= 0.3 ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x12 — multimodal feature extraction (stubbed codec, real plumbing).
  // HASH-CHECKED since r15: the fake-codec formula moved to an
  // engine-shared closed form (position-weighted byte values folded per
  // lane in double — see FakeCodec.decodeFeatures), so the oracle
  // recomputes the modality routing, byte counts, the 16 lane sums, the
  // float cast, and the norm value-for-value. The mapPartitions batch
  // plumbing (the real subject of the entry) is unchanged.
  // ---------------------------------------------------------------------
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(s, Multimodal.assetsFromDocuments(Tables.documents(s, dir)))
      .toDF()
      .select(col("asset_id"), col("modality"), col("n_bytes"), col("feature_norm"))
      .orderBy("asset_id")

  val multimodalFeaturesSql: String =
    s"""WITH chars AS (
       |  SELECT doc_id, CAST(i AS INT) AS i,
       |         unicode(substr(text, CAST(i AS INT), 1)) AS b
       |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
       |), lanes AS (
       |  SELECT doc_id, (i - 1) % 16 AS lane,
       |         list_sum(list(CAST(b * i % 9973 AS DOUBLE) / 9973.0 - 0.5
       |                       ORDER BY i)) AS f
       |  FROM chars GROUP BY 1, 2
       |), norms AS (
       |  SELECT doc_id,
       |         sqrt(list_sum(list(
       |           CAST(CAST(f AS REAL) AS DOUBLE) * CAST(f AS REAL)
       |           ORDER BY lane))) AS feature_norm
       |  FROM lanes GROUP BY doc_id
       |)
       |SELECT d.doc_id AS asset_id,
       |       CASE WHEN d.doc_id % 3 = 0 THEN 'image'
       |            WHEN d.doc_id % 3 = 1 THEN 'audio'
       |            ELSE 'video' END AS modality,
       |       CAST(octet_length(encode(d.text)) AS INT) AS n_bytes,
       |       COALESCE(n.feature_norm, 0.0) AS feature_norm
       |FROM documents d LEFT JOIN norms n USING (doc_id)
       |ORDER BY asset_id""".stripMargin

  // ---------------------------------------------------------------------
  // x13 — JSON payload parsing over events.props (A3 parse semantics,
  // batch shape: PERMISSIVE from_json + aggregate over extracted field)
  // ---------------------------------------------------------------------
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k",
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
          .getField("k"))
      .filter(col("k").isNotNull)
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count("*").as("n"), avg(col("value")).as("avg_value"))
      .orderBy("k_bucket")

  val jsonPropsSql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |       COUNT(*) AS n, AVG("value") AS avg_value
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |GROUP BY 1 ORDER BY k_bucket""".stripMargin

  // ---------------------------------------------------------------------
  // x17 — dedup-group resolution: connected components over the
  // deterministic n-gram-Jaccard near-dup pairs (large-star/small-star;
  // oracle via recursive-CTE transitive closure — tiny graph at oracle
  // scale, O(log n) rounds on the Spark side at any scale)
  // ---------------------------------------------------------------------
  def dedupComponents(s: SparkSession, dir: String): DataFrame =
    Components.connectedComponents(
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), n = 3, threshold = 0.5))
      .orderBy("doc_id")

  // the transitive-closure CTE chain shared by x17 (labels) and x37
  // (keeper selection): word-trigram Jaccard ≥ 0.5 edges, then a
  // recursive reachability walk — tiny graph at oracle scale
  private val reachCtes: String =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), grams AS (
      |  SELECT DISTINCT doc_id,
      |         unnest(list_transform(range(greatest(len(w) - 2, 0)),
      |                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
      |  FROM toks
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      |  FROM grams a JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), jac AS (
      |  SELECT id_a, id_b
      |  FROM inter
      |  JOIN sizes za ON id_a = za.doc_id
      |  JOIN sizes zb ON id_b = zb.doc_id
      |  WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i) >= 0.5
      |), edges AS (
      |  SELECT id_a AS a, id_b AS b FROM jac
      |  UNION ALL
      |  SELECT id_b, id_a FROM jac
      |), reach(a, b) AS (
      |  SELECT a, b FROM edges
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
      |)""".stripMargin

  val dedupComponentsSql: String =
    s"""WITH RECURSIVE $reachCtes
       |SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x57 — dedup-group resolution with DF-CAPPED candidate generation:
  // the corpus-scale path for x17. Candidate pairs come only from
  // shingles with document frequency ≤ CapDf (one boilerplate shingle
  // can no longer contribute O(m²) join rows); Jaccard is then EXACT
  // over candidates' full shingle sets. CapDf = 4 BINDS on the fixture
  // (max df is 7 at sf0.01), so the oracle genuinely checks the capped
  // semantics, not a no-op cap.
  //
  // PRODUCTION SIZING: maxDf should scale with the EXPECTED GENUINE
  // duplication of the corpus (how many true near-identical copies of
  // one document can exist — crawl snapshots, mirrors), NOT with corpus
  // size: a shingle shared by more documents than that is boilerplate
  // by definition, and boilerplate overlap is segment-dedup's job
  // (x43). Typical corpus values: 100–1000.
  // ---------------------------------------------------------------------
  private val CapDf = 4

  // the capped transitive-closure CTE chain shared by x57 (labels) and
  // x37 (keeper selection): candidates only from shingles with
  // df ≤ CapDf, exact word-trigram Jaccard ≥ 0.5 over the candidates'
  // FULL shingle sets, then a recursive reachability walk
  private val cappedReachCtes: String =
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), grams AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(greatest(len(w) - 2, 0)),
       |                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
       |  FROM toks
       |), df AS (
       |  SELECT sh, COUNT(*) AS df FROM grams GROUP BY sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN df ON df.sh = a.sh
       |  WHERE df.df <= $CapDf
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN cand c ON c.id_a = a.doc_id AND c.id_b = b.doc_id
       |  GROUP BY 1, 2
       |), jac AS (
       |  SELECT id_a, id_b
       |  FROM inter
       |  JOIN sizes za ON id_a = za.doc_id
       |  JOIN sizes zb ON id_b = zb.doc_id
       |  WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i) >= 0.5
       |), edges AS (
       |  SELECT id_a AS a, id_b AS b FROM jac
       |  UNION ALL
       |  SELECT id_b, id_a FROM jac
       |), reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |)""".stripMargin

  def dedupComponentsCapped(s: SparkSession, dir: String): DataFrame =
    Components.connectedComponents(
      Dedup.ngramJaccardPairsCapped(Tables.documents(s, dir),
        n = 3, threshold = 0.5, maxDf = CapDf))
      .orderBy("doc_id")

  val dedupComponentsCappedSql: String =
    s"""WITH RECURSIVE $cappedReachCtes
       |SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x37 — dedup resolution end-to-end: keep the BEST document (by the
  // x02 quality composite) of every near-dup group; singletons survive
  // as their own group. Candidates come from the DF-CAPPED generator
  // (x57's path): this is the entry a pipeline actually runs on a
  // corpus, and the uncapped shingle self-join is a measured
  // scale-killer there — ScaleCheck's boilerplate-clique fixture put it
  // at 90× shuffle + driver OOM for 10× the data, while the capped
  // generator stays ~linear (cost ≤ maxDf²/2 per shingle by
  // construction). The uncapped exact labeling remains available as
  // x17 for corpora known to be boilerplate-free.
  // ---------------------------------------------------------------------
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Components.keepBest(
        docs,
        Components.connectedComponents(
          Dedup.ngramJaccardPairsCapped(docs, n = 3, threshold = 0.5, maxDf = CapDf)),
        TF.qualityScore(col("text")))
      .orderBy("component")
  }

  val dedupKeepBestSql: String =
    s"""WITH RECURSIVE $cappedReachCtes,
       |comp AS (
       |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
       |  FROM reach GROUP BY a
       |), labeled AS (
       |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
       |         ${CurationQueries.qualitySqlExpr} AS quality
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
       |), ranked AS (
       |  SELECT *,
       |         COUNT(*) OVER (PARTITION BY component) AS group_size,
       |         row_number() OVER (PARTITION BY component
       |                            ORDER BY quality DESC, doc_id ASC) AS rn
       |  FROM labeled)
       |SELECT component, doc_id AS keeper, group_size, quality
       |FROM ranked WHERE rn = 1 ORDER BY component""".stripMargin

  // ---------------------------------------------------------------------
  // x62 — top-k most-similar pairs with DF-CAPPED candidates: the
  // corpus-scale twin of x08 (whose uncapped blocking join shares x17's
  // boilerplate pathology). TopKCapDf = 3 BINDS on the RANKED OUTPUT at
  // sf0.01 (measured: the top-50 list first differs from x08's below
  // cap 4 — higher caps change only the candidate set, and the excluded
  // low-df-starved pairs never ranked), so the oracle genuinely checks
  // capped semantics end-to-end.
  // ---------------------------------------------------------------------
  private val TopKCapDf = 3

  def ngramTopKCapped(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardTopKCapped(Tables.documents(s, dir),
      n = 3, k = 50, maxDf = TopKCapDf)

  val ngramTopKCappedSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), grams AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(greatest(len(w) - 2, 0)),
       |                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
       |  FROM toks
       |), df AS (
       |  SELECT sh, COUNT(*) AS df FROM grams GROUP BY sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN df ON df.sh = a.sh
       |  WHERE df.df <= $TopKCapDf
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN cand c ON c.id_a = a.doc_id AND c.id_b = b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |       CAST(i AS DOUBLE) / (za.sz + zb.sz - i) AS jaccard
       |FROM inter
       |JOIN sizes za ON id_a = za.doc_id
       |JOIN sizes zb ON id_b = zb.doc_id
       |ORDER BY jaccard DESC, id_a, id_b LIMIT 50""".stripMargin

  // ---------------------------------------------------------------------
  // x83 — SPLIT-LEAKAGE audit: near-duplicate pairs that CROSS the
  // deterministic train/val/test boundary — the "is the eval split
  // already in train through a near-duplicate" check every training
  // pipeline needs before trusting its held-out metrics (x20 keeps a
  // single document's split stable, but near-dup FAMILIES straddle
  // splits whenever their members' ids hash to different buckets; x26
  // catches only EXACT shared n-grams against a designated benchmark
  // set — this audits fuzzy overlap across the split boundary itself).
  // Composition of two measured-bounded pieces, nothing new to scale:
  // candidates come from the df-capped generator (x62's cap — bounded
  // on the clique pathology and ~linear at 100×), and the split is a
  // pure row-local function of the id (Curation.splitOf), so labeling
  // the pairs costs ZERO additional shuffles — no join against a split
  // relation anywhere in the plan.
  // ---------------------------------------------------------------------
  private val LeakThreshold = 0.5

  /** The cross-split near-dup pair relation x83, x97, and x99 all
    * consume — factored so the quarantine and the release gate reuse
    * ONE computation of the most expensive audit relation instead of
    * re-running the df-capped shingle join per consumer. */
  private[queries] def crossingPairs(docs: DataFrame): DataFrame =
    Dedup.ngramJaccardPairsCapped(docs,
        n = 3, threshold = LeakThreshold, maxDf = TopKCapDf)
      .withColumn("split_a", Curation.splitOf(col("id_a")))
      .withColumn("split_b", Curation.splitOf(col("id_b")))
      .filter(col("split_a") =!= col("split_b"))

  def splitLeakage(s: SparkSession, dir: String): DataFrame =
    crossingPairs(Tables.documents(s, dir))
      .select("id_a", "split_a", "id_b", "split_b", "jaccard")
      .orderBy("id_a", "id_b")

  val splitLeakageSql: String = {
    def splitCase(id: String) =
      s"""CASE WHEN substr(md5(CAST($id AS VARCHAR)), 1, 2) < '${Curation.TrainUpper}' THEN 'train'
         |     WHEN substr(md5(CAST($id AS VARCHAR)), 1, 2) < '${Curation.ValUpper}' THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), grams AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(greatest(len(w) - 2, 0)),
       |                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
       |  FROM toks
       |), df AS (
       |  SELECT sh, COUNT(*) AS df FROM grams GROUP BY sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN df ON df.sh = a.sh
       |  WHERE df.df <= $TopKCapDf
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN cand c ON c.id_a = a.doc_id AND c.id_b = b.doc_id
       |  GROUP BY 1, 2
       |), jac AS (
       |  SELECT id_a, ${splitCase("id_a")} AS split_a,
       |         id_b, ${splitCase("id_b")} AS split_b,
       |         CAST(i AS DOUBLE) / (za.sz + zb.sz - i) AS jaccard
       |  FROM inter
       |  JOIN sizes za ON id_a = za.doc_id
       |  JOIN sizes zb ON id_b = zb.doc_id)
       |SELECT id_a, split_a, id_b, split_b, jaccard FROM jac
       |WHERE jaccard >= $LeakThreshold AND split_a <> split_b
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x99 — the corpus RELEASE GATE: one row, the sign-off summary a
  // release pipeline blocks on — corpus size (docs/tokens), exact-dup
  // count, split-leakage pair count and the quarantine size (x83/x97),
  // the Zipf-spectrum fit (x89's template-flood gauge), and mean
  // quality. The audits-to-actions arc (detect → quarantine → gate)
  // ends here: every number is a 1-row aggregate of a measured-bounded
  // relation, so the gate costs what its audits cost and the assembly
  // is four cross-joins of single rows.
  // ---------------------------------------------------------------------
  // Gate thresholds — the "block the release when" envelope, shared by
  // the Spark gate and the DuckDB oracle so the verdict itself is
  // hash-checked. Rates, not absolute counts, so the same gate holds at
  // any corpus size; the Zipf envelope encodes "natural text" (slope
  // near -1, tight fit) — a template-flooded or synthetic corpus (this
  // repo's fixture included) correctly trips it.
  val GateMaxDupFrac  = 0.01
  val GateMaxLeakFrac = 0.01
  val GateMaxQuarFrac = 0.02
  val GateMaxRepFrac  = 0.01
  val GateSlopeLo     = -1.5
  val GateSlopeHi     = -0.5
  val GateMinR2       = 0.9
  val GateMinQuality  = 0.5

  /** The gate on an explicit corpus — the spec plants passing and
    * breaching corpora through this. `crossingPairs` (the expensive
    * audit relation) is computed ONCE and pinned; leak count and
    * quarantine count both read the pin. */
  private[graft] def releaseGateOn(docs: DataFrame): DataFrame = {
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(TF.tokenCount(col("text")).cast("long")).as("n_tokens"),
      (count(lit(1)) - count_distinct(TF.fingerprint(col("text"))))
        .as("n_exact_dups"),
      round(avg(TF.qualityScore(col("text"))), 6).as("mean_quality"),
      // the x107 repetition battery as a GATE input: docs breaching the
      // per-doc Gopher rule (row-local kernels — the count rides the
      // same single-pass aggregate as the other corpus stats)
      sum(when(Curation.repetitiveFlag(col("text")), 1L).otherwise(0L))
        .cast("long").as("n_repetitive"))
    val pairs = crossingPairs(docs).localCheckpoint() // one audit, two consumers
    val leaks = pairs.agg(count(lit(1)).as("n_leak_pairs"))
    val quar = quarantineOf(pairs).agg(count(lit(1)).as("n_quarantined"))
    val zipf = Curation.zipfFit(docs)
      .select(col("slope").as("zipf_slope"), col("r2").as("zipf_r2"))
    base.crossJoin(leaks).crossJoin(quar).crossJoin(zipf)
      // the rate fractions divide by n_docs: on an EMPTY corpus Spark's
      // double division yields NaN (NaN > t = false → breach silently
      // waved through) while DuckDB yields NULL (breach/pass NULL), so
      // the two engines would DISAGREE on the degenerate input. An
      // unjudgeable corpus must BLOCK on both — same NULL-is-a-breach
      // contract as breach_zipf below. The guard is an explicit
      // n_docs = 0 branch (not coalesce: coalesce passes NaN through).
      .withColumn("breach_exact_dups",
        when(col("n_docs") === 0, lit(true)).otherwise(
          col("n_exact_dups").cast("double") / col("n_docs") > GateMaxDupFrac))
      .withColumn("breach_leakage",
        when(col("n_docs") === 0, lit(true)).otherwise(
          col("n_leak_pairs").cast("double") / col("n_docs") > GateMaxLeakFrac))
      .withColumn("breach_quarantine",
        when(col("n_docs") === 0, lit(true)).otherwise(
          col("n_quarantined").cast("double") / col("n_docs") > GateMaxQuarFrac))
      .withColumn("breach_repetition",
        when(col("n_docs") === 0, lit(true)).otherwise(
          col("n_repetitive").cast("double") / col("n_docs") > GateMaxRepFrac))
      // a NULL fit (x89's degenerate-spectrum contract) is a breach:
      // "could not judge" must block, not wave through
      .withColumn("breach_zipf", coalesce(
        !(col("zipf_slope").between(GateSlopeLo, GateSlopeHi) &&
          col("zipf_r2") >= GateMinR2), lit(true)))
      .withColumn("breach_quality",
        coalesce(col("mean_quality") < GateMinQuality, lit(true)))
      .withColumn("pass",
        !(col("breach_exact_dups") || col("breach_leakage") ||
          col("breach_quarantine") || col("breach_repetition") ||
          col("breach_zipf") || col("breach_quality")))
  }

  def releaseGate(s: SparkSession, dir: String): DataFrame =
    releaseGateOn(Tables.documents(s, dir))

  // lazy: references splitLeakageSql, declared later in this
  // object — forced from `all` at the END of init, when every val is
  // populated (the Curation.SpanGramN incident's lesson applied to
  // same-object ordering)
  lazy val releaseGateSql: String =
    s"""WITH pairs AS ($splitLeakageSql),
       |${CurationQueries.repetitionCtes("documents")},
       |quar AS (
       |  SELECT doc_id, split FROM (
       |    SELECT id_a AS doc_id, split_a AS split FROM pairs
       |    UNION ALL
       |    SELECT id_b AS doc_id, split_b AS split FROM pairs) s
       |  WHERE split <> 'train' GROUP BY doc_id, split),
       |zipf AS (${CurationQueries.zipfFitSql}),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(${CurationQueries.nTok}) AS BIGINT) AS n_tokens,
       |         CAST(count(*) - count(DISTINCT md5($normalizedSql)) AS BIGINT)
       |           AS n_exact_dups,
       |         round(avg(${CurationQueries.qualitySqlExpr}), 6) AS mean_quality,
       |         (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_leak_pairs,
       |         (SELECT CAST(COUNT(*) AS BIGINT) FROM quar) AS n_quarantined,
       |         (SELECT CAST(COUNT(*) AS BIGINT) FROM rp
       |          WHERE ${CurationQueries.repetitiveSqlExpr}) AS n_repetitive,
       |         (SELECT slope FROM zipf) AS zipf_slope,
       |         (SELECT r2 FROM zipf) AS zipf_r2
       |  FROM documents),
       |b AS (
       |  SELECT g.*,
       |    CASE WHEN n_docs = 0 THEN TRUE
       |         ELSE CAST(n_exact_dups AS DOUBLE) / n_docs > $GateMaxDupFrac
       |    END AS breach_exact_dups,
       |    CASE WHEN n_docs = 0 THEN TRUE
       |         ELSE CAST(n_leak_pairs AS DOUBLE) / n_docs > $GateMaxLeakFrac
       |    END AS breach_leakage,
       |    CASE WHEN n_docs = 0 THEN TRUE
       |         ELSE CAST(n_quarantined AS DOUBLE) / n_docs > $GateMaxQuarFrac
       |    END AS breach_quarantine,
       |    CASE WHEN n_docs = 0 THEN TRUE
       |         ELSE CAST(n_repetitive AS DOUBLE) / n_docs > $GateMaxRepFrac
       |    END AS breach_repetition,
       |    COALESCE(NOT (zipf_slope BETWEEN $GateSlopeLo AND $GateSlopeHi
       |                  AND zipf_r2 >= $GateMinR2), TRUE) AS breach_zipf,
       |    COALESCE(mean_quality < $GateMinQuality, TRUE) AS breach_quality
       |  FROM g)
       |SELECT b.*,
       |  NOT (breach_exact_dups OR breach_leakage OR breach_quarantine
       |       OR breach_repetition OR breach_zipf OR breach_quality) AS pass
       |FROM b""".stripMargin

  // ---------------------------------------------------------------------
  // x91 — embedding-table HEALTH audit: per-label dimension
  // consistency, zero-norm counts, and the L2-norm envelope — the
  // pre-flight check before trusting any ANN/dedup built on the table.
  // Row-local norm via the codegen'd dot_product kernel (sequential
  // fold, matching DuckDB's list_sum order), one label-grain shuffle.
  // ---------------------------------------------------------------------
  def embeddingHealthQ(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.embeddingHealth(Tables.embeddings(s, dir))

  val embeddingHealthSql: String =
    """WITH v AS (
      |  SELECT label, len(embedding) AS dim,
      |         sqrt(list_sum(list_transform(embedding,
      |                                      x -> CAST(x AS DOUBLE) * x))) AS nrm
      |  FROM embeddings)
      |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
      |       CAST(min(dim) AS INT) AS dim_min, CAST(max(dim) AS INT) AS dim_max,
      |       CAST(SUM(CASE WHEN nrm < 1e-6 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_zero_norm,
      |       round(avg(nrm), 6) AS mean_norm,
      |       round(min(nrm), 6) AS min_norm,
      |       round(max(nrm), 6) AS max_norm
      |FROM v GROUP BY label ORDER BY label""".stripMargin

  // ---------------------------------------------------------------------
  // x92 — label-centroid SEPARATION audit: pairwise cosine between
  // label centroids ("are these classes actually separable"). The
  // corpus collapses to the (label, dim) grain in one partial-agg'd
  // shuffle (map-side combine keeps the exchange model-sized);
  // centroid components round(6) in-plan on BOTH engines, final
  // cosine rounds again.
  // ---------------------------------------------------------------------
  def centroidSeparationQ(s: SparkSession, dir: String): DataFrame =
    SimilaritySearch.centroidSeparation(Tables.embeddings(s, dir))

  val centroidSeparationSql: String =
    """WITH e AS (
      |  SELECT label, unnest(embedding) AS v,
      |         generate_subscripts(embedding, 1) AS pos
      |  FROM embeddings),
      |c AS (
      |  SELECT label, pos, round(avg(CAST(v AS DOUBLE)), 6) AS cv
      |  FROM e GROUP BY 1, 2),
      |n AS (SELECT label, sqrt(SUM(cv*cv)) AS nrm FROM c GROUP BY 1),
      |p AS (
      |  SELECT a.label AS label_a, b.label AS label_b, SUM(a.cv*b.cv) AS dot
      |  FROM c a JOIN c b ON a.pos = b.pos AND a.label < b.label
      |  GROUP BY 1, 2)
      |SELECT label_a, label_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
      |FROM p JOIN n na ON label_a = na.label JOIN n nb ON label_b = nb.label
      |ORDER BY label_a, label_b""".stripMargin

  // ---------------------------------------------------------------------
  // x97 — leakage QUARANTINE: the remediation step that completes the
  // x83 audit. Rule (stated, deterministic): a document is quarantined
  // iff it is NOT in train and appears in at least one cross-split
  // near-dup pair — evaluating on it would measure memorization, not
  // generalization, because a near-duplicate sits on the other side of
  // the boundary. Train members stay (removing training data is x37's
  // dedup decision, not the eval-hygiene one). Output: the quarantine
  // list with per-doc evidence (how many crossings, worst Jaccard) —
  // the actionable artifact a release pipeline consumes to rebuild its
  // eval sets. Composition of the measured-bounded x83 relation + a
  // doc-grain aggregate; zero new scale surface.
  // ---------------------------------------------------------------------
  /** The quarantine aggregate over an already-computed crossing-pairs
    * relation — shared by the x97 entry and x99's gate (which passes a
    * pinned `pairs` so the audit runs once per gate evaluation). */
  private[queries] def quarantineOf(pairs: DataFrame): DataFrame = {
    val p = pairs.localCheckpoint() // feeds both union sides; pairs-sized
    val sides =
      p.select(col("id_a").as("doc_id"), col("split_a").as("split"),
               col("jaccard"))
        .unionAll(p.select(col("id_b").as("doc_id"),
                           col("split_b").as("split"), col("jaccard")))
    sides.filter(col("split") =!= "train")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_cross_dups"), max(col("jaccard")).as("max_jaccard"))
  }

  def leakageQuarantine(s: SparkSession, dir: String): DataFrame =
    quarantineOf(crossingPairs(Tables.documents(s, dir))).orderBy("doc_id")

  // ---------------------------------------------------------------------
  // x105 — CLEAN SPLITS: the release action the quarantine feeds — the
  // per-split composition a release actually ships AFTER x97 removes
  // the contaminated eval members. One row per split: surviving docs
  // and tokens plus how many the quarantine removed. The arc's last
  // artifact: detect (x83/x84/x95) → quarantine (x97) → gate (x99) →
  // SHIP (x105). Composition of the measured-bounded x97 relation +
  // one split-grain aggregate; the quarantine side is pairs-sized, so
  // the join back to the corpus broadcasts at any scale.
  // ---------------------------------------------------------------------
  def cleanSplits(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val quarantined = quarantineOf(crossingPairs(docs))
      .select(col("doc_id"), lit(1).as("__q"))
    docs.withColumn("split", Curation.splitOf(col("doc_id")))
      .join(quarantined, Seq("doc_id"), "left")
      .groupBy(col("split"))
      .agg(
        sum(when(col("__q").isNull, 1L).otherwise(0L)).as("n_docs"),
        sum(when(col("__q").isNull, TF.tokenCount(col("text")).cast("long"))
          .otherwise(0L)).as("n_tokens"),
        sum(when(col("__q").isNotNull, 1L).otherwise(0L)).as("n_quarantined"))
      .orderBy("split")
  }

  lazy val cleanSplitsSql: String = {
    def splitCase(id: String) =
      s"""CASE WHEN substr(md5(CAST($id AS VARCHAR)), 1, 2) < '${Curation.TrainUpper}' THEN 'train'
         |     WHEN substr(md5(CAST($id AS VARCHAR)), 1, 2) < '${Curation.ValUpper}' THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH quar AS ($leakageQuarantineSql),
       |d AS (
       |  SELECT doc_id, ${splitCase("doc_id")} AS split,
       |         ${CurationQueries.nTok} AS n_tokens,
       |         doc_id IN (SELECT doc_id FROM quar) AS q
       |  FROM documents)
       |SELECT split,
       |       CAST(SUM(CASE WHEN q THEN 0 ELSE 1 END) AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN q THEN 0 ELSE n_tokens END) AS BIGINT)
       |         AS n_tokens,
       |       CAST(SUM(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_quarantined
       |FROM d GROUP BY split ORDER BY split""".stripMargin
  }

  val leakageQuarantineSql: String = {
    def splitCase(id: String) =
      s"""CASE WHEN substr(md5(CAST($id AS VARCHAR)), 1, 2) < '${Curation.TrainUpper}' THEN 'train'
         |     WHEN substr(md5(CAST($id AS VARCHAR)), 1, 2) < '${Curation.ValUpper}' THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), grams AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(greatest(len(w) - 2, 0)),
       |                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
       |  FROM toks
       |), df AS (
       |  SELECT sh, COUNT(*) AS df FROM grams GROUP BY sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN df ON df.sh = a.sh
       |  WHERE df.df <= $TopKCapDf
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN cand c ON c.id_a = a.doc_id AND c.id_b = b.doc_id
       |  GROUP BY 1, 2
       |), jac AS (
       |  SELECT id_a, ${splitCase("id_a")} AS split_a,
       |         id_b, ${splitCase("id_b")} AS split_b,
       |         CAST(i AS DOUBLE) / (za.sz + zb.sz - i) AS jaccard
       |  FROM inter
       |  JOIN sizes za ON id_a = za.doc_id
       |  JOIN sizes zb ON id_b = zb.doc_id
       |  WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i) >= $LeakThreshold
       |), crossing AS (
       |  SELECT * FROM jac WHERE split_a <> split_b
       |), sides AS (
       |  SELECT id_a AS doc_id, split_a AS split, jaccard FROM crossing
       |  UNION ALL
       |  SELECT id_b AS doc_id, split_b AS split, jaccard FROM crossing)
       |SELECT doc_id, split, CAST(COUNT(*) AS BIGINT) AS n_cross_dups,
       |       MAX(jaccard) AS max_jaccard
       |FROM sides WHERE split <> 'train'
       |GROUP BY doc_id, split ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x88 — asymmetric CONTAINMENT pairs (df-capped candidates): the
  // quote/subset detector Jaccard cannot express — a short document
  // fully embedded in a long one has containment 1.0 but Jaccard near
  // zero, so x08/x62's symmetric threshold either misses it or drowns
  // in noise. Candidates share x62's df-capped generator (bounded on
  // the clique pathology, ~linear at 100×); containment is then EXACT
  // over the candidates' full shingle sets. On the fixture corpus the
  // binding pairs are the exact-dup families (both directions 1.0);
  // the asymmetric case — subset caught at Jaccard ≈ 0.07 — is proved
  // on a planted corpus in DedupSpec, where symmetric thresholds
  // structurally cannot rank it.
  // ---------------------------------------------------------------------
  private val ContainThreshold = 0.8

  def ngramContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramContainmentPairsCapped(Tables.documents(s, dir),
        n = 3, threshold = ContainThreshold, maxDf = TopKCapDf)
      .orderBy("id_a", "id_b")

  val ngramContainmentSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), grams AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(greatest(len(w) - 2, 0)),
       |                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
       |  FROM toks
       |), df AS (
       |  SELECT sh, COUNT(*) AS df FROM grams GROUP BY sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN df ON df.sh = a.sh
       |  WHERE df.df <= $TopKCapDf
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN cand c ON c.id_a = a.doc_id AND c.id_b = b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b,
       |       CAST(i AS DOUBLE) / za.sz AS cont_a_in_b,
       |       CAST(i AS DOUBLE) / zb.sz AS cont_b_in_a
       |FROM inter
       |JOIN sizes za ON id_a = za.doc_id
       |JOIN sizes zb ON id_b = zb.doc_id
       |WHERE greatest(CAST(i AS DOUBLE) / za.sz, CAST(i AS DOUBLE) / zb.sz)
       |      >= $ContainThreshold
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // x63 — cross-corpus dedup with DF-CAPPED candidates: the
  // corpus-scale twin of x38. Shingles must be rare on BOTH sides
  // (df ≤ cap within each corpus separately) to generate a candidate —
  // bounding the per-shingle join product at cap² no matter how much
  // boilerplate the two crawls share. CrossCapDf = 1 ("unique-match
  // blocking": the shingle occurs exactly once per side) is the ONLY
  // value that BINDS on the fixture's 12-pair result at sf0.01
  // (measured: one genuine pair's shared shingles all reach df 2 on a
  // side, so it drops at cap 1 and the oracle checks the capped
  // semantics, not a no-op); production sizing follows the x57 note.
  // ---------------------------------------------------------------------
  private val CrossCapDf = 1

  def crossCorpusCapped(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val srcNum = expr("CAST(substring(source, 4) AS INT)")
    Dedup.ngramJaccardCrossCapped(
        docs.filter(srcNum < 10), docs.filter(srcNum >= 10),
        n = 3, threshold = 0.5, maxDf = CrossCapDf)
      .orderBy("id_in", "id_ref")
  }

  val crossCorpusCappedSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
       |), grams AS (
       |  SELECT DISTINCT doc_id, CAST(substr(source, 4) AS INT) AS sn,
       |         unnest(list_transform(range(greatest(len(w) - 2, 0)),
       |                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
       |  FROM toks
       |), din AS (
       |  SELECT sh, COUNT(*) AS c FROM grams WHERE sn < 10 GROUP BY sh
       |), dref AS (
       |  SELECT sh, COUNT(*) AS c FROM grams WHERE sn >= 10 GROUP BY sh
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_in, b.doc_id AS id_ref
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh
       |  JOIN din ON din.sh = a.sh
       |  JOIN dref ON dref.sh = a.sh
       |  WHERE a.sn < 10 AND b.sn >= 10 AND din.c <= $CrossCapDf AND dref.c <= $CrossCapDf
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
       |), inter AS (
       |  SELECT a.doc_id AS id_in, b.doc_id AS id_ref, COUNT(*) AS i
       |  FROM grams a
       |  JOIN grams b ON a.sh = b.sh
       |  JOIN cand c ON c.id_in = a.doc_id AND c.id_ref = b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_in, id_ref,
       |       CAST(i AS DOUBLE) / (za.sz + zb.sz - i) AS jaccard
       |FROM inter
       |JOIN sizes za ON id_in = za.doc_id
       |JOIN sizes zb ON id_ref = zb.doc_id
       |WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i) >= 0.5
       |ORDER BY id_in, id_ref""".stripMargin

  // ---------------------------------------------------------------------
  // x64/x65 — exact duplicated-substring spans (Lee et al. 2022's
  // ExactSubstr dedup re-expressed relationally; reference family:
  // whole-doc x05, segment x43, near-dup x57 — this is the SPAN grain).
  // SpanGramN = 4 on the fixture: at n = 4 the corpus has multi-span
  // documents (369 docs / 643 spans at sf0.01), so the gaps-and-islands
  // break ("pos > prev_end + 1") and multi-island grouping are both
  // exercised; at n ≥ 6 every affected doc collapses to one span and
  // the merge logic would be vacuous. Production sizing: n IS the
  // Lee-et-al. min-span length (they use 50).
  // ---------------------------------------------------------------------
  private[graft] val SpanGramN = Curation.SpanGramN

  def dupSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(Tables.documents(s, dir), n = SpanGramN)
      .orderBy("doc_id", "span_start")

  private def spanCtes(k: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), grams AS (
       |  SELECT doc_id, i AS pos, array_to_string(w[i+1:i+$k], ' ') AS sh
       |  FROM toks, LATERAL unnest(range(greatest(len(w)-${k - 1}, 0))) AS t(i)
       |), occ AS (
       |  SELECT sh FROM grams GROUP BY sh HAVING COUNT(*) >= 2
       |), flagged AS (
       |  SELECT g.doc_id, g.pos FROM grams g JOIN occ USING (sh)
       |), w1 AS (
       |  SELECT doc_id, pos,
       |         MAX(pos + ${k - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM flagged
       |), w2 AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN prev_end IS NULL OR pos > prev_end + 1
       |              THEN 1 ELSE 0 END AS brk
       |  FROM w1
       |), w3 AS (
       |  SELECT doc_id, pos,
       |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM w2
       |), spans AS (
       |  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + ${k - 1} AS span_end,
       |         COUNT(*) AS n_grams
       |  FROM w3 GROUP BY doc_id, island
       |)""".stripMargin

  val dupSpansSql: String =
    s"""${spanCtes(SpanGramN)}
       |SELECT doc_id, span_start, span_end,
       |       span_end - span_start + 1 AS span_tokens, n_grams
       |FROM spans ORDER BY doc_id, span_start""".stripMargin

  // x66 — the full ExactSubstr CLEANER over the same gram grain: keep
  // the corpus-wide first occurrence of every duplicated gram, remove
  // every token covered only by later occurrences, reassemble the text.
  // The fixture exercises all three outcomes at sf0.01: untouched docs,
  // partially-cleaned docs, and at least one doc cleaned to "".
  def spanDedupCleanQ(s: SparkSession, dir: String): DataFrame =
    Dedup.spanDedupClean(Tables.documents(s, dir), n = SpanGramN)
      .orderBy("doc_id")

  val spanDedupCleanSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), grams AS (
       |  SELECT doc_id, i AS pos, array_to_string(w[i+1:i+$SpanGramN], ' ') AS sh
       |  FROM toks, LATERAL unnest(range(greatest(len(w)-${SpanGramN - 1}, 0))) AS t(i)
       |), dups AS (
       |  SELECT sh, MIN(doc_id * 1048576 + pos) AS fk
       |  FROM grams GROUP BY sh HAVING COUNT(*) >= 2
       |), nonfirst AS (
       |  SELECT g.doc_id, g.pos
       |  FROM grams g JOIN dups d USING (sh)
       |  WHERE g.doc_id * 1048576 + g.pos <> d.fk
       |), removed AS (
       |  SELECT DISTINCT nf.doc_id, nf.pos + r.i AS tp
       |  FROM nonfirst nf, LATERAL unnest(range($SpanGramN)) AS r(i)
       |), toklist AS (
       |  SELECT t.doc_id, p.i AS tp, w[p.i + 1] AS tok
       |  FROM toks t, LATERAL unnest(range(len(w))) AS p(i)
       |), kept AS (
       |  SELECT k.doc_id, string_agg(k.tok, ' ' ORDER BY k.tp) AS cleaned_text,
       |         COUNT(*) AS kept_tokens
       |  FROM toklist k
       |  WHERE NOT EXISTS (SELECT 1 FROM removed r
       |                    WHERE r.doc_id = k.doc_id AND r.tp = k.tp)
       |  GROUP BY k.doc_id
       |)
       |SELECT t.doc_id,
       |       COALESCE(cleaned_text, '') AS cleaned_text,
       |       COALESCE(kept_tokens, 0) AS kept_tokens,
       |       len(w) - COALESCE(kept_tokens, 0) AS removed_tokens
       |FROM toks t LEFT JOIN kept USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  // x67 — CROSS-corpus span cleaning: scrub from the incoming crawl
  // (src0–9, the x38/x63 split) every >=4-token span present anywhere
  // in the reference corpus (src10+). At sf0.01 the fixture exercises
  // all three outcomes: 127 untouched, 118 partially-scrubbed, 5
  // emptied of the 250 incoming docs.
  def crossSpanCleanQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val srcNum = expr("CAST(substring(source, 4) AS INT)")
    Dedup.crossSpanClean(docs.filter(srcNum < 10), docs.filter(srcNum >= 10),
        n = SpanGramN)
      .orderBy("doc_id")
  }

  val crossSpanCleanSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(substring(source, 4) AS INT) AS sn,
       |         string_split(text, ' ') AS w
       |  FROM documents
       |), inc AS (
       |  SELECT doc_id, w FROM d WHERE sn < 10
       |), ref AS (
       |  SELECT w FROM d WHERE sn >= 10
       |), refg AS (
       |  SELECT DISTINCT array_to_string(w[i+1:i+$SpanGramN], ' ') AS sh
       |  FROM ref, LATERAL unnest(range(greatest(len(w)-${SpanGramN - 1}, 0))) AS t(i)
       |), incg AS (
       |  SELECT doc_id, i AS pos, array_to_string(w[i+1:i+$SpanGramN], ' ') AS sh
       |  FROM inc, LATERAL unnest(range(greatest(len(w)-${SpanGramN - 1}, 0))) AS t(i)
       |), flagged AS (
       |  SELECT DISTINCT g.doc_id, g.pos FROM incg g JOIN refg USING (sh)
       |), removed AS (
       |  SELECT DISTINCT f.doc_id, f.pos + r.i AS tp
       |  FROM flagged f, LATERAL unnest(range($SpanGramN)) AS r(i)
       |), toklist AS (
       |  SELECT doc_id, p.i AS tp, w[p.i + 1] AS tok
       |  FROM inc, LATERAL unnest(range(len(w))) AS p(i)
       |), kept AS (
       |  SELECT k.doc_id, string_agg(tok, ' ' ORDER BY tp) AS cleaned_text,
       |         COUNT(*) AS kept_tokens
       |  FROM toklist k
       |  WHERE NOT EXISTS (SELECT 1 FROM removed r
       |                    WHERE r.doc_id = k.doc_id AND r.tp = k.tp)
       |  GROUP BY k.doc_id
       |)
       |SELECT i.doc_id,
       |       COALESCE(cleaned_text, '') AS cleaned_text,
       |       COALESCE(kept_tokens, 0) AS kept_tokens,
       |       len(w) - COALESCE(kept_tokens, 0) AS removed_tokens
       |FROM inc i LEFT JOIN kept USING (doc_id)
       |ORDER BY i.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x95 — max shared span per incoming doc: the "how bad is the worst
  // leak" triage metric between x26's binary flag and x67's scrub.
  // Same incoming/reference source split and gram grain as x67, so the
  // fixture facts carry over (127/118/5 untouched/partial/emptied).
  // ---------------------------------------------------------------------
  def maxSharedSpanQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val srcNum = expr("CAST(substring(source, 4) AS INT)")
    Dedup.maxSharedSpan(docs.filter(srcNum < 10), docs.filter(srcNum >= 10),
        n = SpanGramN)
      .orderBy("doc_id")
  }

  val maxSharedSpanSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(substring(source, 4) AS INT) AS sn,
       |         string_split(text, ' ') AS w
       |  FROM documents
       |), inc AS (
       |  SELECT doc_id, w FROM d WHERE sn < 10
       |), ref AS (
       |  SELECT w FROM d WHERE sn >= 10
       |), refg AS (
       |  SELECT DISTINCT array_to_string(w[i+1:i+$SpanGramN], ' ') AS sh
       |  FROM ref, LATERAL unnest(range(greatest(len(w)-${SpanGramN - 1}, 0))) AS t(i)
       |), incg AS (
       |  SELECT doc_id, i AS pos, array_to_string(w[i+1:i+$SpanGramN], ' ') AS sh
       |  FROM inc, LATERAL unnest(range(greatest(len(w)-${SpanGramN - 1}, 0))) AS t(i)
       |), m AS (
       |  SELECT DISTINCT g.doc_id, g.pos FROM incg g JOIN refg USING (sh)
       |), w1 AS (
       |  SELECT doc_id, pos,
       |         MAX(pos + ${SpanGramN - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM m
       |), w2 AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN prev_end IS NULL OR pos > prev_end + 1
       |              THEN 1 ELSE 0 END AS brk
       |  FROM w1
       |), w3 AS (
       |  SELECT doc_id, pos,
       |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM w2
       |), spans AS (
       |  SELECT doc_id, MIN(pos) AS s, MAX(pos) + ${SpanGramN - 1} AS e,
       |         COUNT(*) AS g
       |  FROM w3 GROUP BY doc_id, island
       |), perdoc AS (
       |  SELECT doc_id, CAST(MAX(e - s + 1) AS BIGINT) AS max_shared_tokens,
       |         CAST(SUM(g) AS BIGINT) AS n_shared_grams,
       |         CAST(COUNT(*) AS BIGINT) AS n_spans
       |  FROM spans GROUP BY doc_id)
       |SELECT i.doc_id,
       |       COALESCE(max_shared_tokens, 0) AS max_shared_tokens,
       |       COALESCE(n_shared_grams, 0) AS n_shared_grams,
       |       COALESCE(n_spans, 0) AS n_spans
       |FROM inc i LEFT JOIN perdoc USING (doc_id)
       |ORDER BY i.doc_id""".stripMargin

  def dupSpanProfile(s: SparkSession, dir: String): DataFrame =
    Dedup.spanDupProfile(Tables.documents(s, dir), n = SpanGramN)
      .orderBy("doc_id")

  val dupSpanProfileSql: String =
    s"""${spanCtes(SpanGramN)},
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS n_spans,
       |         CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_tokens
       |  FROM spans GROUP BY doc_id
       |)
       |SELECT t.doc_id,
       |       COALESCE(n_spans, 0) AS n_spans,
       |       COALESCE(dup_tokens, 0) AS dup_tokens,
       |       len(w) AS total_tokens,
       |       round(COALESCE(dup_tokens, 0) / len(w), 6) AS dup_ratio
       |FROM toks t LEFT JOIN perdoc USING (doc_id)
       |ORDER BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x70 — edit-distance similarity join on 30-char title prefixes:
  // the SHORT-STRING near-dup grain (titles/URLs/product names), where
  // one typo is one edit rather than a destroyed token. Blocking =
  // Gravano et al. positional q-gram count filter (q=4, d=5: pairs
  // within 5 edits share >= 30-3-20 = 7 position-aligned grams);
  // verify = exact threshold levenshtein over candidates only. Both
  // engines ship a native levenshtein, so the entry is fully
  // hash-oracled end-to-end. EdMaxOcc caps each gram's blocking
  // contribution (the x57-style boilerplate guard).
  // ---------------------------------------------------------------------
  private val EdPrefix  = 30
  private val EdQ       = 4
  private val EdMaxDist = 5
  private val EdMaxOcc  = 200

  // The corpus's planted near-dups are TOKEN-grain (whole-word swaps),
  // which at the character grain is dist 0 (edit past the prefix) or
  // dist ≥ 7 (a swapped word inside it) — so the natural fixture barely
  // exercises the 1..d verify band. The entry therefore unions in
  // deterministic id-derived TYPO TWINS (every 20th doc; substitution /
  // 3-char deletion / 2-char insertion by id residue — the same
  // id-derived-augmentation pattern as x22), reproduced verbatim in the
  // oracle, so substitutions, deletions and insertions all appear in
  // the hashed result at every scale factor.
  private val EdTwinsSparkSql: String =
    """SELECT doc_id, text FROM __docs
      |UNION ALL
      |SELECT doc_id + 1000000,
      |       CASE doc_id % 60
      |         WHEN 0  THEN concat('z', substr(text, 2))
      |         WHEN 20 THEN concat(substr(text, 1, 10), substr(text, 12))
      |         ELSE concat(substr(text, 1, 5), 'qq', substr(text, 6))
      |       END
      |FROM __docs WHERE doc_id % 20 = 0""".stripMargin

  def editDistancePairsQ(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir).createOrReplaceTempView("__docs")
    Dedup.editDistancePairs(s.sql(EdTwinsSparkSql), prefixLen = EdPrefix,
        q = EdQ, maxDist = EdMaxDist, maxOcc = EdMaxOcc)
      .orderBy("id_a", "id_b")
  }

  val editDistancePairsSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000,
       |         CASE doc_id % 60
       |           WHEN 0  THEN concat('z', substr(text, 2))
       |           WHEN 20 THEN concat(substr(text, 1, 10), substr(text, 12))
       |           ELSE concat(substr(text, 1, 5), 'qq', substr(text, 6))
       |         END
       |  FROM documents WHERE doc_id % 20 = 0
       |), t AS (
       |  SELECT doc_id, lower(substr(text, 1, $EdPrefix)) AS title
       |  FROM aug
       |  WHERE length(lower(substr(text, 1, $EdPrefix))) >= ${EdQ * (EdMaxDist + 1)}
       |), g0 AS (
       |  SELECT doc_id, length(title) AS len, i + 1 AS pos,
       |         substr(title, i + 1, $EdQ) AS gram
       |  FROM t, LATERAL unnest(range(greatest(length(title) - ${EdQ - 1}, 0))) AS r(i)
       |), occ AS (
       |  SELECT gram, COUNT(*) AS c FROM g0 GROUP BY gram
       |), g AS (
       |  SELECT g0.* FROM g0 JOIN occ USING (gram) WHERE occ.c <= $EdMaxOcc
       |), cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |         a.len AS la, b.len AS lb, COUNT(*) AS shared
       |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |       AND abs(a.pos - b.pos) <= $EdMaxDist
       |  GROUP BY 1, 2, 3, 4
       |  HAVING COUNT(*) >= greatest(greatest(la, lb) - ${EdQ - 1 + EdQ * EdMaxDist}, 1)
       |)
       |SELECT c.id_a, c.id_b,
       |       CAST(levenshtein(ta.title, tb.title) AS BIGINT) AS dist
       |FROM cand c
       |JOIN t ta ON c.id_a = ta.doc_id
       |JOIN t tb ON c.id_b = tb.doc_id
       |WHERE levenshtein(ta.title, tb.title) <= $EdMaxDist
       |ORDER BY id_a, id_b""".stripMargin

  // ---------------------------------------------------------------------
  // x58 — time-series gap-fill + LOCF: the dashboard-series operator a
  // store like the reference's feeds to Grafana. Per-type minute counts
  // over one UTC day with missing minutes ZERO-FILLED from a generated
  // grid and the per-minute average value carried forward (last
  // observation) across gaps.
  //
  // Scale shape: events collapse to (type, minute) in ONE partial-agg'd
  // shuffle; the grid is types × minutes (dashboard-sized, broadcast
  // into the left join), and the LOCF window runs over per-type minute
  // partitions bounded by the range (1440 rows/day) — never raw events.
  // ---------------------------------------------------------------------
  private val GapDayLo = "2024-01-05 00:00:00"
  private val GapDayHi = "2024-01-06 00:00:00"

  def gapFillLocf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .filter(col("ts") >= lit(GapDayLo).cast("timestamp") &&
              col("ts") <  lit(GapDayHi).cast("timestamp"))
      .withColumn("minute", date_trunc("minute", col("ts")))
    val agg = ev.groupBy(col("event_type"), col("minute"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
    val bounds = agg.agg(min("minute").as("lo"), max("minute").as("hi"))
    val grid = ev.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 minute"))).as("minute"))
    val w = Window.partitionBy("event_type").orderBy("minute")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("event_type", "minute"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("locf_value", last(col("avg_value"), ignoreNulls = true).over(w))
      .select(col("event_type"), col("minute"), col("n"), col("locf_value"))
      .orderBy("event_type", "minute")
  }

  val gapFillLocfSql: String =
    s"""WITH ev AS (
       |  SELECT event_type,
       |         date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute, "value"
       |  FROM events
       |  WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '$GapDayLo'
       |    AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '$GapDayHi'
       |), agg AS (
       |  SELECT event_type, minute, CAST(COUNT(*) AS BIGINT) AS n,
       |         round(AVG("value"), 6) AS avg_value
       |  FROM ev GROUP BY 1, 2
       |), bounds AS (SELECT MIN(minute) AS lo, MAX(minute) AS hi FROM agg),
       |grid AS (
       |  SELECT t.event_type, g.minute
       |  FROM (SELECT DISTINCT event_type FROM ev) t
       |  CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 minute)) AS minute
       |              FROM bounds) g)
       |SELECT g.event_type, g.minute, COALESCE(a.n, 0) AS n,
       |       last_value(a.avg_value IGNORE NULLS) OVER (
       |         PARTITION BY g.event_type ORDER BY g.minute
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
       |FROM grid g
       |LEFT JOIN agg a ON a.event_type = g.event_type AND a.minute = g.minute
       |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // x72 — exponentially-time-decayed moving average over the minute
  // series (ClickHouse `exponentialTimeDecayedAvg` / Grafana trend
  // smoothing). Weight of an observation Δ minutes back is decay^Δ;
  // support is TRUNCATED at EmaWindowMin lags — that truncation is part
  // of the operator's contract (decay^64 ≈ 1e-8, far below the 6-decimal
  // output rounding), which makes the Spark and DuckDB sums literally
  // the same finite sum instead of "equal up to an infinite tail", and
  // keeps every weight a bounded power (an unbounded closed-form EMA
  // via cumulative (1/decay)^i overflows double past ~6700 lags, so the
  // textbook window-sum trick is NOT scale-safe; this is).
  //
  // Decay is TIME-decayed, not row-decayed: missing minutes lower the
  // weight of older points by wall-clock distance, so gaps need no fill.
  //
  // Scale shape: raw events collapse to the (type, minute) series in one
  // partial-agg'd shuffle; the range self-join runs on the dashboard-
  // sized series with fan-out bounded by the 64-minute support, and the
  // final agg groups the same keys — raw events are never re-shuffled
  // or windowed.
  // ---------------------------------------------------------------------
  private val EmaDecay = 0.75
  private val EmaWindowMin = 64

  def emaSeries(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.events(s, dir)
      .filter(col("ts") >= lit(GapDayLo).cast("timestamp") &&
              col("ts") <  lit(GapDayHi).cast("timestamp"))
      .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"))
    val past = agg.select(col("event_type").as("t2"), col("minute").as("m2"),
      col("n").as("n2"))
    val w = pow(lit(EmaDecay),
      ((unix_millis(col("minute")) - unix_millis(col("m2"))) / lit(60000L)).cast("int"))
    agg.join(past,
        col("event_type") === col("t2") && col("m2") <= col("minute") &&
        col("m2") > col("minute") - expr(s"INTERVAL $EmaWindowMin MINUTES"))
      .withColumn("w", w)
      .groupBy("event_type", "minute", "n")
      .agg(round(sum(col("w") * col("n2")) / sum(col("w")), 6).as("ema"))
      .select(col("event_type"), unix_millis(col("minute")).as("minute_ms"),
              col("n"), col("ema"))
      .orderBy("event_type", "minute_ms")
  }

  val emaSeriesSql: String =
    s"""WITH agg AS (
       |  SELECT event_type, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute,
       |         CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events
       |  WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '$GapDayLo'
       |    AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '$GapDayHi'
       |  GROUP BY 1, 2)
       |SELECT a.event_type, epoch_ms(a.minute) AS minute_ms, a.n,
       |       round(SUM(pow($EmaDecay, CAST((epoch_ms(a.minute) - epoch_ms(b.minute)) / 60000 AS INT)) * b.n) /
       |             SUM(pow($EmaDecay, CAST((epoch_ms(a.minute) - epoch_ms(b.minute)) / 60000 AS INT))), 6) AS ema
       |FROM agg a JOIN agg b
       |  ON a.event_type = b.event_type AND b.minute <= a.minute
       | AND b.minute > a.minute - INTERVAL $EmaWindowMin MINUTE
       |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // x38 — cross-corpus dedup: incoming sources (src0–src9) checked
  // against the reference corpus (src10–src19) by exact n-gram Jaccard
  // ---------------------------------------------------------------------
  def crossCorpusDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val srcNum = expr("CAST(substring(source, 4) AS INT)")
    Dedup.ngramJaccardCross(
        docs.filter(srcNum < 10), docs.filter(srcNum >= 10),
        n = 3, threshold = 0.5)
      .orderBy("id_in", "id_ref")
  }

  val crossCorpusDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
      |), grams AS (
      |  SELECT DISTINCT doc_id, source,
      |         unnest(list_transform(range(greatest(len(w) - 2, 0)),
      |                               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
      |  FROM toks
      |), sizes AS (
      |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
      |), inter AS (
      |  SELECT a.doc_id AS id_in, b.doc_id AS id_ref, COUNT(*) AS i
      |  FROM grams a JOIN grams b ON a.sh = b.sh
      |  WHERE CAST(substr(a.source, 4) AS INT) < 10
      |    AND CAST(substr(b.source, 4) AS INT) >= 10
      |  GROUP BY 1, 2)
      |SELECT id_in, id_ref,
      |       CAST(i AS DOUBLE) / (za.sz + zb.sz - i) AS jaccard
      |FROM inter
      |JOIN sizes za ON id_in = za.doc_id
      |JOIN sizes zb ON id_ref = zb.doc_id
      |WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i) >= 0.5
      |ORDER BY id_in, id_ref""".stripMargin

  // ---------------------------------------------------------------------
  // x44 — Bloom-pre-filtered EXACT cross-corpus dedup. The fixture plants
  // exact copies: incoming docs with doc_id % 20 == 9 (src9) take the text of
  // their doc_id+1 neighbor (src10, always a reference doc; source is
  // src(doc_id % 20)) — both engines build the identical planted corpus, so
  // the expected duplicate set is deterministic.
  // ---------------------------------------------------------------------
  def bloomCrossDedup(s: SparkSession, dir: String): DataFrame = {
    val srcNum = expr("CAST(substring(source, 4) AS INT)")
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), srcNum.as("sn"))
    val nbr = base.select(col("doc_id").as("nid"), col("text").as("ntext"),
      col("sn").as("nsn"))
    val incoming = base.filter(col("sn") < 10)
      .join(nbr, col("nid") === col("doc_id") + 1, "left")
      .select(col("doc_id"),
        when(col("doc_id") % 20 === 9 && col("nsn") >= 10, col("ntext"))
          .otherwise(col("text")).as("text"))
    val reference = base.filter(col("sn") >= 10).select("doc_id", "text")
    Dedup.bloomCrossDedup(incoming, reference).orderBy("doc_id")
  }

  val bloomCrossDedupSql: String =
    """WITH base AS (
      |  SELECT doc_id, text, CAST(substr(source, 4) AS INT) AS sn FROM documents
      |), inc AS (
      |  SELECT a.doc_id,
      |         CASE WHEN a.doc_id % 20 = 9 AND b.sn >= 10 THEN b.text
      |              ELSE a.text END AS text
      |  FROM base a LEFT JOIN base b ON b.doc_id = a.doc_id + 1
      |  WHERE a.sn < 10
      |), ref AS (SELECT text FROM base WHERE sn >= 10)
      |SELECT i.doc_id,
      |       md5(trim(regexp_replace(lower(i.text), '\s+', ' ', 'g'))) AS fp
      |FROM inc i
      |WHERE EXISTS (
      |  SELECT 1 FROM ref r
      |  WHERE md5(trim(regexp_replace(lower(r.text), '\s+', ' ', 'g'))) =
      |        md5(trim(regexp_replace(lower(i.text), '\s+', ' ', 'g'))))
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x18 — as-of (point-in-time) join: enrich every click with the latest
  // COMPLETED minute aggregate of its (page, country) at event time.
  // Spark side is the no-join union+window formulation (AsOfJoin); the
  // oracle is DuckDB's native ASOF LEFT JOIN.
  // ---------------------------------------------------------------------
  def asofEnrichment(s: SparkSession, dir: String): DataFrame = {
    val clicksDf = Tables.clicks(s, dir).select(col("ts"), col("page"), col("country"))
    val agg = ReferenceQueries.minuteAgg(s, dir)
      .select(col("window_end"), col("page"), col("country"), col("cnt"))
    AsOfJoin.asOf(clicksDf, agg, keys = Seq("page", "country"),
        leftTs = "ts", rightTs = "window_end", payload = Seq("cnt"))
      .groupBy(col("page"))
      .agg(count("*").as("n_clicks"),
           count(col("r_cnt")).as("n_matched"),
           avg(col("r_cnt")).as("avg_prev_cnt"),
           avg(unix_millis(col("ts")) - unix_millis(col("r_window_end")))
             .as("avg_staleness_ms"))
      .orderBy("page")
  }

  val asofEnrichmentSql: String =
    s"""WITH clicks AS (${Tables.clicksSql}),
       |agg AS (
       |  SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) + INTERVAL 1 MINUTE AS window_end,
       |         page, country, COUNT(*) AS cnt
       |  FROM clicks GROUP BY 1, 2, 3
       |)
       |SELECT c.page, COUNT(*) AS n_clicks,
       |       COUNT(a.cnt) AS n_matched,
       |       AVG(a.cnt) AS avg_prev_cnt,
       |       AVG(epoch_ms(CAST(c.ts AS TIMESTAMP)) - epoch_ms(a.window_end)) AS avg_staleness_ms
       |FROM clicks c
       |ASOF LEFT JOIN agg a
       |  ON c.page = a.page AND c.country = a.country
       | AND CAST(c.ts AS TIMESTAMP) >= a.window_end
       |GROUP BY c.page ORDER BY c.page""".stripMargin

  // ---------------------------------------------------------------------
  // x19 — gap-based sessionization (30-min gap), histogrammed by session
  // size. Spark side is native session_window (the same expression runs
  // streaming — s08 is the streamed twin on this oracle); DuckDB oracle
  // is the classic gaps-and-islands formulation. Session-boundary parity
  // (pinned in SessionizeSpec): session_window merges an event that
  // arrives AT OR within gap of the previous — adjacent [a,a+gap) and
  // [a+gap, ...) windows coalesce — so the oracle starts a new island
  // only at diff STRICTLY greater than the gap.
  // ---------------------------------------------------------------------
  def sessionization(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionHistogram(Sessionize.sessions(Tables.clicks(s, dir)))

  val sessionizationSql: String =
    s"""WITH clicks AS (${Tables.clicksSql}),
       |seq AS (
       |  SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
       |         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
       |               OR epoch_ms(CAST(ts AS TIMESTAMP))
       |                  - epoch_ms(LAG(CAST(ts AS TIMESTAMP)) OVER w) > 1800000
       |              THEN 1 ELSE 0 END AS new_session
       |  FROM clicks
       |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
       |), sess AS (
       |  SELECT user_id, t,
       |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
       |                                ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM seq
       |), per AS (
       |  SELECT user_id, sid, COUNT(*) AS n_events,
       |         epoch_ms(MAX(t)) - epoch_ms(MIN(t)) AS duration_ms
       |  FROM sess GROUP BY 1, 2
       |)
       |SELECT n_events AS events_per_session, COUNT(*) AS n_sessions,
       |       CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms
       |FROM per GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // x49 — windowFunnel: per-user ordered-step matching (ClickHouse's
  // signature event-sequence function over the reference's click domain).
  // Chain order is strict (ts, event_id) tuple order — deterministic
  // under timestamp ties, which the SQL oracle mirrors with tuple
  // comparisons.
  // ---------------------------------------------------------------------
  private[graft] val FunnelSteps = Seq("view", "click", "purchase")
  private[graft] val FunnelWindowUs = 3600L * 1000000L // 1 hour

  // ---------------------------------------------------------------------
  // x78 — page TRANSITION matrix (Markov flow): for every ordered page
  // pair, how often a user's next in-session event lands there, with the
  // per-source transition probability — the Sankey/user-flow read every
  // product dashboard draws, and the statistics a Markov-chain session
  // simulator consumes. One user-grain window (bounded per user) + one
  // pair-grain aggregation; the probability normalization windows over
  // the PAGE-PAIR relation (|pages|² rows), never the event stream.
  // Ties broken by event_id so both engines see one total order.
  // ---------------------------------------------------------------------
  private val TransitionGapMs = 30L * 60 * 1000 // Sessionize.DefaultGap

  def pageTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val t = Tables.clicks(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("page"))
      .withColumn("next_page", lead(col("page"), 1).over(w))
      .withColumn("gap_ms",
        unix_millis(lead(col("ts"), 1).over(w)) - unix_millis(col("ts")))
      .filter(col("next_page").isNotNull && col("gap_ms") <= TransitionGapMs)
    val counts = t
      .groupBy(col("page").as("page_from"), col("next_page").as("page_to"))
      .agg(count(lit(1)).as("n_transitions"))
    val perFrom = Window.partitionBy("page_from")
    counts
      .withColumn("p_next", col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(perFrom).cast("double"))
      .orderBy("page_from", "page_to")
  }

  val pageTransitionsSql: String =
    s"""WITH clicks AS (${graft.Tables.clicksSql}),
       |seq AS (
       |  SELECT page,
       |         lead(page) OVER w AS next_page,
       |         epoch_ms(lead(CAST(ts AS TIMESTAMP)) OVER w)
       |           - epoch_ms(CAST(ts AS TIMESTAMP)) AS gap_ms
       |  FROM clicks
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |c AS (
       |  SELECT page AS page_from, next_page AS page_to,
       |         CAST(count(*) AS BIGINT) AS n_transitions
       |  FROM seq WHERE next_page IS NOT NULL AND gap_ms <= $TransitionGapMs
       |  GROUP BY 1, 2)
       |SELECT page_from, page_to, n_transitions,
       |       CAST(n_transitions AS DOUBLE) /
       |       CAST(sum(n_transitions) OVER (PARTITION BY page_from) AS DOUBLE) AS p_next
       |FROM c ORDER BY page_from, page_to""".stripMargin

  // ---------------------------------------------------------------------
  // x79 — CUSUM drift detection over the per-page minute series: the
  // classic SEQUENTIAL drift detector (Page 1954) complementing the
  // reference's pointwise Welford z-score (A9/q17): a z-score flags a
  // single bad minute, CUSUM accumulates many small same-direction
  // deviations — the "traffic has been creeping up for an hour" signal.
  // The textbook recursion S⁺ₜ = max(0, S⁺ₜ₋₁ + zₜ − k) is
  // non-associative, but it has an exact prefix-sum form
  //   S⁺ₜ = Wₜ − min(0, min_{j≤t} Wⱼ),  Wₜ = Σᵢ≤ₜ (zᵢ − k)
  // so it windows per page (bounded series) instead of folding
  // sequentially. Numeric parity is engineered: per-page mean/σ come
  // from EXACT integer moments (Σx, Σx² of counts — order-independent),
  // combined with one identical double formula in both engines, and
  // ordered-window prefix sums evaluate left-to-right identically —
  // the whole statistic is hash-verifiable with no rounding.
  // NOTE: on a corpus where NO page is judgeable (every per-page series
  // is a single minute or constant — e.g. very sparse data), the σ>0
  // guard empties the output entirely: zero rows means "no judgeable
  // series", not "no drift anywhere". Callers needing the distinction
  // should compare against the page count of the unguarded series.
  // ---------------------------------------------------------------------
  // single source of truth with the streamed twin (s29)
  private val CusumK = graft.streaming.DriftDetector.K // slack per step, σ units
  private val CusumH = graft.streaming.DriftDetector.H // decision threshold

  /** The standardized per-(page, minute) deviation relation shared by
    * batch x79 and streamed s29: mean/σ from EXACT integer moments
    * (order-independent), one identical double formula per engine. */
  def cusumZ(s: SparkSession, dir: String): DataFrame = {
    val series = Tables.clicks(s, dir)
      .groupBy(col("page"), date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("cnt"))
    val stats = series.groupBy("page").agg(
      count(lit(1)).as("n"),
      sum(col("cnt")).as("sx"),
      sum(col("cnt") * col("cnt")).as("sxx"))
      // x80's guard, verbatim: a 1-minute or constant series has no
      // sample σ — z would be Inf/NaN and silently poison max_s_plus
      // downstream. Exact integer arithmetic (n·Σx² > (Σx)² ⟺ σ > 0)
      // excludes unjudgeable pages identically in both engines. The
      // products are computed in decimal(38,0) — Spark's non-ANSI int64
      // multiply silently wraps, while DuckDB promotes sum() to HUGEINT
      // and compares exactly; decimal keeps both sides exact to 10³⁸,
      // far past any physical event count.
      .filter(col("n") > 1 &&
        col("n").cast("decimal(38,0)") * col("sxx").cast("decimal(38,0)") >
        col("sx").cast("decimal(38,0)") * col("sx").cast("decimal(38,0)"))
    series.join(stats, "page")
      .withColumn("mu", col("sx").cast("double") / col("n"))
      .withColumn("sigma", sqrt(
        (col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n"))
          / (col("n") - 1)))
      .withColumn("z", (col("cnt") - col("mu")) / col("sigma"))
      .select("page", "minute", "z")
  }

  def cusumDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val run = Window.partitionBy("page").orderBy("minute")
      .rowsBetween(Window.unboundedPreceding, 0)
    val z = cusumZ(s, dir)
      .withColumn("w", sum(col("z") - lit(CusumK)).over(run))
      .withColumn("s_plus", col("w") - least(lit(0.0), min(col("w")).over(run)))
    z.groupBy("page").agg(
        max(col("s_plus")).as("max_s_plus"),
        sum(when(col("s_plus") > CusumH, 1L).otherwise(0L)).as("n_drift_minutes"),
        min(when(col("s_plus") > CusumH, col("minute"))).as("first_drift_minute"))
      .orderBy("page")
  }

  val cusumDriftSql: String =
    s"""WITH clicks AS (${graft.Tables.clicksSql}),
       |series AS (
       |  SELECT page, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM clicks GROUP BY 1, 2),
       |stats AS (
       |  SELECT page, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(cnt) AS BIGINT) AS sx,
       |         CAST(sum(cnt * cnt) AS BIGINT) AS sxx
       |  FROM series GROUP BY 1
       |  HAVING count(*) > 1 AND CAST(count(*) AS HUGEINT) * CAST(sum(cnt * cnt) AS HUGEINT)
       |         > CAST(sum(cnt) AS HUGEINT) * CAST(sum(cnt) AS HUGEINT)),
       |z AS (
       |  SELECT s.page, s.minute,
       |         sum((s.cnt - CAST(t.sx AS DOUBLE) / t.n) /
       |             sqrt((CAST(t.sxx AS DOUBLE) - CAST(t.sx AS DOUBLE) * t.sx / t.n)
       |                  / (t.n - 1)) - $CusumK)
       |           OVER (PARTITION BY s.page ORDER BY s.minute
       |                 ROWS UNBOUNDED PRECEDING) AS w
       |  FROM series s JOIN stats t ON s.page = t.page),
       |c AS (
       |  SELECT page, minute, w - least(0.0, min(w)
       |           OVER (PARTITION BY page ORDER BY minute
       |                 ROWS UNBOUNDED PRECEDING)) AS s_plus
       |  FROM z)
       |SELECT page, max(s_plus) AS max_s_plus,
       |       CAST(sum(CASE WHEN s_plus > $CusumH THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_drift_minutes,
       |       min(CASE WHEN s_plus > $CusumH THEN minute END) AS first_drift_minute
       |FROM c GROUP BY page ORDER BY page""".stripMargin

  // ---------------------------------------------------------------------
  // x80 — SEASONAL-baseline anomaly: each minute judged against the
  // mean/σ of ITS OWN (page, hour-of-day) stratum instead of the global
  // series — "low for a 3 PM", which a global z-score (q17) cannot say:
  // a nightly lull and an afternoon outage look identical to it. The
  // baseline is a (pages × 24)-row relation from exact integer moments
  // (broadcast back to the minute grain), so the whole check is one
  // aggregation + one broadcast join over the dashboard-sized series —
  // and, like x79, hash-verifiable with no rounding.
  // ---------------------------------------------------------------------
  private val SeasonalZ = 3.0

  def seasonalAnomaly(s: SparkSession, dir: String): DataFrame = {
    val series = Tables.clicks(s, dir)
      .groupBy(col("page"), date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("cnt"))
    val strata = series
      .groupBy(col("page"), hour(col("minute")).as("hod"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("sx"),
           sum(col("cnt") * col("cnt")).as("sxx"))
      // a 1-minute or constant stratum has no sample σ — unjudgeable;
      // the guard is exact integer arithmetic (n·Σx² > (Σx)²  ⟺  σ > 0),
      // widened to decimal(38,0) so Spark's wrapping int64 multiply can
      // never disagree with DuckDB's HUGEINT promotion at large counts
      .filter(col("n") > 1 &&
        col("n").cast("decimal(38,0)") * col("sxx").cast("decimal(38,0)") >
        col("sx").cast("decimal(38,0)") * col("sx").cast("decimal(38,0)"))
    series.withColumn("hod", hour(col("minute")))
      .join(broadcast(strata), Seq("page", "hod"))
      .withColumn("expected", col("sx").cast("double") / col("n"))
      .withColumn("z", (col("cnt") - col("expected")) / sqrt(
        (col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n"))
          / (col("n") - 1)))
      .filter(abs(col("z")) > SeasonalZ)
      .select("page", "minute", "cnt", "expected", "z")
      .orderBy("page", "minute")
  }

  val seasonalAnomalySql: String =
    s"""WITH clicks AS (${graft.Tables.clicksSql}),
       |series AS (
       |  SELECT page, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS minute,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM clicks GROUP BY 1, 2),
       |st AS (
       |  SELECT page, hour(minute) AS hod, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(cnt) AS BIGINT) AS sx,
       |         CAST(sum(cnt * cnt) AS BIGINT) AS sxx
       |  FROM series GROUP BY 1, 2
       |  HAVING count(*) > 1 AND CAST(count(*) AS HUGEINT) * CAST(sum(cnt * cnt) AS HUGEINT)
       |         > CAST(sum(cnt) AS HUGEINT) * CAST(sum(cnt) AS HUGEINT)),
       |z AS (
       |  SELECT s.page, s.minute, s.cnt,
       |         CAST(t.sx AS DOUBLE) / t.n AS expected,
       |         (s.cnt - CAST(t.sx AS DOUBLE) / t.n) /
       |         sqrt((CAST(t.sxx AS DOUBLE) - CAST(t.sx AS DOUBLE) * t.sx / t.n)
       |              / (t.n - 1)) AS z
       |  FROM series s JOIN st t ON s.page = t.page AND hour(s.minute) = t.hod)
       |SELECT page, minute, cnt, expected, z FROM z
       |WHERE abs(z) > $SeasonalZ ORDER BY page, minute""".stripMargin

  // ---------------------------------------------------------------------
  // x81 — per-page DAILY TREND via closed-form OLS: slope (events/day),
  // intercept, and r² of events-per-day against the day index — the
  // "which pages are growing" dashboard read, and the regression-family
  // member of the moment-trick suite (x79/x80): all five sufficient
  // statistics (n, Σt, Σy, Σt², Σty — day index 0..29, daily counts) are
  // EXACT integers, so the one double formula per output column is
  // bit-identical cross-engine with no rounding. r²'s squared products
  // would overflow int64, so numerator/denominator convert to double
  // FIRST, identically on both sides. One day-grain aggregation + a
  // pages-sized regression — no window at all.
  // ---------------------------------------------------------------------
  def trendSlope(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.clicks(s, dir)
      .groupBy(col("page"), datediff(to_date(col("ts")), lit("2024-01-01")).as("t"))
      .agg(count(lit(1)).as("y"))
    val m = daily.groupBy("page").agg(
      count(lit(1)).as("n"),
      sum(col("t")).as("st"), sum(col("y")).as("sy"),
      sum(col("t") * col("t")).as("stt"),
      sum(col("t") * col("y")).as("sty"),
      sum(col("y") * col("y")).as("syy"))
    val covN  = (col("n") * col("sty") - col("st") * col("sy")).cast("double")
    val varT  = (col("n") * col("stt") - col("st") * col("st")).cast("double")
    val varY  = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    m.withColumn("slope", covN / varT)
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("st")) / col("n"))
      .withColumn("r2", covN * covN / (varT * varY))
      .select("page", "n", "slope", "intercept", "r2")
      .orderBy("page")
  }

  val trendSlopeSql: String =
    s"""WITH clicks AS (${graft.Tables.clicksSql}),
       |daily AS (
       |  SELECT page, datediff('day', DATE '2024-01-01',
       |                        CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
       |         CAST(count(*) AS BIGINT) AS y
       |  FROM clicks GROUP BY 1, 2),
       |m AS (
       |  SELECT page, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(t) AS BIGINT) AS st, CAST(sum(y) AS BIGINT) AS sy,
       |         CAST(sum(t * t) AS BIGINT) AS stt,
       |         CAST(sum(t * y) AS BIGINT) AS sty,
       |         CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM daily GROUP BY 1)
       |SELECT page, n,
       |  CAST(n * sty - st * sy AS DOUBLE) / CAST(n * stt - st * st AS DOUBLE) AS slope,
       |  (CAST(sy AS DOUBLE) -
       |   CAST(n * sty - st * sy AS DOUBLE) / CAST(n * stt - st * st AS DOUBLE) * st) / n
       |    AS intercept,
       |  CAST(n * sty - st * sy AS DOUBLE) * CAST(n * sty - st * sy AS DOUBLE) /
       |  (CAST(n * stt - st * st AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
       |FROM m ORDER BY page""".stripMargin

  // ---------------------------------------------------------------------
  // x82 — chi-square INDEPENDENCE test on the (device × page) traffic
  // contingency table: is the page mix the same across devices, with the
  // χ² statistic and degrees of freedom — the data-profiling read behind
  // "did the experiment change behavior" and drift monitors comparing
  // categorical mixes. Observed counts and row/column/grand totals are
  // exact integers; expected = row·col/total and the χ² sum are doubles
  // with a FIXED summation order (sorted cells) in both engines, so the
  // statistic is hash-verifiable unrounded. Cost: one cells-grain
  // aggregation (|devices|·|pages| rows) + broadcast margins.
  // ---------------------------------------------------------------------
  def chiSquare(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.clicks(s, dir)
      .groupBy(col("device"), col("page"))
      .agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("device").agg(sum(col("o")).as("rt"))
    val cols = cells.groupBy("page").agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"))
    val contrib = cells.join(broadcast(rows), "device")
      .join(broadcast(cols), "page").crossJoin(broadcast(tot))
      .withColumn("e", col("rt").cast("double") * col("ct") / col("n"))
      .withColumn("chi", (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
    // fixed fold order (device, page) — double addition is
    // association-sensitive and both engines must walk the same sequence
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy("device", "page")
      .rowsBetween(Window.unboundedPreceding, 0)
    val folded = contrib
      .withColumn("cum", sum(col("chi")).over(ord))
      .withColumn("i", row_number().over(Window.orderBy("device", "page")))
    val dims = cells.agg(count_distinct(col("device")).as("nd"),
                         count_distinct(col("page")).as("np"))
    folded.orderBy(col("i").desc).limit(1)
      .crossJoin(broadcast(dims))
      .select(lit("device x page").as("test"), col("cum").as("chi2"),
              ((col("nd") - 1) * (col("np") - 1)).as("dof"))
  }

  val chiSquareSql: String =
    s"""WITH clicks AS (${graft.Tables.clicksSql}),
       |cells AS (
       |  SELECT device, page, CAST(count(*) AS BIGINT) AS o
       |  FROM clicks GROUP BY 1, 2),
       |r AS (SELECT device, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
       |c AS (SELECT page, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
       |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
       |contrib AS (
       |  SELECT cells.device, cells.page,
       |         (o - CAST(rt AS DOUBLE) * ct / n) *
       |         (o - CAST(rt AS DOUBLE) * ct / n) /
       |         (CAST(rt AS DOUBLE) * ct / n) AS chi
       |  FROM cells JOIN r USING (device) JOIN c USING (page) CROSS JOIN t),
       |folded AS (
       |  SELECT sum(chi) OVER (ORDER BY device, page
       |                        ROWS UNBOUNDED PRECEDING) AS cum,
       |         row_number() OVER (ORDER BY device, page) AS i
       |  FROM contrib)
       |SELECT 'device x page' AS test, cum AS chi2,
       |  CAST(((SELECT count(*) FROM r) - 1) *
       |       ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof
       |FROM folded WHERE i = (SELECT count(*) FROM folded)""".stripMargin

  def windowFunnelQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel
      .windowFunnel(Tables.events(s, dir), FunnelSteps, FunnelWindowUs)
      .orderBy("user_id")

  val windowFunnelSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_id, event_type FROM events),
      |v AS (SELECT user_id, t, event_id FROM e WHERE event_type = 'view'),
      |c AS (SELECT user_id, t, event_id FROM e WHERE event_type = 'click'),
      |p AS (SELECT user_id, t, event_id FROM e WHERE event_type = 'purchase'),
      |l2 AS (
      |  SELECT DISTINCT v.user_id FROM v JOIN c ON c.user_id = v.user_id
      |    AND (c.t, c.event_id) > (v.t, v.event_id)
      |    AND c.t <= v.t + INTERVAL 1 HOUR),
      |l3 AS (
      |  SELECT DISTINCT v.user_id FROM v
      |  JOIN c ON c.user_id = v.user_id AND (c.t, c.event_id) > (v.t, v.event_id)
      |         AND c.t <= v.t + INTERVAL 1 HOUR
      |  JOIN p ON p.user_id = v.user_id AND (p.t, p.event_id) > (c.t, c.event_id)
      |         AND p.t <= v.t + INTERVAL 1 HOUR)
      |SELECT u.user_id,
      |       CASE WHEN l3.user_id IS NOT NULL THEN 3
      |            WHEN l2.user_id IS NOT NULL THEN 2
      |            WHEN lv.user_id IS NOT NULL THEN 1
      |            ELSE 0 END AS funnel_level
      |FROM (SELECT DISTINCT user_id FROM e) u
      |LEFT JOIN (SELECT DISTINCT user_id FROM v) lv ON lv.user_id = u.user_id
      |LEFT JOIN l2 ON l2.user_id = u.user_id
      |LEFT JOIN l3 ON l3.user_id = u.user_id
      |ORDER BY u.user_id""".stripMargin

  // ---------------------------------------------------------------------
  // x56 — funnel conversion report: the funnel-chart artifact over x49's
  // per-user levels — users reaching each step and the step-over-step
  // conversion rate. Everything after the funnel scan is a 4-row
  // relation; the lag window is presentation over those 4 rows.
  // ---------------------------------------------------------------------
  def funnelReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lv = graft.operators.Funnel
      .windowFunnel(Tables.events(s, dir), FunnelSteps, FunnelWindowUs)
    val per = lv.groupBy("funnel_level").agg(count(lit(1)).as("n"))
    val steps = s.range(FunnelSteps.length + 1).toDF("step")
    val cum = steps.crossJoin(per)
      .groupBy("step")
      .agg(sum(when(col("funnel_level") >= col("step"), col("n"))
        .otherwise(0L)).cast("long").as("n_users"))
    val w = Window.orderBy("step")
    cum.withColumn("conversion",
        round(col("n_users").cast("double") / lag(col("n_users"), 1).over(w), 6))
      .select(col("step"), col("n_users"), col("conversion"))
      .orderBy("step")
  }

  val funnelReportSql: String =
    s"""WITH f AS ($windowFunnelSql),
       |per AS (SELECT funnel_level, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1),
       |steps AS (SELECT unnest(range(${FunnelSteps.length + 1})) AS step),
       |cum AS (
       |  SELECT s.step,
       |         CAST(SUM(CASE WHEN p.funnel_level >= s.step THEN p.n ELSE 0 END) AS BIGINT)
       |           AS n_users
       |  FROM steps s CROSS JOIN per p GROUP BY 1)
       |SELECT step, n_users,
       |       round(CAST(n_users AS DOUBLE)
       |             / LAG(n_users) OVER (ORDER BY step), 6) AS conversion
       |FROM cum ORDER BY step""".stripMargin

  // ---------------------------------------------------------------------
  // x50 — retention cohort matrix (first-seen-day cohorts × day offset)
  // ---------------------------------------------------------------------
  def retentionQ(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.retentionMatrix(Tables.events(s, dir))
      .orderBy("cohort_day", "day_offset")

  val retentionSql: String =
    """WITH d AS (
      |  SELECT user_id,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_idx
      |  FROM events),
      |f AS (SELECT user_id, MIN(day_idx) AS cohort_idx FROM d GROUP BY 1)
      |SELECT CAST(DATE '1970-01-01' + CAST(f.cohort_idx AS INTEGER) AS VARCHAR) AS cohort_day,
      |       d.day_idx - f.cohort_idx AS day_offset,
      |       CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
      |FROM d JOIN f ON d.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // x54 — REAL image decode over the binary column: deterministic pixel
  // patterns are encoded to spec-conformant P6 PPM bytes, then the
  // genuine parser (Multimodal.PpmCodec.decode — a separate code path
  // from encode) recovers dimensions + raster and sums each channel.
  // The DuckDB oracle computes the same channel sums from the
  // closed-form pixel formula, so the hash verifies the encode→decode
  // round-trip preserves pixel semantics exactly. Integer sums — no
  // float parity surface at all.
  // ---------------------------------------------------------------------
  private val PpmAssets = 64

  /** Deterministic PPM payloads: asset `id` is a (8+id%5)×(6+id%7)
    * raster whose channel bytes follow the closed-form formulas the
    * oracles re-evaluate. Shared by x54/x55. */
  private def ppmAssets(s: SparkSession): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.PpmCodec
    s.range(PpmAssets).map { id =>
      val w = 8 + (id % 5).toInt; val h = 6 + (id % 7).toInt
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val base = (y * w + x) * 3
          rgb(base)     = ((id     + x * 3 + y * 7)  % 256).toByte
          rgb(base + 1) = ((id * 2 + x * 5 + y * 11) % 256).toByte
          rgb(base + 2) = ((id * 3 + x * 7 + y * 13) % 256).toByte
          x += 1
        }
        y += 1
      }
      (id, PpmCodec.encode(w, h, rgb))
    }.toDF("asset_id", "ppm")
  }

  def imageDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.PpmCodec
    ppmAssets(s).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (w, h, rgb) = PpmCodec.decode(bytes)
        var sr = 0L; var sg = 0L; var sb = 0L
        var p = 0
        while (p < w * h) {
          sr += rgb(p * 3) & 0xff; sg += rgb(p * 3 + 1) & 0xff
          sb += rgb(p * 3 + 2) & 0xff; p += 1
        }
        (id, w, h, sr, sg, sb)
      }
    }.toDF("asset_id", "width", "height", "sum_r", "sum_g", "sum_b")
      .orderBy("asset_id")
  }

  val imageDecodeSql: String =
    s"""WITH ids AS (SELECT unnest(range($PpmAssets)) AS asset_id),
       |dims AS (SELECT asset_id, 8 + asset_id % 5 AS width,
       |                6 + asset_id % 7 AS height FROM ids),
       |cols AS (SELECT asset_id, width, height,
       |                unnest(range(width)) AS x FROM dims),
       |px AS (SELECT asset_id, width, height, x,
       |              unnest(range(height)) AS y FROM cols)
       |SELECT asset_id, width, height,
       |  CAST(SUM((asset_id     + x * 3 + y * 7)  % 256) AS BIGINT) AS sum_r,
       |  CAST(SUM((asset_id * 2 + x * 5 + y * 11) % 256) AS BIGINT) AS sum_g,
       |  CAST(SUM((asset_id * 3 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_b
       |FROM px GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // x55 — image RESIZE on decoded pixels: decode the P6 payload, nearest-
  // neighbor downsample to 4×4 (sx = x·srcW div 4 — real pixel indexing,
  // not FakeCodec's byte-wrapping), re-encode, decode AGAIN, and sum
  // channels. The oracle evaluates the pixel formula at the same
  // nearest-neighbor source coordinates, so the hash verifies the whole
  // decode → transform → encode → decode loop. Integer-only.
  // ---------------------------------------------------------------------
  def imageResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.PpmCodec
    val dst = 4
    ppmAssets(s).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (w, h, rgb) = PpmCodec.decode(bytes)
        val small = new Array[Byte](dst * dst * 3)
        var y = 0
        while (y < dst) {
          val sy = y * h / dst
          var x = 0
          while (x < dst) {
            val sx = x * w / dst
            val src = (sy * w + sx) * 3; val d = (y * dst + x) * 3
            small(d) = rgb(src); small(d + 1) = rgb(src + 1); small(d + 2) = rgb(src + 2)
            x += 1
          }
          y += 1
        }
        // full loop: re-encode the thumbnail, decode it back, then sum
        val (_, _, back) = PpmCodec.decode(PpmCodec.encode(dst, dst, small))
        var sr = 0L; var sg = 0L; var sb = 0L
        var p = 0
        while (p < dst * dst) {
          sr += back(p * 3) & 0xff; sg += back(p * 3 + 1) & 0xff
          sb += back(p * 3 + 2) & 0xff; p += 1
        }
        (id, sr, sg, sb)
      }
    }.toDF("asset_id", "thumb_sum_r", "thumb_sum_g", "thumb_sum_b")
      .orderBy("asset_id")
  }

  val imageResizeSql: String =
    s"""WITH ids AS (SELECT unnest(range($PpmAssets)) AS asset_id),
       |dims AS (SELECT asset_id, 8 + asset_id % 5 AS w,
       |                6 + asset_id % 7 AS h FROM ids),
       |cols AS (SELECT asset_id, w, h, unnest(range(4)) AS x FROM dims),
       |px AS (SELECT asset_id, w, h, x, unnest(range(4)) AS y FROM cols),
       |src AS (SELECT asset_id, (x * w) // 4 AS sx, (y * h) // 4 AS sy FROM px)
       |SELECT asset_id,
       |  CAST(SUM((asset_id     + sx * 3 + sy * 7)  % 256) AS BIGINT) AS thumb_sum_r,
       |  CAST(SUM((asset_id * 2 + sx * 5 + sy * 11) % 256) AS BIGINT) AS thumb_sum_g,
       |  CAST(SUM((asset_id * 3 + sx * 7 + sy * 13) % 256) AS BIGINT) AS thumb_sum_b
       |FROM src GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // x59 — REAL video frame-sampling: a "video" is a back-to-back P6
  // frame stream (the `ffmpeg -f image2pipe -vcodec ppm` raw-video
  // contract), parsed by the genuine PpmCodec.decodeStream — this
  // upgrades the frame-sample path from the declared FakeCodec stub to a
  // real decode. Every 2nd frame is sampled and channel-summed; the
  // oracle re-evaluates the closed-form per-frame pixel formula at the
  // sampled indices. Integer-only, like x54/x55.
  // ---------------------------------------------------------------------
  private val VideoAssets = 48

  /** Deterministic frame streams: asset `id` is (3 + id%4) frames of a
    * (4+id%5)×(3+id%4) raster; frame f's channel bytes follow the
    * formulas the oracle re-evaluates. */
  private def videoAssets(s: SparkSession): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.PpmCodec
    s.range(VideoAssets).map { id =>
      val w = 4 + (id % 5).toInt; val h = 3 + (id % 4).toInt
      val n = 3 + (id % 4).toInt
      val stream = (0 until n).map { f =>
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val base = (y * w + x) * 3
            rgb(base)     = ((id     + f * 17 + x * 3 + y * 7)  % 256).toByte
            rgb(base + 1) = ((id * 2 + f * 19 + x * 5 + y * 11) % 256).toByte
            rgb(base + 2) = ((id * 3 + f * 23 + x * 7 + y * 13) % 256).toByte
            x += 1
          }
          y += 1
        }
        PpmCodec.encode(w, h, rgb)
      }.reduce(_ ++ _)
      (id, stream)
    }.toDF("asset_id", "video")
  }

  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.PpmCodec
    videoAssets(s).as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        PpmCodec.decodeStream(bytes).zipWithIndex.collect {
          case ((w, h, rgb), f) if f % 2 == 0 =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var p = 0
            while (p < w * h) {
              sr += rgb(p * 3) & 0xff; sg += rgb(p * 3 + 1) & 0xff
              sb += rgb(p * 3 + 2) & 0xff; p += 1
            }
            (id, f.toLong, sr, sg, sb)
        }
      }
    }.toDF("asset_id", "frame_idx", "sum_r", "sum_g", "sum_b")
      .orderBy("asset_id", "frame_idx")
  }

  val frameSampleSql: String =
    s"""WITH ids AS (SELECT unnest(range($VideoAssets)) AS asset_id),
       |dims AS (SELECT asset_id, 4 + asset_id % 5 AS w, 3 + asset_id % 4 AS h,
       |                3 + asset_id % 4 AS n FROM ids),
       |fr AS (SELECT asset_id, w, h, unnest(range(n)) AS f FROM dims),
       |samp AS (SELECT * FROM fr WHERE f % 2 = 0),
       |cols AS (SELECT asset_id, w, h, f, unnest(range(w)) AS x FROM samp),
       |px AS (SELECT asset_id, w, h, f, x, unnest(range(h)) AS y FROM cols)
       |SELECT asset_id, CAST(f AS BIGINT) AS frame_idx,
       |  CAST(SUM((asset_id     + f * 17 + x * 3 + y * 7)  % 256) AS BIGINT) AS sum_r,
       |  CAST(SUM((asset_id * 2 + f * 19 + x * 5 + y * 11) % 256) AS BIGINT) AS sum_g,
       |  CAST(SUM((asset_id * 3 + f * 23 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_b
       |FROM px GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // x60 — REAL audio decode + windowed energy: deterministic PCM16 mono
  // signals are wrapped in spec-conformant RIFF/WAVE containers (with a
  // skippable LIST chunk between fmt and data, so the chunk WALK is
  // exercised — an offset-44 reader would misparse every asset), decoded
  // by the genuine WavCodec, and analyzed per 64-sample window: energy =
  // Σ s² and peak = max |s| — the VAD/loudness-segmentation primitives.
  // Integer-only; the oracle re-evaluates the closed-form sample formula.
  // Completes the real-codec trio: image (x54/x55), video (x59), audio.
  // ---------------------------------------------------------------------
  private val WavAssets = 40
  private val WavWindow = 64

  /** Deterministic WAV payloads: asset `id` carries 256 + 32·(id%5)
    * samples of s_i = ((id·31 + i²·7) mod 65536) − 32768 at 16 kHz,
    * with a LIST chunk injected before data. */
  private def wavAssets(s: SparkSession): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.WavCodec
    s.range(WavAssets).map { id =>
      val n = 256 + 32 * (id % 5).toInt
      val samples = Array.tabulate(n) { i =>
        (((id * 31 + i.toLong * i * 7) % 65536).toInt - 32768).toShort
      }
      val canonical = WavCodec.encode(16000, samples)
      // splice a skippable LIST chunk between "fmt " and "data": header
      // is bytes [0,36), data chunk starts at 36
      val listChunk = "LIST".getBytes("US-ASCII") ++
        Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
      val wav = canonical.slice(0, 36) ++ listChunk ++
        canonical.slice(36, canonical.length)
      // re-patch the RIFF size field (bytes 4–7, LE = file length − 8) to
      // account for the spliced 12 bytes: WavCodec walks chunks and never
      // reads it, but a spec-conformant container must declare it right
      val riffSz = wav.length - 8
      wav(4) = (riffSz & 0xff).toByte
      wav(5) = ((riffSz >> 8) & 0xff).toByte
      wav(6) = ((riffSz >> 16) & 0xff).toByte
      wav(7) = ((riffSz >> 24) & 0xff).toByte
      (id, wav)
    }.toDF("asset_id", "wav")
  }

  def audioEnergy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.WavCodec
    wavAssets(s).as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val (rate, samples) = WavCodec.decode(bytes)
        require(rate == 16000, s"sample rate mangled: $rate")
        samples.grouped(WavWindow).zipWithIndex.map { case (win, w) =>
          var energy = 0L; var peak = 0L
          win.foreach { sm =>
            val v = sm.toLong
            energy += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
          }
          (id, w.toLong, win.length.toLong, energy, peak)
        }
      }
    }.toDF("asset_id", "window_idx", "n_samples", "energy", "peak")
      .orderBy("asset_id", "window_idx")
  }

  val audioEnergySql: String =
    s"""WITH ids AS (SELECT unnest(range($WavAssets)) AS asset_id),
       |dims AS (SELECT asset_id, 256 + 32 * (asset_id % 5) AS n FROM ids),
       |idx AS (SELECT asset_id, unnest(range(n)) AS i FROM dims),
       |sm AS (SELECT asset_id, i,
       |              ((asset_id * 31 + i * i * 7) % 65536) - 32768 AS s
       |       FROM idx)
       |SELECT asset_id, i // $WavWindow AS window_idx,
       |       CAST(COUNT(*) AS BIGINT) AS n_samples,
       |       CAST(SUM(s * s) AS BIGINT) AS energy,
       |       CAST(MAX(ABS(s)) AS BIGINT) AS peak
       |FROM sm GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // x61 — audio spectral features via a REAL FFT: per 64-sample window,
  // band energies over 4 equal one-sided bands (DC..Nyquist) from the
  // pure-JVM radix-2 kernel — the speech/music/noise segmentation
  // features an audio curation pipeline filters on. No SQL engine can
  // run an FFT, so the entry is rows-only; the kernel's math is pinned
  // by DspSpec (naive-DFT agreement, Parseval, impulse/constant/tone)
  // and the entry itself is deterministic (same samples → same doubles).
  // Scale shape: decode + FFT are row-local partition work; the only
  // shuffle is the final presentation sort.
  // ---------------------------------------------------------------------
  def audioSpectrum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.Dsp
    import graft.operators.Multimodal.WavCodec
    wavAssets(s).as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val (_, samples) = WavCodec.decode(bytes)
        samples.grouped(WavWindow).zipWithIndex
          .filter(_._1.length == WavWindow) // spectral grain needs full windows
          .flatMap { case (win, w) =>
            val ps = Dsp.powerSpectrum(win.map(_.toDouble))
            // 4 equal bands over bins 0..32; band b covers [b*8, b*8+8)
            // with the Nyquist bin folded into the last band
            (0 until 4).map { b =>
              val hi = if (b == 3) ps.length else (b + 1) * 8
              var e = 0.0
              var k = b * 8
              while (k < hi) { e += ps(k); k += 1 }
              (id, w.toLong, b.toLong, math.rint(e))
            }
          }
      }
    }.toDF("asset_id", "window_idx", "band", "energy")
      .orderBy("asset_id", "window_idx", "band")
  }

  // ---------------------------------------------------------------------
  // x121 — x61's HASH twin at the dB grain: band energies in decibels,
  // round(10·log10(e+1), 6). The FFT itself is not SQL-expressible, but
  // a naive O(n²) DFT is — and the two agree to ~1e-13 relative (the
  // radix-2 recombination only reorders fp additions), which the dB
  // round-6 grain absorbs with ~7 orders of margin (the ln ulp
  // contract, applied through log10's derivative: Δ(10·log10 e) ≈
  // 4.3·Δe/e). x61 keeps the raw-power contract (rint at 1e12+ magnitude
  // — a grain fp noise CAN flip, hence rows-only); this twin pins the
  // whole decode → window → spectrum → band pipeline at value level,
  // exactly as x108/x114/x116/x117 pin their learned/iterative families.
  // Oracle: closed-form samples (the x60 pattern) → per-(window, bin)
  // DFT via a 33-bin cross join → band fold → dB.
  // ---------------------------------------------------------------------
  def audioSpectrumDb(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.Dsp
    import graft.operators.Multimodal.WavCodec
    wavAssets(s).as[(Long, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val (_, samples) = WavCodec.decode(bytes)
        samples.grouped(WavWindow).zipWithIndex
          .filter(_._1.length == WavWindow)
          .flatMap { case (win, w) =>
            val ps = Dsp.powerSpectrum(win.map(_.toDouble))
            (0 until 4).map { b =>
              val hi = if (b == 3) ps.length else (b + 1) * 8
              var e = 0.0
              var k = b * 8
              while (k < hi) { e += ps(k); k += 1 }
              (id, w.toLong, b.toLong, e)
            }
          }
      }
    }.toDF("asset_id", "window_idx", "band", "e")
      .select(col("asset_id"), col("window_idx"), col("band"),
        round(log10(col("e") + lit(1.0)) * 10, 6).as("energy_db"))
      .orderBy("asset_id", "window_idx", "band")
  }

  val audioSpectrumDbSql: String =
    s"""WITH ids AS (SELECT unnest(range($WavAssets)) AS asset_id),
       |dims AS (SELECT asset_id, 256 + 32 * (asset_id % 5) AS n FROM ids),
       |idx AS (SELECT asset_id, unnest(range((n // $WavWindow) * $WavWindow)) AS i
       |        FROM dims),
       |sm AS (SELECT asset_id, i // $WavWindow AS window_idx, i % $WavWindow AS j,
       |              CAST(((asset_id * 31 + i * i * 7) % 65536) - 32768 AS DOUBLE) AS s
       |       FROM idx),
       |bins AS (SELECT unnest(range(${WavWindow / 2 + 1})) AS k),
       |dft AS (
       |  SELECT asset_id, window_idx, k,
       |         SUM(s * cos(2 * pi() * k * j / $WavWindow)) AS xre,
       |         SUM(s * sin(2 * pi() * k * j / $WavWindow)) AS xim
       |  FROM sm CROSS JOIN bins GROUP BY 1, 2, 3),
       |band AS (
       |  SELECT asset_id, window_idx, least(k // 8, 3) AS band,
       |         SUM(xre * xre + xim * xim) AS e
       |  FROM dft GROUP BY 1, 2, 3)
       |SELECT asset_id, CAST(window_idx AS BIGINT) AS window_idx,
       |       CAST(band AS BIGINT) AS band,
       |       round(log10(e + 1.0) * 10, 6) AS energy_db
       |FROM band ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------------
  // x73 — perceptual-hash IMAGE near-dup: the multimodal member of the
  // dedup family. Real decode (PpmCodec) → pHash (Multimodal.PHash:
  // 32×32 pool → DCT → 63-bit sign-of-AC signature) → LSH band blocking
  // (4 × 16-bit bands; Hamming ≤ 2 ⟹ ≥ 2 intact bands, so band
  // equality is a LOSSLESS candidate filter at this threshold, same
  // pigeonhole as SimHash banding) → exact Hamming verify via
  // bit_count(xor). The corpus is never self-joined — only band-bucket
  // collisions materialize, the same scale posture as x06/x07.
  //
  // The fixture plants brightness-shifted copies (id % 4 == 1 repeats
  // id-1's pixels at +10): pHash excludes the DC coefficient, so a
  // uniform shift must hash IDENTICALLY — that invariance, and the
  // absence of cross-pattern collisions (pixel patterns are splitmix64
  // noise, so non-planted signatures are ~independent 63-bit strings),
  // are what the spec asserts. Iterative float DCT → rows-only check.
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // x122 — the pHash family's HASH twin: the 63 low-frequency AC
  // coefficients of the pooled-grayscale 2D DCT-II, value-level checked
  // against a DuckDB recomputation (closed-form modular pixels — the
  // x54/x59 fixture family — through encode → chunk-walk decode → 2×2
  // integer pool → flat DCT double sum). The SIGNATURE stays rows-only
  // in x73 (a sign bit at a near-zero coefficient is fp-flippable
  // across engines); the coefficients are emitted at the /N² round-6
  // grain, where the separable-vs-flat summation difference (~1e-12
  // absolute after normalization) has ~5 orders of margin against the
  // rounding boundary. Pins pool + DCT exactly as x121 pins the FFT
  // path and x108/x114/x116/x117 pin their families.
  // ---------------------------------------------------------------------
  private val DctAssets = 16
  private val DctSide = 64

  def imageDctFixed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.{PHash, PpmCodec}
    s.range(DctAssets).flatMap { idBoxed =>
      val id: Long = idBoxed
      val w = DctSide; val h = DctSide
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          rgb(p) = ((id + x * 3 + y * 7) % 256).toByte
          rgb(p + 1) = ((id * 2 + x * 5 + y * 11) % 256).toByte
          rgb(p + 2) = ((id * 3 + x * 7 + y * 13) % 256).toByte
          x += 1
        }
        y += 1
      }
      val (dw, dh, back) = PpmCodec.decode(PpmCodec.encode(w, h, rgb))
      val coef = PHash.lowFreqCoefs(dw, dh, back)
      var i = -1
      for { u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0 } yield {
        i += 1
        (id, u.toLong, v.toLong, coef(i))
      }
    }.toDF("asset_id", "u", "v", "c")
      .select(col("asset_id"), col("u"), col("v"),
        round(col("c") / 1024.0, 6).as("coef"))
      .orderBy("asset_id", "u", "v")
  }

  val imageDctFixedSql: String =
    s"""WITH ids AS (SELECT unnest(range($DctAssets)) AS asset_id),
       |xs AS (SELECT unnest(range($DctSide)) AS x),
       |ys AS (SELECT unnest(range($DctSide)) AS y),
       |px AS (
       |  SELECT asset_id, x, y,
       |         (asset_id     + x * 3 + y * 7 ) % 256 AS r,
       |         (asset_id * 2 + x * 5 + y * 11) % 256 AS g,
       |         (asset_id * 3 + x * 7 + y * 13) % 256 AS b
       |  FROM ids CROSS JOIN xs CROSS JOIN ys),
       |pool AS (
       |  SELECT asset_id, y // 2 AS py, x // 2 AS pxx,
       |         SUM(299 * r + 587 * g + 114 * b) / 4000.0 AS pv
       |  FROM px GROUP BY 1, 2, 3),
       |uv AS (SELECT us.u, vs.v
       |       FROM (SELECT unnest(range(8)) AS u) us
       |       CROSS JOIN (SELECT unnest(range(8)) AS v) vs
       |       WHERE NOT (us.u = 0 AND vs.v = 0))
       |SELECT asset_id, CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v,
       |       round(SUM(pv * cos(pi() * (2 * pxx + 1) * u / ${2 * 32})
       |                    * cos(pi() * (2 * py + 1) * v / ${2 * 32})) / 1024.0,
       |             6) AS coef
       |FROM pool CROSS JOIN uv
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  private val PHashAssets = 48
  private val PHashHamMax = 2

  private[queries] def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64×64 P6 payloads: pattern of asset `id` is splitmix64 noise in
    * [0, 225]; id % 4 == 1 repeats id-1's pattern shifted +10 (no
    * clamping possible: 225 + 10 < 256). */
  private def phashAssets(s: SparkSession): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal.PpmCodec
    s.range(PHashAssets).map { idBoxed =>
      val id: Long = idBoxed
      val base: Long = if (id % 4 == 1) id - 1 else id
      val shift = if (id % 4 == 1) 10 else 0
      val w = 64; val h = 64
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = (y * w + x) * 3
          var c = 0
          while (c < 3) {
            val v = (mix64(base * 0x9e3779b97f4a7c15L ^ (x.toLong << 24) ^
              (y.toLong << 12) ^ c) & 0x7fffffffL) % 226
            rgb(p + c) = (v + shift).toByte
            c += 1
          }
          x += 1
        }
        y += 1
      }
      (id, PpmCodec.encode(w, h, rgb))
    }.toDF("asset_id", "ppm")
  }

  def imagePhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Multimodal.{PpmCodec, PHash}
    val hashes = phashAssets(s).as[(Long, Array[Byte])].mapPartitions { it =>
      it.map { case (id, bytes) =>
        val (w, h, rgb) = PpmCodec.decode(bytes)
        (id, PHash.hash(w, h, rgb))
      }
    }.toDF("asset_id", "phash")
    val banded = hashes.select(col("asset_id"), col("phash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("phash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))
      }: _*)).as("bk"))
      .select(col("asset_id"), col("phash"), col("bk.band").as("band"),
              col("bk.key").as("key"))
      // the x06/x07 bucket cap: 4 bands × 2^16 values saturate on a
      // large correlated-image corpus the same way simhash's 2048
      // buckets do on text — a bucket of m near-identical assets (or
      // flat/synthetic frames sharing AC signs) contributes m² pairs;
      // capping bounds candidates regardless of corpus size. Never
      // binds on the 48-asset fixture (hash unchanged).
      .withColumn("__bsz", count("*").over(
        Window.partitionBy(col("band"), col("key"))))
      .filter(col("__bsz") <= 200)
      .drop("__bsz")
    banded.join(
        banded.select(col("asset_id").as("id_b"), col("phash").as("phash_b"),
                      col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("asset_id") < col("id_b"))
      .select(col("asset_id").as("id_a"), col("id_b"),
              col("phash"), col("phash_b"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count(phash ^ phash_b)"))
      .filter(col("hamming") <= PHashHamMax)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** Registry: name → (fn, optional oracle). */
  val all: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] = Seq(
    "x01_token_count"        -> ((tokenCount _, Some(tokenCountSql))),
    "x02_text_quality"       -> ((textQuality _, Some(textQualitySql))),
    "x03_lang_id"            -> ((langId _, Some(langIdSql))),
    "x04_fingerprint"        -> ((fingerprintQ _, Some(fingerprintSql))),
    "x05_dedup_exact"        -> ((dedupExact _, Some(dedupExactSql))),
    "x06_dedup_minhash"      -> ((dedupMinhash _, Some(dedupMinhashSql))),
    "x07_dedup_simhash"      -> ((dedupSimhash _, Some(dedupSimhashSql))),
    "x08_ngram_jaccard"      -> ((ngramJaccard _, Some(ngramJaccardSql))),
    "x09_embedding_neardup"  -> ((embeddingNearDup _, Some(embeddingNearDupSql))),
    "x84_semantic_split_leakage" -> ((semanticSplitLeakage _, Some(semanticSplitLeakageSql))),
    "x85_semantic_split_leakage_lsh" -> ((semanticSplitLeakageLsh _, None)),
    "x115_semantic_split_leakage_probed" -> ((semanticSplitLeakageProbed _, None)),
    "x10_knn_bruteforce"     -> ((knnBruteForce _, Some(knnBruteForceSql))),
    "x11_knn_lsh"            -> ((knnLsh _, Some(knnLshSql))),
    "x110_knn_lsh_multiprobe" -> ((knnLshMultiProbe _, Some(knnLshMultiProbeSql))),
    "x111_knn_jl"            -> ((knnJl _, Some(knnJlSql))),
    "x128_embedding_scatter" -> ((embeddingScatterQ _, Some(embeddingScatterSql))),
    "x129_knn_pca"           -> ((knnPca _, None)),
    "x131_knn_pca_ivf"       -> ((knnPcaIvf _, None)),
    "x134_knn_pca_ivf_probed" -> ((knnPcaIvfProbed _, None)),
    "x12_multimodal_features" -> ((multimodalFeatures _, Some(multimodalFeaturesSql))),
    "x13_json_props"         -> ((jsonProps _, Some(jsonPropsSql))),
    "x14_embedding_neardup_lsh" -> ((embeddingNearDupLsh _, None)),
    "x15_knn_ivf"            -> ((knnIvf _, None)),
    "x45_knn_pq"             -> ((knnPq _, None)),
    "x46_knn_ivfpq"          -> ((knnIvfPq _, None)),
    "x114_knn_ivfpq_fixed"   -> ((knnIvfPqFixed _, Some(knnIvfPqFixedSql))),
    "x116_embedding_clusters_fixed" -> ((embeddingClustersFixed _, Some(embeddingClustersFixedSql))),
    "x117_embedding_neardup_lsh_fixed" -> ((embeddingNearDupLshFixed _, Some(embeddingNearDupLshFixedSql))),
    "x48_semdedup"           -> ((semDedup _, None)),
    "x102_semdedup_capped"   -> ((semDedupCapped _, None)),
    "x108_semdedup_fixed"    -> ((semDedupFixed _, Some(semDedupFixedSql))),
    "x40_embedding_clusters" -> ((embeddingClusters _, None)),
    "x16_winnowing_overlap"  -> ((winnowingOverlap _, Some(winnowingOverlapSql))),
    "x17_dedup_components"   -> ((dedupComponents _, Some(dedupComponentsSql))),
    "x37_dedup_keep_best"    -> ((dedupKeepBest _, Some(dedupKeepBestSql))),
    "x57_components_capped"  -> ((dedupComponentsCapped _, Some(dedupComponentsCappedSql))),
    "x62_ngram_topk_capped"  -> ((ngramTopKCapped _, Some(ngramTopKCappedSql))),
    "x83_split_leakage"      -> ((splitLeakage _, Some(splitLeakageSql))),
    "x88_ngram_containment"  -> ((ngramContainment _, Some(ngramContainmentSql))),
    "x91_embedding_health"   -> ((embeddingHealthQ _, Some(embeddingHealthSql))),
    "x97_leakage_quarantine" -> ((leakageQuarantine _, Some(leakageQuarantineSql))),
    "x105_clean_splits"      -> ((cleanSplits _, Some(cleanSplitsSql))),
    "x99_release_gate"       -> ((releaseGate _, Some(releaseGateSql))),
    "x92_centroid_separation" -> ((centroidSeparationQ _, Some(centroidSeparationSql))),
    "x63_cross_corpus_capped" -> ((crossCorpusCapped _, Some(crossCorpusCappedSql))),
    "x64_dup_spans"          -> ((dupSpans _, Some(dupSpansSql))),
    "x65_span_dup_profile"   -> ((dupSpanProfile _, Some(dupSpanProfileSql))),
    "x66_span_dedup_clean"   -> ((spanDedupCleanQ _, Some(spanDedupCleanSql))),
    "x67_cross_span_clean"   -> ((crossSpanCleanQ _, Some(crossSpanCleanSql))),
    "x95_max_shared_span"    -> ((maxSharedSpanQ _, Some(maxSharedSpanSql))),
    "x70_edit_distance_pairs" -> ((editDistancePairsQ _, Some(editDistancePairsSql))),
    "x58_gapfill_locf"       -> ((gapFillLocf _, Some(gapFillLocfSql))),
    "x72_ema_series"         -> ((emaSeries _, Some(emaSeriesSql))),
    "x38_cross_corpus_dedup" -> ((crossCorpusDedup _, Some(crossCorpusDedupSql))),
    "x44_bloom_cross_dedup"  -> ((bloomCrossDedup _, Some(bloomCrossDedupSql))),
    "x18_asof_join"          -> ((asofEnrichment _, Some(asofEnrichmentSql))),
    "x19_sessionization"     -> ((sessionization _, Some(sessionizationSql))),
    "x49_window_funnel"      -> ((windowFunnelQ _, Some(windowFunnelSql))),
    "x78_page_transitions"   -> ((pageTransitions _, Some(pageTransitionsSql))),
    "x79_cusum_drift"        -> ((cusumDrift _, Some(cusumDriftSql))),
    "x80_seasonal_anomaly"   -> ((seasonalAnomaly _, Some(seasonalAnomalySql))),
    "x81_trend_slope"        -> ((trendSlope _, Some(trendSlopeSql))),
    "x82_chi_square"         -> ((chiSquare _, Some(chiSquareSql))),
    "x50_retention_cohort"   -> ((retentionQ _, Some(retentionSql))),
    "x54_image_decode"       -> ((imageDecode _, Some(imageDecodeSql))),
    "x55_image_resize"       -> ((imageResize _, Some(imageResizeSql))),
    "x59_frame_sample"       -> ((frameSample _, Some(frameSampleSql))),
    "x60_audio_energy"       -> ((audioEnergy _, Some(audioEnergySql))),
    "x61_audio_spectrum"     -> ((audioSpectrum _, None)),
    "x121_audio_spectrum_db" -> ((audioSpectrumDb _, Some(audioSpectrumDbSql))),
    "x122_image_dct_fixed"   -> ((imageDctFixed _, Some(imageDctFixedSql))),
    "x73_image_phash_dedup"  -> ((imagePhashDedup _, None)),
    "x56_funnel_report"      -> ((funnelReport _, Some(funnelReportSql))),
  )
}
