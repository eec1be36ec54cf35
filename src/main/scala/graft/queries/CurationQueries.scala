package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Curation, SimilaritySearch}

/** Driver entries for the training-data curation operators (x20–x25).
  *
  * Every threshold / regex / boundary the DuckDB oracle must agree on is
  * read from `operators.Curation` — single source of truth, the SQL is
  * generated, the engines cannot drift.
  */
object CurationQueries {

  // ---------------------------------------------------------------------
  // x20 — deterministic stratified split (hash-bucket train/val/test)
  // ---------------------------------------------------------------------
  def deterministicSplit(s: SparkSession, dir: String): DataFrame =
    Curation.withSplit(Tables.documents(s, dir), col("doc_id"))
      .select("doc_id", "source", "bucket", "split")
      .orderBy("doc_id")

  val deterministicSplitSql: String =
    s"""SELECT doc_id, source,
       |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
       |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${Curation.TrainUpper}' THEN 'train'
       |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '${Curation.ValUpper}' THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x21 — rule-based quality filter (C4/Gopher rule family)
  // ---------------------------------------------------------------------
  def qualityFilter(s: SparkSession, dir: String): DataFrame =
    Curation.qualityRules(Tables.documents(s, dir)).orderBy("doc_id")

  // DuckDB mirrors of the four rule expressions (generated from the
  // same Curation constants the Spark side reads)
  private val p = "(' ' || text || ' ')"
  private[queries] val nTok = "CAST(len(string_split(text, ' ')) AS BIGINT)"
  private def occ(w: String) =
    s"CAST((length($p) - length(regexp_replace($p, ' $w ', ' ', 'g'))) / ${w.length + 1} AS BIGINT)"
  private val stopHits = Curation.StopSet
    .map(w => s"(CASE WHEN ${occ(w)} > 0 THEN 1 ELSE 0 END)").mkString(" + ")
  private val meanWl = s"(CAST(length(text) - $nTok + 1 AS DOUBLE) / $nTok)"
  private val alnum =
    "(CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / length(text))"
  private val keepSql =
    s"""($nTok BETWEEN ${Curation.MinWords} AND ${Curation.MaxWords})
       |    AND ($meanWl BETWEEN ${Curation.MinMeanWlen} AND ${Curation.MaxMeanWlen})
       |    AND ($alnum >= ${Curation.MinAlnum})
       |    AND (CAST($stopHits AS BIGINT) >= ${Curation.MinStopHits})""".stripMargin

  val qualityFilterSql: String = {
    s"""SELECT doc_id, source,
       |  $nTok AS n_words,
       |  $nTok BETWEEN ${Curation.MinWords} AND ${Curation.MaxWords} AS rule_words,
       |  $meanWl BETWEEN ${Curation.MinMeanWlen} AND ${Curation.MaxMeanWlen} AS rule_word_len,
       |  $alnum >= ${Curation.MinAlnum} AS rule_alnum,
       |  CAST($stopHits AS BIGINT) >= ${Curation.MinStopHits} AS rule_stopwords,
       |  $keepSql AS keep
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x22 — PII scrubbing (count + redact emails / IPv4s / phone numbers)
  // ---------------------------------------------------------------------
  // The fixture text is synthetic and PII-free, so each doc is augmented
  // with a deterministic id-derived contact line in BOTH engines — the
  // scrub path is exercised on every row, not vacuously green.
  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val augmented = Tables.documents(s, dir).withColumn("aug",
      Curation.contactAugmented(col("text"), col("doc_id")))
    Curation.scrubPii(augmented, col("aug"))
      .select("doc_id", "n_emails", "n_ips", "n_phones", "scrubbed")
      .orderBy("doc_id")
  }

  // SQL mirror of Curation.contactAugmented / the scrub cascade — shared
  // by x22 and the streamed-curation oracle (s12)
  private[graft] val augSql: String =
    "(text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 192.168.' " +
      "|| CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) " +
      "|| ' or +1 555-014-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.')"

  private[graft] def scrubbedSql(from: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($from,
       |    '${Curation.EmailPat}', '${Curation.EmailToken}', 'g'),
       |    '${Curation.Ipv4Pat}', '${Curation.IpToken}', 'g'),
       |    '${Curation.PhonePat}', '${Curation.PhoneToken}', 'g')""".stripMargin

  val piiScrubSql: String = {
    val (e, i, ph) = (Curation.EmailPat, Curation.Ipv4Pat, Curation.PhonePat)
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all($augSql, '$e')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all($augSql, '$i')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all($augSql, '$ph')) AS BIGINT) AS n_phones,
       |  ${scrubbedSql(augSql)} AS scrubbed
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** s12's batch oracle: the x21 keep-filter composed with the x22 scrub —
    * curation-at-ingest must equal curation-in-batch on the same corpus. */
  private[graft] val streamCurationSql: String = {
    val (e, i, ph) = (Curation.EmailPat, Curation.Ipv4Pat, Curation.PhonePat)
    s"""SELECT doc_id, source,
       |  CAST(len(regexp_extract_all($augSql, '$e'))
       |     + len(regexp_extract_all($augSql, '$i'))
       |     + len(regexp_extract_all($augSql, '$ph')) AS BIGINT) AS n_redactions,
       |  CAST(length(${scrubbedSql(augSql)}) AS BIGINT) AS scrubbed_len
       |FROM documents
       |WHERE $keepSql
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x23 — sequence packing (prefix-sum chunk assignment per source)
  // ---------------------------------------------------------------------
  def sequencePacking(s: SparkSession, dir: String): DataFrame =
    Curation.packChunks(Tables.documents(s, dir)).orderBy("source", "pack_id")

  val sequencePackingSql: String =
    s"""WITH sized AS (
       |  SELECT source, doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |cum AS (
       |  SELECT source, doc_id, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
       |  FROM sized)
       |SELECT source, cum_excl // ${Curation.PackCapacity} AS pack_id,
       |  count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       |FROM cum GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin

  // ---------------------------------------------------------------------
  // x24 — exact heavy hitters (top-K tokens per language)
  // ---------------------------------------------------------------------
  def heavyHitters(s: SparkSession, dir: String): DataFrame =
    Curation.heavyHitters(Tables.documents(s, dir)).orderBy("lang", "rnk")

  val heavyHittersSql: String =
    s"""WITH toks AS (
       |  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |counts AS (SELECT lang, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
       |ranked AS (
       |  SELECT lang, token, cnt,
       |         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rnk
       |  FROM counts)
       |SELECT lang, token, cnt, rnk FROM ranked
       |WHERE rnk <= ${Curation.TopK} ORDER BY lang, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // x25 — greedy no-straddle packing (stateful scan; a window function
  // can't express the running reset — the Spark side is a per-partition
  // JVM fold, the oracle a recursive CTE walking each source's rows)
  // ---------------------------------------------------------------------
  def greedyPacking(s: SparkSession, dir: String): DataFrame =
    Curation.greedyPack(Tables.documents(s, dir))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .orderBy("source", "pack_id")

  val greedyPackingSql: String =
    s"""WITH RECURSIVE sized AS (
       |  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
       |  FROM documents),
       |walk AS (
       |  SELECT source, doc_id, n_tokens, rn, CAST(0 AS BIGINT) AS pack_id, n_tokens AS used
       |  FROM sized WHERE rn = 1
       |  UNION ALL
       |  SELECT s.source, s.doc_id, s.n_tokens, s.rn,
       |    CASE WHEN w.used + s.n_tokens > ${Curation.PackCapacity} THEN w.pack_id + 1 ELSE w.pack_id END,
       |    CASE WHEN w.used + s.n_tokens > ${Curation.PackCapacity} THEN s.n_tokens ELSE w.used + s.n_tokens END
       |  FROM sized s JOIN walk w ON s.source = w.source AND s.rn = w.rn + 1)
       |SELECT source, pack_id, count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
       |FROM walk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // x26 — benchmark contamination (shared word n-grams vs the eval set)
  // ---------------------------------------------------------------------
  def contamination(s: SparkSession, dir: String): DataFrame =
    Curation.contamination(Tables.documents(s, dir)).orderBy("doc_id")

  // n-gram construction mirrors the x08 oracle convention:
  // unnest(list_transform(range(len-n+1))) — empty for short docs.
  val contaminationSql: String = {
    val n = Curation.ContamN
    val gram = (1 to n).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |), grams AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(greatest(len(w) - ${n - 1}, 0)),
       |                               i -> $gram)) AS sh
       |  FROM toks)
       |SELECT a.doc_id,
       |  CAST(count(DISTINCT a.sh) AS BIGINT) AS n_shared_grams,
       |  CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs
       |FROM grams a
       |JOIN (SELECT doc_id AS bench_id, sh FROM grams
       |      WHERE doc_id % ${Curation.BenchMod} = 0) b USING (sh)
       |WHERE a.doc_id % ${Curation.BenchMod} <> 0
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x27 — the composed pipeline: filter → dedup → split → stats
  // ---------------------------------------------------------------------
  def curationPipeline(s: SparkSession, dir: String): DataFrame =
    Curation.curate(Tables.documents(s, dir)).orderBy("source", "split")

  val curationPipelineSql: String = {
    val fp = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    val bucket = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)"
    s"""WITH kept AS (
       |  SELECT doc_id, source, text FROM documents
       |  WHERE $keepSql
       |), dedup AS (
       |  SELECT * FROM kept
       |  QUALIFY row_number() OVER (PARTITION BY $fp ORDER BY doc_id) = 1
       |)
       |SELECT source,
       |  CASE WHEN $bucket < '${Curation.TrainUpper}' THEN 'train'
       |       WHEN $bucket < '${Curation.ValUpper}' THEN 'val'
       |       ELSE 'test' END AS split,
       |  count(*) AS n_docs,
       |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |FROM dedup GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x28 — repetition scoring (Gopher duplicate-word / duplicate-2-gram)
  // ---------------------------------------------------------------------
  def repetition(s: SparkSession, dir: String): DataFrame =
    Curation.repetitionStats(Tables.documents(s, dir)).orderBy("doc_id")

  val repetitionSql: String = {
    val dupWord = "(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w))"
    val dup2g = "(CASE WHEN len(w) < 2 THEN 0.0 ELSE 1.0 - " +
      "CAST(len(list_distinct(list_transform(range(len(w) - 1), " +
      "i -> w[i+1] || ' ' || w[i+2]))) AS DOUBLE) / (len(w) - 1) END)"
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents)
       |SELECT doc_id, source,
       |  $dupWord AS dup_word_ratio,
       |  $dup2g AS dup_2gram_ratio,
       |  ($dupWord <= ${Curation.MaxDupWordRatio})
       |    AND ($dup2g <= ${Curation.MaxDup2gRatio}) AS rule_repetition
       |FROM t ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x29 — deterministic language rebalancing (downsample to smallest)
  // ---------------------------------------------------------------------
  def langRebalance(s: SparkSession, dir: String): DataFrame =
    Curation.rebalance(Tables.documents(s, dir), "lang")
      .groupBy("lang")
      .agg(max(col("c")).as("n_orig"), count(lit(1)).as("n_kept"))
      .orderBy("lang")

  val langRebalanceSql: String =
    """WITH cnts AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
      |m AS (SELECT min(c) AS mc FROM cnts)
      |SELECT d.lang, CAST(max(c.c) AS BIGINT) AS n_orig, count(*) AS n_kept
      |FROM documents d JOIN cnts c USING (lang) CROSS JOIN m
      |WHERE c.c = m.mc
      |   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < printf('%02x', (256 * m.mc) // c.c)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // x30 — per-source top quality quartile (percent_rank selection)
  // ---------------------------------------------------------------------
  def qualityTopQuantile(s: SparkSession, dir: String): DataFrame =
    Curation.topQualityQuantile(Tables.documents(s, dir)).orderBy("doc_id")

  // quality formula mirrors x02's (hash-proven) composite exactly,
  // including its {the, a, and, of} stopword set; shared with x37's
  // keeper selection so "best by quality" means the same thing everywhere
  private[queries] val qualitySqlExpr: String = {
    val stopOcc = Seq("the", "a", "and", "of").map(occ).mkString(" + ")
    s"""0.3 * least(CAST($nTok AS DOUBLE) / 64.0, 1.0)
       |  + 0.2 * (CASE WHEN (CASE WHEN $nTok = 0 THEN 0.0 ELSE CAST(length(text) - $nTok + 1 AS DOUBLE) / $nTok END) BETWEEN 3.0 AND 8.0
       |           THEN 1.0 ELSE 0.5 END)
       |  + 0.2 * (CASE WHEN length(text) = 0 THEN 0.0 ELSE $alnum END)
       |  + 0.3 * (1.0 - CASE WHEN $nTok = 0 THEN 0.0 ELSE CAST($stopOcc AS DOUBLE) / $nTok END)""".stripMargin
  }

  val qualityTopQuantileSql: String = {
    val quality = qualitySqlExpr
    s"""WITH q AS (
       |  SELECT doc_id, source, $quality AS quality FROM documents
       |), r AS (
       |  SELECT doc_id, source, quality,
       |         percent_rank() OVER (PARTITION BY source
       |                              ORDER BY quality DESC, doc_id ASC) AS pr
       |  FROM q)
       |SELECT doc_id, source, quality, pr FROM r
       |WHERE pr <= ${Curation.TopQuantile} ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x32 — document chunking (overlapping word windows for embedding)
  // ---------------------------------------------------------------------
  def chunking(s: SparkSession, dir: String): DataFrame =
    Curation.chunk(Tables.documents(s, dir)).orderBy("doc_id", "chunk_id")

  val chunkingSql: String = {
    val (sz, st) = (Curation.ChunkSize, Curation.ChunkStride)
    s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
       |c AS (
       |  SELECT doc_id, source, w,
       |    CAST(unnest(range(CAST(ceil(CAST(greatest(len(w) - $sz, 0) AS DOUBLE) / $st) AS BIGINT) + 1)) AS INT) AS chunk_id
       |  FROM t)
       |SELECT doc_id, source, chunk_id,
       |  array_to_string(w[chunk_id * $st + 1 : chunk_id * $st + $sz], ' ') AS chunk,
       |  CAST(len(w[chunk_id * $st + 1 : chunk_id * $st + $sz]) AS BIGINT) AS chunk_tokens
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x33 — TF-IDF keyword extraction (top-K terms per doc)
  // ---------------------------------------------------------------------
  def tfidf(s: SparkSession, dir: String): DataFrame =
    Curation.tfidfTopK(Tables.documents(s, dir)).orderBy("doc_id", "rnk")

  val tfidfSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, token, tf, df,
       |         round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
       |  FROM tf JOIN df USING (token) CROSS JOIN n),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |                ORDER BY tfidf DESC, token ASC) AS rnk FROM scored)
       |SELECT doc_id, token, tf, df, tfidf, rnk FROM r
       |WHERE rnk <= ${Curation.TfidfK} ORDER BY doc_id, rnk""".stripMargin

  // ---------------------------------------------------------------------
  // x34 — weighted mixture sampling (DoReMi-style domain weights)
  // ---------------------------------------------------------------------
  def mixtureSample(s: SparkSession, dir: String): DataFrame =
    Curation.mixtureSample(Tables.documents(s, dir), "lang")
      .groupBy("lang")
      .agg(max(col("c")).as("n_orig"), max(col("w_pct")).as("w_pct"),
           count(lit(1)).as("n_kept"))
      .orderBy("lang")

  val mixtureSampleSql: String = {
    val values = Curation.MixtureWeights
      .map { case (l, p) => s"('$l', $p)" }.mkString(", ")
    val thresh = "(256 * cn.w_pct * t.t_total) // (100 * cn.c)"
    s"""WITH w(lang, w_pct) AS (VALUES $values),
       |cnts AS (
       |  SELECT d.lang, count(*) AS c, max(w.w_pct) AS w_pct
       |  FROM documents d JOIN w ON d.lang = w.lang GROUP BY 1),
       |t AS (SELECT min(100 * c // w_pct) AS t_total FROM cnts)
       |SELECT d.lang, CAST(max(cn.c) AS BIGINT) AS n_orig,
       |       max(cn.w_pct) AS w_pct, count(*) AS n_kept
       |FROM documents d JOIN cnts cn ON d.lang = cn.lang CROSS JOIN t
       |WHERE $thresh >= 256
       |   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < printf('%02x', $thresh)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x35 — unigram LM cross-entropy (perplexity-filter signal)
  // ---------------------------------------------------------------------
  def unigramLogprob(s: SparkSession, dir: String): DataFrame =
    Curation.unigramScore(Tables.documents(s, dir)).orderBy("doc_id")

  val unigramLogprobSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
      |vocab AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vocab)
      |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
      |       round(SUM(tf * -ln(c / CAST(total AS DOUBLE))) / SUM(tf), 6) AS xent
      |FROM tf JOIN vocab USING (token) CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x87 — bigram LM cross-entropy (the next CCNet-ladder rung above x35)
  // ---------------------------------------------------------------------
  def bigramXent(s: SparkSession, dir: String): DataFrame =
    Curation.bigramScore(Tables.documents(s, dir)).orderBy("doc_id")

  val bigramXentSql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
      |  FROM documents),
      |bg AS (SELECT doc_id, unnest(l[1:-2]) AS w1, unnest(l[2:]) AS w2 FROM toks),
      |u  AS (SELECT doc_id, unnest(l) AS token FROM toks),
      |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
      |bm AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
      |ctx AS (SELECT w1, count(*) AS cw1 FROM bg GROUP BY 1),
      |uni AS (SELECT token, count(*) AS c FROM u GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM uni)
      |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
      |  round(SUM(tf * -ln(0.9 * (cb / CAST(cw1 AS DOUBLE))
      |                     + 0.1 * (c / CAST(total AS DOUBLE)))) / SUM(tf), 6) AS xent
      |FROM tf JOIN bm USING (w1, w2) JOIN ctx USING (w1)
      |     JOIN uni ON uni.token = tf.w2 CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x101 — x87 on a HASHED fixed-width bigram model (the x96 pattern):
  // 16^2 = 256 md5-prefix token buckets cap the bigram model at 256²
  // rows and the context/unigram models at 256 rows forever, so every
  // model join's build side broadcasts at any corpus size. Collisions
  // fold rare transitions (the DSIR-paper trade); n_bigrams stays
  // identical to x87's.
  // ---------------------------------------------------------------------
  def bigramXentHashed(s: SparkSession, dir: String): DataFrame =
    Curation.bigramScoreHashed(Tables.documents(s, dir)).orderBy("doc_id")

  val bigramXentHashedSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
      |                        t -> substr(md5(t), 1, 2)) AS l
      |  FROM documents),
      |bg AS (SELECT doc_id, unnest(l[1:-2]) AS w1, unnest(l[2:]) AS w2 FROM toks),
      |u  AS (SELECT doc_id, unnest(l) AS token FROM toks),
      |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
      |bm AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
      |ctx AS (SELECT w1, count(*) AS cw1 FROM bg GROUP BY 1),
      |uni AS (SELECT token, count(*) AS c FROM u GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM uni)
      |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
      |  round(SUM(tf * -ln(0.9 * (cb / CAST(cw1 AS DOUBLE))
      |                     + 0.1 * (c / CAST(total AS DOUBLE)))) / SUM(tf), 6) AS xent
      |FROM tf JOIN bm USING (w1, w2) JOIN ctx USING (w1)
      |     JOIN uni ON uni.token = tf.w2 CROSS JOIN tot
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x118 — Kneser–Ney smoothed bigram cross-entropy: the smoothing the
  // production CCNet/KenLM stack ships, replacing x87's interpolated
  // unigram back-off with absolute discounting + the CONTINUATION
  // distribution (distinct left-contexts / total bigram types). The
  // oracle replays every arithmetic term verbatim (round-6 ln ulp
  // contract); discount comes from the SAME constant the Scala default
  // resolves to (Curation.KnDiscount), so the sides cannot desync.
  // ---------------------------------------------------------------------
  def bigramXentKN(s: SparkSession, dir: String): DataFrame =
    Curation.bigramScoreKN(Tables.documents(s, dir)).orderBy("doc_id")

  val bigramXentKNSql: String = {
    val d = Curation.KnDiscount
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
       |  FROM documents),
       |bg AS (SELECT doc_id, unnest(l[1:-2]) AS w1, unnest(l[2:]) AS w2 FROM toks),
       |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
       |bm AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
       |ctx AS (SELECT w1, count(*) AS cw1, count(DISTINCT w2) AS n1w1
       |        FROM bg GROUP BY 1),
       |cont AS (SELECT w2, count(DISTINCT w1) AS rw2 FROM bg GROUP BY 1),
       |tot AS (SELECT count(*) AS ntypes FROM (SELECT DISTINCT w1, w2 FROM bg))
       |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       |  round(SUM(tf * -ln(greatest(cb - $d, 0.0) / CAST(cw1 AS DOUBLE)
       |                     + $d * n1w1 / CAST(cw1 AS DOUBLE)
       |                       * (rw2 / CAST(ntypes AS DOUBLE)))) / SUM(tf), 6) AS xent
       |FROM tf JOIN bm USING (w1, w2) JOIN ctx USING (w1)
       |     JOIN cont USING (w2) CROSS JOIN tot
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x120 — x118 on the HASHED fixed-width model (the x101 fold applied
  // to KN): the bigram model is capped at 256² rows and the KN
  // continuation statistics are row counts OF that bounded model, so
  // every model join's build side broadcasts at any corpus size. The
  // oracle computes the model directly over bucketed tokens (folding
  // aggregated counts by bucket == counting bucketed occurrences).
  // ---------------------------------------------------------------------
  def bigramXentKNHashed(s: SparkSession, dir: String): DataFrame =
    Curation.bigramScoreKNHashed(Tables.documents(s, dir)).orderBy("doc_id")

  val bigramXentKNHashedSql: String = {
    val d = Curation.KnDiscount
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),
       |                        t -> substr(md5(t), 1, 2)) AS l
       |  FROM documents),
       |bg AS (SELECT doc_id, unnest(l[1:-2]) AS w1, unnest(l[2:]) AS w2 FROM toks),
       |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
       |bm AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY 1, 2),
       |ctx AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cw1, count(*) AS n1w1
       |        FROM bm GROUP BY 1),
       |cont AS (SELECT w2, count(*) AS rw2 FROM bm GROUP BY 1),
       |tot AS (SELECT count(*) AS ntypes FROM bm)
       |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       |  round(SUM(tf * -ln(greatest(cb - $d, 0.0) / CAST(cw1 AS DOUBLE)
       |                     + $d * n1w1 / CAST(cw1 AS DOUBLE)
       |                       * (rw2 / CAST(ntypes AS DOUBLE)))) / SUM(tf), 6) AS xent
       |FROM tf JOIN bm USING (w1, w2) JOIN ctx USING (w1)
       |     JOIN cont USING (w2) CROSS JOIN tot
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x112 — CCNet perplexity bucketing (Wenzek et al. 2020): per-language
  // head/middle/tail terciles of the x87 LM score, via broadcast
  // percentile THRESHOLDS instead of a corpus-sorting NTILE window (the
  // 100 TB skew answer — languages are few and huge). The oracle
  // recomputes the x87 xent, the per-language tercile cut points
  // (quantile_cont ↔ Spark exact percentile, the q02 parity), and the
  // row-local CASE assignment.
  // ---------------------------------------------------------------------
  def ccnetBucketsQ(s: SparkSession, dir: String): DataFrame =
    Curation.ccnetBuckets(Tables.documents(s, dir)).orderBy("doc_id")

  lazy val ccnetBucketsSql: String =
    s"""WITH big AS ($bigramXentSql),
       |sc AS (
       |  SELECT b.doc_id, d.lang, b.xent
       |  FROM big b JOIN documents d USING (doc_id)),
       |thr AS (
       |  SELECT lang,
       |         quantile_cont(xent, CAST(1 AS DOUBLE)/3) AS t1,
       |         quantile_cont(xent, CAST(2 AS DOUBLE)/3) AS t2
       |  FROM sc GROUP BY lang)
       |SELECT doc_id, lang, xent,
       |       CASE WHEN xent <= t1 THEN 'head'
       |            WHEN xent <= t2 THEN 'middle'
       |            ELSE 'tail' END AS bucket
       |FROM sc JOIN thr USING (lang) ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x113 — x112's 100 TB composition AS A SERVED ENTRY (the x87→x101
  // pattern): x101's fixed-width 256-bucket hashed bigram model +
  // t-digest percentile thresholds, so every stage's state is
  // corpus-size-independent. Rows-only: DuckDB's approx_quantile is a
  // different sketch (thresholds are not value-portable across
  // engines); the tercile-monotonicity/totality contracts are pinned by
  // the x112 CurationSpec test, which runs this exact composition.
  // ---------------------------------------------------------------------
  def ccnetBucketsScaledQ(s: SparkSession, dir: String): DataFrame =
    Curation.ccnetBuckets(Tables.documents(s, dir), approx = true, hashed = true)
      .orderBy("doc_id")

  // ---------------------------------------------------------------------
  // x100 — SIGNAL-AGREEMENT audit: pairwise Pearson correlation between
  // the three per-doc quality signals (x02 heuristic composite, x35
  // unigram xent, x87 bigram xent) — the "are my filters measuring the
  // same thing" check run before combining signals into a keep/drop
  // rule: highly-correlated signals are redundant (pick the cheap
  // one), uncorrelated ones genuinely compose. One row; per-doc
  // signals are the SAME rounded values both engines already
  // hash-agree on (x02/x35/x87), moments are one aggregate over the
  // joined relation, correlations computed from raw moments (never an
  // engine corr() builtin — algorithms differ) and rounded 6.
  // ---------------------------------------------------------------------
  def signalAgreement(s: SparkSession, dir: String): DataFrame =
    signalAgreementOn(Tables.documents(s, dir))

  /** x100 on an explicit corpus — the spec plants constant-signal
    * corpora through this to pin the zero-variance NULL contract. */
  private[graft] def signalAgreementOn(docs: DataFrame): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val q = docs.select(col("doc_id"), TF.qualityScore(col("text")).as("q"))
    val u = Curation.unigramScore(docs).select(col("doc_id"), col("xent").as("u"))
    val b = Curation.bigramScore(docs).select(col("doc_id"), col("xent").as("b"))
    val m = q.join(u, "doc_id").join(b, "doc_id").agg(
      count(lit(1)).as("n"),
      sum(col("q")).as("sq"), sum(col("u")).as("su"), sum(col("b")).as("sb"),
      sum(col("q") * col("u")).as("squ"), sum(col("q") * col("b")).as("sqb"),
      sum(col("u") * col("b")).as("sub"),
      sum(col("q") * col("q")).as("sqq"), sum(col("u") * col("u")).as("suu"),
      sum(col("b") * col("b")).as("sbb"))
    // A constant signal has zero variance and no defined correlation:
    // explicit NULL by contract (the x89 degenerate-input rule), never
    // a NaN from sqrt(0)*sqrt(0) in the denominator.
    def r(sxy: String, sx: String, sy: String, sxx: String, syy: String) = {
      val vx = col("n") * col(sxx) - col(sx) * col(sx)
      val vy = col("n") * col(syy) - col(sy) * col(sy)
      when(vx =!= 0 && vy =!= 0,
        round((col("n") * col(sxy) - col(sx) * col(sy)) /
          (sqrt(vx) * sqrt(vy)), 6))
    }
    m.select(col("n").as("n_docs"),
      r("squ", "sq", "su", "sqq", "suu").as("corr_quality_unigram"),
      r("sqb", "sq", "sb", "sqq", "sbb").as("corr_quality_bigram"),
      r("sub", "su", "sb", "suu", "sbb").as("corr_unigram_bigram"))
  }

  lazy val signalAgreementSql: String =
    s"""WITH uni AS ($unigramLogprobSql),
       |big AS ($bigramXentSql),
       |qs AS (SELECT doc_id, $qualitySqlExpr AS q FROM documents),
       |j AS (
       |  SELECT qs.doc_id, qs.q, uni.xent AS u, big.xent AS b
       |  FROM qs JOIN uni USING (doc_id) JOIN big USING (doc_id)),
       |m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         sum(q) AS sq, sum(u) AS su, sum(b) AS sb,
       |         sum(q*u) AS squ, sum(q*b) AS sqb, sum(u*b) AS sub,
       |         sum(q*q) AS sqq, sum(u*u) AS suu, sum(b*b) AS sbb
       |  FROM j)
       |SELECT n AS n_docs,
       |  CASE WHEN n*sqq - sq*sq <> 0 AND n*suu - su*su <> 0 THEN
       |    round((n*squ - sq*su) /
       |          (sqrt(n*sqq - sq*sq) * sqrt(n*suu - su*su)), 6)
       |  END AS corr_quality_unigram,
       |  CASE WHEN n*sqq - sq*sq <> 0 AND n*sbb - sb*sb <> 0 THEN
       |    round((n*sqb - sq*sb) /
       |          (sqrt(n*sqq - sq*sq) * sqrt(n*sbb - sb*sb)), 6)
       |  END AS corr_quality_bigram,
       |  CASE WHEN n*suu - su*su <> 0 AND n*sbb - sb*sb <> 0 THEN
       |    round((n*sub - su*sb) /
       |          (sqrt(n*suu - su*su) * sqrt(n*sbb - sb*sb)), 6)
       |  END AS corr_unigram_bigram
       |FROM m""".stripMargin

  // ---------------------------------------------------------------------
  // x86 — corpus snapshot diff (incremental-versioning audit)
  // ---------------------------------------------------------------------
  // The "next crawl" snapshot is derived DETERMINISTICALLY from the
  // fixture corpus so the entry is self-contained and oracle-checkable:
  // doc_id % 17 == 0 dropped (removed), % 17 == 3 text-amended
  // (changed), % 17 == 5 forked to a fresh id beyond the max (added).
  // Both engines build the same snapshot from these constants.
  private val DiffMod = 17
  private val DiffIdOffset = 10000000L

  /** The deterministic "next crawl" snapshot both x86 and its streamed
    * twin s30 diff against — built from the same constants on both
    * engines so the entries are self-contained and oracle-checkable. */
  private[graft] def diffSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % DiffMod =!= 0)
      .withColumn("text",
        when(col("doc_id") % DiffMod === 3, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .unionAll(docs.filter(col("doc_id") % DiffMod === 5)
        .withColumn("doc_id", col("doc_id") + DiffIdOffset)
        .withColumn("text", concat(col("text"), lit(" fork"))))

  def corpusDiffQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Curation.corpusDiff(docs, diffSnapshot(docs)).orderBy("doc_id")
  }

  val corpusDiffSql: String = {
    val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    s"""WITH b AS (
       |  SELECT doc_id, text || ' rev2' AS text FROM documents WHERE doc_id % $DiffMod = 3
       |  UNION ALL SELECT doc_id, text FROM documents WHERE doc_id % $DiffMod NOT IN (0, 3)
       |  UNION ALL SELECT doc_id + $DiffIdOffset, text || ' fork'
       |            FROM documents WHERE doc_id % $DiffMod = 5),
       |fa AS (SELECT doc_id, md5($norm) AS fp FROM documents),
       |fb AS (SELECT doc_id, md5($norm) AS fp FROM b)
       |SELECT COALESCE(fa.doc_id, fb.doc_id) AS doc_id,
       |  CASE WHEN fb.fp IS NULL THEN 'removed'
       |       WHEN fa.fp IS NULL THEN 'added' ELSE 'changed' END AS status
       |FROM fa FULL OUTER JOIN fb ON fa.doc_id = fb.doc_id
       |WHERE fb.fp IS NULL OR fa.fp IS NULL OR fa.fp <> fb.fp
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x103 — snapshot DRIFT: KL both ways + Jensen-Shannon divergence
  // between the old and new snapshots' Laplace-smoothed unigram
  // distributions over the joint vocabulary. x86 says WHICH docs
  // changed; this says whether the LANGUAGE changed — the release-
  // changelog gauge next to the delta counts. Same deterministic
  // "next crawl" snapshot as x86/s30/s34.
  // ---------------------------------------------------------------------
  def snapshotDriftQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    Curation.snapshotDrift(docs, diffSnapshot(docs))
  }

  val snapshotDriftSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, text || ' rev2' AS text FROM documents WHERE doc_id % $DiffMod = 3
       |  UNION ALL SELECT doc_id, text FROM documents WHERE doc_id % $DiffMod NOT IN (0, 3)
       |  UNION ALL SELECT doc_id + $DiffIdOffset, text || ' fork'
       |            FROM documents WHERE doc_id % $DiffMod = 5),
       |ot AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |       FROM documents),
       |nt AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |       FROM b),
       |oc AS (SELECT token, count(*) AS co FROM ot GROUP BY 1),
       |nc AS (SELECT token, count(*) AS cn FROM nt GROUP BY 1),
       |j AS (SELECT COALESCE(oc.co, 0) AS co, COALESCE(nc.cn, 0) AS cn
       |      FROM oc FULL OUTER JOIN nc ON oc.token = nc.token),
       |tot AS (SELECT CAST(SUM(co) AS BIGINT) AS no, CAST(SUM(cn) AS BIGINT) AS nn,
       |               CAST(count(*) AS BIGINT) AS v
       |        FROM j),
       |pq AS (SELECT (co + 1.0) / (no + v) AS p, (cn + 1.0) / (nn + v) AS q
       |       FROM j CROSS JOIN tot)
       |SELECT (SELECT v FROM tot) AS v_joint,
       |       (SELECT no FROM tot) AS n_tokens_old,
       |       (SELECT nn FROM tot) AS n_tokens_new,
       |       round(SUM(p * ln(p / q)), 6) AS kl_old_new,
       |       round(SUM(q * ln(q / p)), 6) AS kl_new_old,
       |       round(SUM(p * ln(p / ((p + q) / 2))) / 2
       |             + SUM(q * ln(q / ((p + q) / 2))) / 2, 6) AS js_divergence
       |FROM pq""".stripMargin

  // ---------------------------------------------------------------------
  // x36 — vocabulary construction: top-K tokens + cumulative coverage
  // ---------------------------------------------------------------------
  def vocabCoverage(s: SparkSession, dir: String): DataFrame =
    Curation.vocabCoverage(Tables.documents(s, dir)).orderBy("rnk")

  val vocabCoverageSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
       |r AS (SELECT token, cnt,
       |             row_number() OVER (ORDER BY cnt DESC, token ASC) AS rnk,
       |             SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
       |                            ROWS UNBOUNDED PRECEDING) AS cum
       |      FROM vocab)
       |SELECT rnk, token, CAST(cnt AS BIGINT) AS cnt,
       |       round(CAST(cum AS DOUBLE) / total, 6) AS coverage
       |FROM r CROSS JOIN tot
       |WHERE rnk <= ${Curation.VocabK} ORDER BY rnk""".stripMargin

  // ---------------------------------------------------------------------
  // x89 — Zipf-fit corpus-health audit: log-log OLS over the top-K
  // vocabulary (natural text ⇒ slope ≈ -1, r² ≈ 1; template floods
  // bend the spectrum). One row; moment sums are doubles (ln), so all
  // outputs round(6) per the x35/x87 transcendental-parity rule.
  // ---------------------------------------------------------------------
  def zipfFit(s: SparkSession, dir: String): DataFrame =
    Curation.zipfFit(Tables.documents(s, dir))

  val zipfFitSql: String =
    s"""WITH toks AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
       |r AS (SELECT ln(row_number() OVER (ORDER BY cnt DESC, token ASC)) AS x,
       |             ln(cnt) AS y
       |      FROM vocab ORDER BY cnt DESC, token ASC LIMIT ${Curation.VocabK}),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
       |             sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
       |             sum(x*y) AS sxy, sum(y*y) AS syy
       |      FROM r)
       |SELECT n_terms,
       |  CASE WHEN n_terms*sxx - sx*sx <> 0 THEN
       |    round((n_terms*sxy - sx*sy) / (n_terms*sxx - sx*sx), 6) END AS slope,
       |  CASE WHEN n_terms*sxx - sx*sx <> 0 THEN
       |    round((sy - (n_terms*sxy - sx*sy) / (n_terms*sxx - sx*sx) * sx) / n_terms, 6)
       |  END AS intercept,
       |  CASE WHEN n_terms*sxx - sx*sx <> 0 AND n_terms*syy - sy*sy <> 0 THEN
       |    round((n_terms*sxy - sx*sy) * (n_terms*sxy - sx*sy) /
       |          ((n_terms*sxx - sx*sx) * (n_terms*syy - sy*sy)), 6) END AS r2
       |FROM m""".stripMargin

  // ---------------------------------------------------------------------
  // x93 — DSIR importance selection (Xie et al. 2023, unigram
  // features): rank the corpus by target-vs-corpus log likelihood
  // ratio with Laplace smoothing over the joint vocabulary; keep the
  // top-K. Target = the doc_id % 97 eval-slice convention (x26/x71).
  // ---------------------------------------------------------------------
  def dsirSelect(s: SparkSession, dir: String): DataFrame =
    Curation.dsirSelect(Tables.documents(s, dir))

  val dsirSelectSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, doc_id % ${Curation.BenchMod} = 0 AS is_t,
       |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |tc AS (SELECT token,
       |         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |         CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cc
       |       FROM toks GROUP BY 1),
       |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
       |               CAST(SUM(cc) AS BIGINT) AS nc,
       |               CAST(COUNT(*) AS BIGINT) AS v FROM tc),
       |tf AS (SELECT doc_id, token, count(*) AS tf
       |       FROM toks WHERE NOT is_t GROUP BY 1, 2)
       |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |       round(SUM(tf * (ln((ct+1) / CAST(nt+v AS DOUBLE))
       |                     - ln((cc+1) / CAST(nc+v AS DOUBLE)))), 6) AS log_w
       |FROM tf JOIN tc USING (token) CROSS JOIN tot
       |GROUP BY doc_id
       |ORDER BY log_w DESC, doc_id LIMIT ${Curation.DsirK}""".stripMargin

  // ---------------------------------------------------------------------
  // x96 — DSIR on HASHED features: the fixed-width scale path (16³ =
  // 4096 md5-prefix buckets cap the model relation forever; x93's
  // joint vocabulary grows with the corpus). The md5-prefix bucket is
  // the splitOf portability trick, so the hashed model is
  // oracle-checkable cross-engine.
  // ---------------------------------------------------------------------
  def dsirSelectHashed(s: SparkSession, dir: String): DataFrame =
    Curation.dsirSelectHashed(Tables.documents(s, dir))

  val dsirSelectHashedSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, doc_id % ${Curation.BenchMod} = 0 AS is_t,
       |         substr(md5(unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))),
       |                1, 3) AS b
       |  FROM documents),
       |bc AS (SELECT b,
       |         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |         CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cc
       |       FROM toks GROUP BY 1),
       |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
       |               CAST(SUM(cc) AS BIGINT) AS nc,
       |               CAST(COUNT(*) AS BIGINT) AS v FROM bc),
       |tf AS (SELECT doc_id, b, count(*) AS tf
       |       FROM toks WHERE NOT is_t GROUP BY 1, 2)
       |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |       round(SUM(tf * (ln((ct+1) / CAST(nt+v AS DOUBLE))
       |                     - ln((cc+1) / CAST(nc+v AS DOUBLE)))), 6) AS log_w
       |FROM tf JOIN bc USING (b) CROSS JOIN tot
       |GROUP BY doc_id
       |ORDER BY log_w DESC, doc_id LIMIT ${Curation.DsirK}""".stripMargin

  // ---------------------------------------------------------------------
  // x124 — quality classifier with PINNED weights: the hash twin of
  // x125's serve path (tokenize → md5 bucket → mean per-token weight →
  // sigmoid), weights a closed-form affine ramp the oracle recomputes.
  // ---------------------------------------------------------------------
  def qualityClassifierFixedQ(s: SparkSession, dir: String): DataFrame =
    Curation.qualityClassifierFixed(Tables.documents(s, dir))

  val qualityClassifierFixedSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |feat AS (
       |  SELECT doc_id,
       |         CAST('0x' || substr(md5(token), 1, ${Curation.QcHexLen})
       |              AS BIGINT) AS j
       |  FROM toks)
       |SELECT doc_id,
       |       round(1.0 / (1.0 + exp(-avg(
       |         ((${Curation.QcWA} * j + ${Curation.QcWB}) % ${Curation.QcWM})
       |           / ${Curation.QcWM}.0 - 0.5))), 6) AS q_score
       |FROM feat GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x125 — the TRAINED quality classifier (distributed logistic
  // regression via mergeable gradient partials; labels = the DSIR
  // wiki-vs-corpus split). Learned weights are fp-order-sensitive ⇒
  // rows-only; CurationSpec asserts descent + AUC on a constructed
  // two-domain corpus + the x119 Pareto-rule composition; x124 pins
  // the shared serve machinery value-level.
  // ---------------------------------------------------------------------
  def qualityClassifierTrainedQ(s: SparkSession, dir: String): DataFrame =
    Curation.qualityClassifierTrained(Tables.documents(s, dir))

  // ---------------------------------------------------------------------
  // x130 — the GPT-3 composition at TRAINED weights (score with the
  // fitted classifier, then Pareto-admit): x126's admission stage
  // verbatim over x125's learned scores. Rows-only (the fit);
  // CurationSpec replays the closed-form keep rule over the entry's own
  // carried scores and pins the shared stage on a hand-scored relation.
  // ---------------------------------------------------------------------
  def paretoClassifierSampleTrainedQ(s: SparkSession, dir: String): DataFrame =
    Curation.paretoClassifierSampleTrained(Tables.documents(s, dir))
      .orderBy("doc_id")

  // x133 — the x130 composition against the DURABLE model store: the
  // classifier is fitted once per corpus refresh and persisted
  // (ModelStore, fingerprint-guarded); subsequent runs LOAD, so the
  // sampler's wall drops to the score + admission (x126's regime) while
  // still serving trained weights. Rows-only (learned weights);
  // CurationSpec pins stored-scores ≡ fit-scores exactly and the
  // staleness guard (mutated corpus → refit, never silently stale).
  // The store root is keyed by the fixture dir and lives OUTSIDE the
  // WorkDirs registry on purpose — it must survive the JVM, that is
  // the point of the entry (a few hundred rows of parquet).
  private[graft] def modelStoreRoot(dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_model_store/" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")

  def paretoClassifierSampleStoredQ(s: SparkSession, dir: String): DataFrame =
    Curation.paretoClassifierSampleStored(Tables.documents(s, dir),
      modelStoreRoot(dir))
      .orderBy("doc_id")

  /** s31's admission threshold — binds at both SFs (sf0.01: 58/494
    * admitted, sf0.1: 664/4948). */
  val DsirTau = 0.5

  /** Batch oracle for the streamed DSIR admission gate (s31): x93's
    * smoothed-LLR CTE with a threshold filter instead of top-K. */
  val dsirAdmissionSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, doc_id % ${Curation.BenchMod} = 0 AS is_t,
       |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |tc AS (SELECT token,
       |         CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |         CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cc
       |       FROM toks GROUP BY 1),
       |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
       |               CAST(SUM(cc) AS BIGINT) AS nc,
       |               CAST(COUNT(*) AS BIGINT) AS v FROM tc),
       |tf AS (SELECT doc_id, token, count(*) AS tf
       |       FROM toks WHERE NOT is_t GROUP BY 1, 2),
       |sc AS (
       |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |         round(SUM(tf * (ln((ct+1) / CAST(nt+v AS DOUBLE))
       |                       - ln((cc+1) / CAST(nc+v AS DOUBLE)))), 6) AS log_w
       |  FROM tf JOIN tc USING (token) CROSS JOIN tot
       |  GROUP BY doc_id)
       |SELECT doc_id, n_tokens, log_w FROM sc
       |WHERE log_w >= $DsirTau ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x41 — corpus datacard: the per-source release summary table
  // ---------------------------------------------------------------------
  def datacard(s: SparkSession, dir: String): DataFrame =
    Curation.datacard(Tables.documents(s, dir)).orderBy("source")

  val datacardSql: String = {
    val quality = qualitySqlExpr
    s"""WITH t AS (
       |  SELECT source, lang, $nTok AS n_tokens, $quality AS quality FROM documents
       |), stats AS (
       |  SELECT source,
       |    COUNT(*) AS n_docs,
       |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |    CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       |    CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       |    round(AVG(n_tokens), 6) AS mean_tokens,
       |    round(AVG(quality), 6) AS mean_quality,
       |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
       |  FROM t GROUP BY source
       |), lc AS (
       |  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2
       |), modal AS (
       |  SELECT source, lang AS modal_lang
       |  FROM (SELECT *, row_number() OVER (PARTITION BY source
       |                                     ORDER BY c DESC, lang ASC) AS rn FROM lc)
       |  WHERE rn = 1)
       |SELECT s.*, m.modal_lang FROM stats s JOIN modal m USING (source)
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x42 — token-budget sampling (N tokens per domain)
  // ---------------------------------------------------------------------
  def tokenBudget(s: SparkSession, dir: String): DataFrame =
    Curation.tokenBudgetSample(Tables.documents(s, dir)).orderBy("doc_id")

  val tokenBudgetSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, source, $nTok AS n_tokens FROM documents
       |), c AS (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM t)
       |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, cum_tokens
       |FROM c
       |WHERE cum_tokens <= ${Curation.TokenBudget} OR cum_tokens = n_tokens
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x43 — segment-level (paragraph) dedup, CCNet-style boilerplate removal
  // ---------------------------------------------------------------------
  def segmentDedup(s: SparkSession, dir: String): DataFrame =
    Curation.segmentDedup(Tables.documents(s, dir)).orderBy("doc_id")

  val segmentDedupSql: String = {
    val sw = Curation.SegWords
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |n AS (SELECT doc_id, w,
       |             greatest(CAST(ceil(len(w) / $sw.0) AS BIGINT), 1) AS n_segs
       |      FROM t),
       |s AS (SELECT doc_id, w, CAST(unnest(range(n_segs)) AS BIGINT) AS pos FROM n),
       |seg AS (SELECT doc_id, pos,
       |               array_to_string(w[pos * $sw + 1 : pos * $sw + $sw], ' ') AS seg
       |        FROM s),
       |k AS (SELECT doc_id, pos, seg,
       |             row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rk
       |      FROM seg),
       |re AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |              string_agg(seg, ' ' ORDER BY pos) AS dedup_text
       |       FROM k WHERE rk = 1 GROUP BY doc_id)
       |SELECT n.doc_id, n.n_segs,
       |       COALESCE(re.n_kept, 0) AS n_kept,
       |       COALESCE(re.dedup_text, '') AS dedup_text
       |FROM n LEFT JOIN re USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x47 — weighted priority sampling: exact k per stratum, P ∝ quality,
  // without replacement (Efraimidis–Spirakis). Seeded md5 uniform ⇒ the
  // identical key formula replays in SQL and the entry is HASH-checked.
  // ---------------------------------------------------------------------
  def prioritySample(s: SparkSession, dir: String): DataFrame =
    Curation.prioritySample(Tables.documents(s, dir), k = 25)
      .orderBy("lang", "rank")

  val prioritySampleSql: String = {
    val quality = qualitySqlExpr
    s"""WITH keyed AS (
       |  SELECT lang, doc_id,
       |         round(ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 0.5)
       |                  / 1152921504606846976.0)
       |               / (0.05 + $quality), 6) AS skey
       |  FROM documents
       |), ranked AS (
       |  SELECT lang, doc_id, skey,
       |         CAST(row_number() OVER (PARTITION BY lang ORDER BY skey DESC, doc_id) AS BIGINT) AS rank
       |  FROM keyed
       |)
       |SELECT lang, doc_id, skey, rank FROM ranked WHERE rank <= 25
       |ORDER BY lang, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x119 — classifier-score Pareto acceptance (the GPT-3 quality-
  // sampling rule): keep ⟺ u < (2−quality)^−9, closed-form for integer
  // α so no libm pow crosses the engine boundary — the (2−q)⁹
  // multiplication chain and the u·g⁹ < 1 comparison replay verbatim;
  // u's BIGINT→DOUBLE cast happens BEFORE the +0.5 on both sides so the
  // rounding order is IEEE-identical (the keep test is unrounded).
  // ---------------------------------------------------------------------
  def paretoQualitySampleQ(s: SparkSession, dir: String): DataFrame =
    Curation.paretoQualitySample(Tables.documents(s, dir)).orderBy("doc_id")

  val paretoQualitySampleSql: String =
    s"""WITH sc AS (
       |  SELECT doc_id, lang, round($qualitySqlExpr, 6) AS quality,
       |         (CAST(CAST(concat('0x', substr(md5('pareto:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 0.5)
       |           / 1152921504606846976.0 AS u
       |  FROM documents),
       |g AS (SELECT doc_id, lang, quality, u, 2.0 - quality AS g1 FROM sc),
       |g2t AS (SELECT *, g1 * g1 AS gg2 FROM g),
       |g4t AS (SELECT *, gg2 * gg2 AS gg4 FROM g2t),
       |k AS (SELECT doc_id, lang, quality, u * (gg4 * gg4 * g1) AS accept_key
       |      FROM g4t)
       |SELECT doc_id, lang, quality, round(accept_key, 6) AS accept_key
       |FROM k WHERE accept_key < 1.0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x126 — the classifier-driven Pareto sampler: x119's keep rule fed
  // by the x124 pinned-weight classifier score (the GPT-3 pipeline's
  // actual composition). Score CTE is x124's verbatim with lang riding
  // the doc grain; the chain and unrounded keep test are x119's with an
  // independent "paretoc:" seed.
  // ---------------------------------------------------------------------
  def paretoClassifierSampleQ(s: SparkSession, dir: String): DataFrame =
    Curation.paretoClassifierSample(Tables.documents(s, dir)).orderBy("doc_id")

  val paretoClassifierSampleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, lang,
       |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |feat AS (
       |  SELECT doc_id, lang,
       |         CAST('0x' || substr(md5(token), 1, ${Curation.QcHexLen})
       |              AS BIGINT) AS j
       |  FROM toks),
       |sc AS (
       |  SELECT doc_id, lang,
       |         round(1.0 / (1.0 + exp(-avg(
       |           ((${Curation.QcWA} * j + ${Curation.QcWB}) % ${Curation.QcWM})
       |             / ${Curation.QcWM}.0 - 0.5))), 6) AS q_score,
       |         (CAST(CAST(concat('0x', substr(md5('paretoc:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 0.5)
       |           / 1152921504606846976.0 AS u
       |  FROM feat GROUP BY doc_id, lang),
       |g AS (SELECT doc_id, lang, q_score, u, 2.0 - q_score AS g1 FROM sc),
       |g2t AS (SELECT *, g1 * g1 AS gg2 FROM g),
       |g4t AS (SELECT *, gg2 * gg2 AS gg4 FROM g2t),
       |k AS (SELECT doc_id, lang, q_score, u * (gg4 * gg4 * g1) AS accept_key
       |      FROM g4t)
       |SELECT doc_id, lang, q_score, round(accept_key, 6) AS accept_key
       |FROM k WHERE accept_key < 1.0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x132 — temperature (α = 1/2) sampling: the multilingual rebalance
  // rule as a HASH entry — sqrt/division are correctly-rounded IEEE in
  // both engines, the Σ√p̄ normalizer is an ordered left fold on both
  // sides, and the keep draw is the shared md5-uniform, so the whole
  // keep decision is bit-identical cross-engine.
  // ---------------------------------------------------------------------
  def temperatureSampleQ(s: SparkSession, dir: String): DataFrame =
    Curation.temperatureSample(Tables.documents(s, dir)).orderBy("doc_id")

  val temperatureSampleSql: String =
    s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM c),
       |w AS (SELECT lang, CAST(n AS DOUBLE) / nn AS p,
       |             sqrt(CAST(n AS DOUBLE) / nn) AS sq
       |      FROM c, tot),
       |z AS (SELECT list_sum(list(sq ORDER BY lang)) AS zs FROM w),
       |r0 AS (SELECT lang, p, sq / zs AS q FROM w, z),
       |sm AS (SELECT MIN(p / q) AS s FROM r0),
       |r AS (SELECT lang, (q * s) / p AS rate FROM r0, sm),
       |u AS (SELECT doc_id, lang,
       |        (CAST(CAST(concat('0x', substr(md5('${Curation.TsampleSeed}' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 0.5)
       |          / 1152921504606846976.0 AS u
       |      FROM documents)
       |SELECT u.doc_id, u.lang, round(r.rate, 6) AS rate
       |FROM u JOIN r USING (lang)
       |WHERE u.u < r.rate
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x127 — classifier calibration table (the Guo 2017 reliability
  // diagram): x124's pinned scorer against the DSIR label, folded to
  // score deciles. target_rate is an exact integer-count ratio; the
  // one round-6 avg is mean_score.
  // ---------------------------------------------------------------------
  def classifierCalibrationQ(s: SparkSession, dir: String): DataFrame =
    Curation.classifierCalibration(Tables.documents(s, dir))

  val classifierCalibrationSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, doc_id % ${Curation.BenchMod} = 0 AS is_t,
       |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |feat AS (
       |  SELECT doc_id, is_t,
       |         CAST('0x' || substr(md5(token), 1, ${Curation.QcHexLen})
       |              AS BIGINT) AS j
       |  FROM toks),
       |sc AS (
       |  SELECT doc_id, is_t,
       |         round(1.0 / (1.0 + exp(-avg(
       |           ((${Curation.QcWA} * j + ${Curation.QcWB}) % ${Curation.QcWM})
       |             / ${Curation.QcWM}.0 - 0.5))), 6) AS q_score
       |  FROM feat GROUP BY doc_id, is_t)
       |SELECT CAST(least(floor(q_score * 10), 9) AS BIGINT) AS decile,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_target,
       |       round(AVG(q_score), 6) AS mean_score,
       |       round(SUM(CASE WHEN is_t THEN 1.0 ELSE 0.0 END) / COUNT(*), 6)
       |         AS target_rate
       |FROM sc GROUP BY 1 ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------------
  // x51 — per-domain document cap (RefinedWeb-style host capping)
  // ---------------------------------------------------------------------
  def domainCapQ(s: SparkSession, dir: String): DataFrame =
    Curation.domainCap(Tables.documents(s, dir))
      .orderBy("source", "doc_id")

  val domainCapSql: String =
    s"""WITH r AS (
       |  SELECT source, doc_id,
       |         CAST(row_number() OVER (
       |           PARTITION BY source
       |           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || text)) AS BIGINT) AS sel_rank
       |  FROM documents
       |)
       |SELECT source, doc_id, sel_rank FROM r WHERE sel_rank <= ${Curation.DomainCap}
       |ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x104 — the composed SELECTION pipeline: quality gate → keep-best
  // exact dedup → domain cap → per-source token budget, as ONE plan
  // with ONE oracle. x27 composes filter→dedup→split into a STATS
  // summary; x104 emits the actual survivor list a release ships —
  // WITH the quality-aware keeper, the host cap, and the budget cut.
  // Every ordering decision is on round(6) values or hashes, so the
  // four-stage survivor set is engine-deterministic.
  // ---------------------------------------------------------------------
  def selectionPipelineQ(s: SparkSession, dir: String): DataFrame =
    Curation.curationPipeline(Tables.documents(s, dir))
      .orderBy("source", "doc_id")

  val selectionPipelineSql: String =
    s"""WITH scored AS (
       |  SELECT doc_id, source, text, round($qualitySqlExpr, 6) AS quality
       |  FROM documents
       |  WHERE round($qualitySqlExpr, 6) >= ${Curation.PipeMinQuality}),
       |kept AS (
       |  SELECT doc_id, source, text, quality FROM (
       |    SELECT scored.*, row_number() OVER (
       |      PARTITION BY md5(${ExtendedQueries.normalizedSql})
       |      ORDER BY quality DESC, doc_id) AS rn
       |    FROM scored) t WHERE rn = 1),
       |capped AS (
       |  SELECT doc_id, source, text, quality FROM (
       |    SELECT kept.*, row_number() OVER (
       |      PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || text)) AS cr
       |    FROM kept) t WHERE cr <= ${Curation.PipeDomainCap}),
       |bud AS (
       |  SELECT doc_id, source, quality,
       |         $nTok AS n_tokens,
       |         SUM($nTok) OVER (PARTITION BY source ORDER BY doc_id
       |                          ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM capped)
       |SELECT doc_id, source, quality,
       |       CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM bud
       |WHERE cum_tokens <= ${Curation.PipeTokenBudget} OR cum_tokens = n_tokens
       |ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x106 — the FULL release pipeline: x104 with the two stages a real
  // release inserts between exact dedup and the domain cap — near-dup
  // keep-best (x57's df-capped components + x37's keeper rule) and the
  // x97 decontamination quarantine — still ONE plan, ONE DuckDB hash
  // over the survivor list. The df-capped pair relation is computed
  // once and feeds both stages (the x99 crossingPairs factoring).
  // ---------------------------------------------------------------------
  def releasePipelineQ(s: SparkSession, dir: String): DataFrame =
    Curation.releasePipeline(Tables.documents(s, dir))
      .orderBy("source", "doc_id")

  val releasePipelineSql: String = {
    def splitCase(id: String) =
      s"""CASE WHEN substr(md5(CAST($id AS VARCHAR)), 1, 2) < '${Curation.TrainUpper}' THEN 'train'
         |     WHEN substr(md5(CAST($id AS VARCHAR)), 1, 2) < '${Curation.ValUpper}' THEN 'val'
         |     ELSE 'test' END""".stripMargin
    s"""WITH RECURSIVE ${repetitionCtes("documents")},
       |scored AS (
       |  SELECT doc_id, source, text, round($qualitySqlExpr, 6) AS quality
       |  FROM documents JOIN rp USING (doc_id)
       |  WHERE round($qualitySqlExpr, 6) >= ${Curation.PipeMinQuality}
       |    AND NOT $repetitiveSqlExpr),
       |kept AS (
       |  SELECT doc_id, source, text, quality FROM (
       |    SELECT scored.*, row_number() OVER (
       |      PARTITION BY md5(${ExtendedQueries.normalizedSql})
       |      ORDER BY quality DESC, doc_id) AS rn
       |    FROM scored) t WHERE rn = 1),
       |toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM kept
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
       |  WHERE df.df <= ${Curation.RelCapDf}
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
       |  WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i) >= ${Curation.RelThreshold}
       |), edges AS (
       |  SELECT id_a AS a, id_b AS b FROM jac
       |  UNION ALL
       |  SELECT id_b, id_a FROM jac
       |), reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |), comp AS (
       |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS component
       |  FROM reach GROUP BY a
       |), labeled AS (
       |  SELECT k.doc_id, k.quality, c.component
       |  FROM kept k JOIN comp c ON k.doc_id = c.doc_id
       |), best AS (
       |  SELECT component, doc_id AS keeper FROM (
       |    SELECT labeled.*, row_number() OVER (PARTITION BY component
       |      ORDER BY quality DESC, doc_id) AS rn
       |    FROM labeled) t WHERE rn = 1
       |), removed AS (
       |  SELECT l.doc_id FROM labeled l
       |  JOIN best b ON l.component = b.component
       |  WHERE l.doc_id <> b.keeper
       |), quar AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT id_a AS doc_id, ${splitCase("id_a")} AS split,
       |           ${splitCase("id_b")} AS osplit FROM jac
       |    UNION ALL
       |    SELECT id_b, ${splitCase("id_b")}, ${splitCase("id_a")} FROM jac) s
       |  WHERE split <> osplit AND split <> 'train'
       |), surv AS (
       |  SELECT * FROM kept
       |  WHERE doc_id NOT IN (SELECT doc_id FROM removed)
       |    AND doc_id NOT IN (SELECT doc_id FROM quar)
       |), capped AS (
       |  SELECT doc_id, source, text, quality FROM (
       |    SELECT surv.*, row_number() OVER (
       |      PARTITION BY source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || text)) AS cr
       |    FROM surv) t WHERE cr <= ${Curation.PipeDomainCap}),
       |bud AS (
       |  SELECT doc_id, source, quality,
       |         $nTok AS n_tokens,
       |         SUM($nTok) OVER (PARTITION BY source ORDER BY doc_id
       |                          ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM capped)
       |SELECT doc_id, source, ${splitCase("doc_id")} AS split, quality,
       |       CAST(n_tokens AS BIGINT) AS n_tokens,
       |       CAST(cum_tokens AS BIGINT) AS cum_tokens
       |FROM bud
       |WHERE cum_tokens <= ${Curation.PipeTokenBudget} OR cum_tokens = n_tokens
       |ORDER BY source, doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x107 — per-document repetition profile: the concentration +
  // long-gram half of the Gopher repetition battery (top-2/3-gram
  // position coverage, duplicated-5-gram fraction) that x28's
  // distinct-gram ratios miss. Row-local in Spark (codegen'd
  // multiplicity kernels, zero shuffles); the oracle recomputes the
  // same statistics relationally.
  // ---------------------------------------------------------------------
  def repetitionProfileQ(s: SparkSession, dir: String): DataFrame =
    Curation.repetitionProfile(Tables.documents(s, dir)).orderBy("doc_id")

  /** The x107 per-doc fraction CTE CHAIN over `src` (doc_id, text) —
    * rp_-prefixed so it splices into larger WITH chains (the x99 gate,
    * the x106 stage-1 rule) without colliding; terminal relation
    * `rp`(doc_id, n_tokens, top2_frac, top3_frac, dup5_frac). */
  def repetitionCtes(src: String): String =
    s"""rp_toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM $src
       |), rp_uni AS (
       |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM rp_toks
       |), rp_c2 AS (
       |  SELECT doc_id, g, COUNT(*) AS c FROM (
       |    SELECT doc_id,
       |           unnest(list_transform(range(greatest(len(w) - 1, 0)),
       |                                 i -> w[i+1] || ' ' || w[i+2])) AS g
       |    FROM rp_toks) t GROUP BY 1, 2
       |), rp_t2 AS (
       |  SELECT doc_id,
       |         least(round(MAX(c) * 2 / CAST(SUM(c) AS DOUBLE), 6), 1.0)
       |           AS top2_frac
       |  FROM rp_c2 GROUP BY 1
       |), rp_c3 AS (
       |  SELECT doc_id, g, COUNT(*) AS c FROM (
       |    SELECT doc_id,
       |           unnest(list_transform(range(greatest(len(w) - 2, 0)),
       |                                 i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS g
       |    FROM rp_toks) t GROUP BY 1, 2
       |), rp_t3 AS (
       |  SELECT doc_id,
       |         least(round(MAX(c) * 3 / CAST(SUM(c) AS DOUBLE), 6), 1.0)
       |           AS top3_frac
       |  FROM rp_c3 GROUP BY 1
       |), rp_c5 AS (
       |  SELECT doc_id, g, COUNT(*) AS c FROM (
       |    SELECT doc_id,
       |           unnest(list_transform(range(greatest(len(w) - 4, 0)),
       |                                 i -> w[i+1] || ' ' || w[i+2] || ' ' ||
       |                                      w[i+3] || ' ' || w[i+4] || ' ' ||
       |                                      w[i+5])) AS g
       |    FROM rp_toks) t GROUP BY 1, 2
       |), rp_d5 AS (
       |  SELECT doc_id,
       |         round(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
       |               / SUM(c), 6) AS dup5_frac
       |  FROM rp_c5 GROUP BY 1
       |), rp AS (
       |  SELECT u.doc_id, u.n_tokens, t2.top2_frac, t3.top3_frac,
       |         d5.dup5_frac
       |  FROM rp_uni u
       |  LEFT JOIN rp_t2 t2 ON u.doc_id = t2.doc_id
       |  LEFT JOIN rp_t3 t3 ON u.doc_id = t3.doc_id
       |  LEFT JOIN rp_d5 d5 ON u.doc_id = d5.doc_id)""".stripMargin

  /** The per-doc repetition RULE over `rp`'s columns — NULL fractions
    * cannot breach (per-term COALESCE), and docs below the min-length
    * floor are out of the rule's jurisdiction. Mirrors
    * [[graft.operators.Curation.repetitiveFlag]] exactly. */
  def repetitiveSqlExpr: String =
    s"""(n_tokens >= ${Curation.RepMinTokens}
       | AND (COALESCE(top2_frac > ${Curation.RepTop2Max}, FALSE)
       |      OR COALESCE(top3_frac > ${Curation.RepTop3Max}, FALSE)
       |      OR COALESCE(dup5_frac > ${Curation.RepDup5Max}, FALSE)))""".stripMargin

  val repetitionProfileSql: String =
    s"""WITH ${repetitionCtes("documents")}
       |SELECT doc_id, n_tokens, top2_frac, top3_frac, dup5_frac
       |FROM rp ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // x52 — collocation extraction: PMI-ranked adjacent bigrams
  // ---------------------------------------------------------------------
  def collocationsQ(s: SparkSession, dir: String): DataFrame =
    Curation.collocations(Tables.documents(s, dir)).orderBy("rnk")

  val collocationsSql: String = {
    val (k, mc) = (Curation.CollocK, Curation.CollocMinCount)
    s"""WITH toks AS (
       |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
       |uc AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cu
       |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
       |big AS (
       |  SELECT unnest(list_transform(range(len(t) - 1),
       |                               i -> t[i + 1] || ' ' || t[i + 2])) AS bg
       |  FROM toks WHERE len(t) >= 2),
       |bc AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cb FROM big GROUP BY 1),
       |tot AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n_tok FROM uc),
       |totb AS (SELECT CAST(SUM(cb) AS DOUBLE) AS n_bi FROM bc),
       |scored AS (
       |  SELECT bc.bg, bc.cb,
       |         round(ln((CAST(bc.cb AS DOUBLE) * t.n_tok * t.n_tok)
       |                  / (tb.n_bi * u1.cu * u2.cu)), 6) AS pmi
       |  FROM bc
       |  JOIN uc u1 ON u1.w = string_split(bc.bg, ' ')[1]
       |  JOIN uc u2 ON u2.w = string_split(bc.bg, ' ')[2]
       |  CROSS JOIN tot t CROSS JOIN totb tb
       |  WHERE bc.cb >= $mc)
       |SELECT CAST(row_number() OVER (ORDER BY pmi DESC, bg) AS BIGINT) AS rnk,
       |       bg, cb, pmi
       |FROM scored ORDER BY pmi DESC, bg LIMIT $k""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x53 — APPROXIMATE heavy hitters via a Misra-Gries mergeable sketch.
  // The vocabulary regime x24 can't reach: each map task reduces its
  // partition to a k-entry summary, the exchange carries
  // O(tasks·langs·k) regardless of vocabulary size, and survivors are
  // exact-counted afterwards with a broadcast semi-join (candidate set
  // is k·langs rows). The MG theorem guarantees every token with true
  // frequency > n/(k+1) survives the sketch regardless of merge order,
  // so survivors filtered by exact count > n/(k+1) equal EXACTLY the
  // frequent-token set — deterministic and hash-oracle-able: a sketch
  // that ever dropped a frequent token would fail this hash.
  // ---------------------------------------------------------------------
  private[graft] val MgK = 40

  def approxHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MisraGriesAggregator
    val toks = Tables.documents(s, dir).select(col("lang"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .as("token"))
    val cands = toks.groupBy("lang")
      .agg(MisraGriesAggregator.mg(MgK)(col("token")).as("mg"))
      .select(col("lang"), explode(col("mg")).as("s"))
      .select(col("lang"), col("s.id").as("token"))
    val exact = toks.join(broadcast(cands), Seq("lang", "token"), "left_semi")
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
    val totals = toks.groupBy("lang").agg(count(lit(1)).as("n"))
    exact.join(broadcast(totals), "lang")
      .filter(col("cnt") * (MgK + 1) > col("n"))
      .select(col("lang"), col("token"), col("cnt"))
      .orderBy("lang", "token")
  }

  val approxHeavyHittersSql: String =
    s"""WITH toks AS (
       |  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents),
       |tc AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM toks GROUP BY 1, 2),
       |tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n FROM tc GROUP BY 1)
       |SELECT tc.lang, tc.token, tc.cnt
       |FROM tc JOIN tot ON tc.lang = tot.lang
       |WHERE tc.cnt * ${MgK + 1} > tot.n
       |ORDER BY tc.lang, tc.token""".stripMargin

  // ---------------------------------------------------------------------
  // x68 — BPE merge learning (Sennrich et al. 2016): subword-vocabulary
  // induction over the corpus. Iterative (one argmax per learned
  // merge), so not SQL-expressible → rows-only driver check; the
  // algorithm-agreement invariants (merge-for-merge equality with an
  // independent in-memory reference implementation, argmax/tie-break
  // rules, reconstruction, determinism) are spec-asserted in
  // CurationSpec.
  // ---------------------------------------------------------------------
  def bpeMergesQ(s: SparkSession, dir: String): DataFrame =
    Curation.bpeMerges(Tables.documents(s, dir), numMerges = 20)

  // ---------------------------------------------------------------------
  // x109 — the DISTRIBUTED BPE learner: x68's scale path for
  // dictionaries too large for one task (per-round distributed
  // pair-count aggregation + TakeOrdered argmax + row-local merge
  // application; O(numMerges) jobs against O(1-row) per-task memory —
  // the opposite trade of x68's O(1)-job single-task kernel). Same
  // iterative-argmax reason as x68 → rows-only; merge-for-merge
  // agreement with the kernel AND the naive reference is spec-asserted.
  // ---------------------------------------------------------------------
  def bpeMergesDistributedQ(s: SparkSession, dir: String): DataFrame =
    Curation.bpeMergesDistributed(Tables.documents(s, dir), numMerges = 20)

  // ---------------------------------------------------------------------
  // x69 — BPE encoding: learn the merge table on the corpus (x68), then
  // tokenize every document with it, emitting per-document subword
  // statistics. The learned table makes the output a function of an
  // iterative computation → rows-only driver check; the encode kernel's
  // agreement with an independent priority-queue apply_bpe, the
  // concatenation invariant (units rejoin to the word), the unit-closure
  // invariant (every unit is a char or a table entry) and learn/encode
  // consistency on the training corpus are spec-asserted in
  // CurationSpec.
  // ---------------------------------------------------------------------
  def bpeEncodeQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val merges = Curation.bpeMerges(docs, numMerges = 20)
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    Curation.bpeEncode(docs, merges)
  }

  // ---------------------------------------------------------------------
  // x90 — tokenizer FERTILITY audit: per-language subword units/word +
  // chars/unit under the corpus-learned BPE table (x68 → x69 kernel).
  // The tokenizer-equity read every multilingual release ships. Learned
  // table = iterative ⇒ rows-only; the closed-form invariants
  // (zero-merge fertility = chars/word, saturating merges → 1.0,
  // agreement with x69's per-doc sums) are spec-asserted.
  // ---------------------------------------------------------------------
  def tokenizerFertilityQ(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val merges = Curation.bpeMerges(docs, numMerges = 20)
      .select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    Curation.tokenizerFertility(docs, merges)
  }

  // ---------------------------------------------------------------------
  // x123 — x90's HASH twin at zero merges: with an empty merge table
  // every BPE unit is one character, so the whole fertility relation is
  // CLOSED-FORM (n_units ≡ n_chars, fertility = chars/word,
  // chars_per_unit ≡ 1) and the word-split + per-language aggregation
  // machinery gets a cross-engine value-level check the learned-merge
  // entry cannot have (x68's iterative argmax is the documented
  // blocker). Same typed kernel, same aggregation — only the merge
  // table differs. ASCII fixture parity is guarded by the x12
  // fixture-boundary assert (Spark UTF-16 length ↔ DuckDB codepoints).
  // ---------------------------------------------------------------------
  def tokenizerFertilityZeroQ(s: SparkSession, dir: String): DataFrame =
    Curation.tokenizerFertility(Tables.documents(s, dir), Seq.empty)

  val tokenizerFertilityZeroSql: String =
    """WITH w AS (
      |  SELECT lang, doc_id,
      |         list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |d AS (
      |  SELECT lang, doc_id,
      |         CAST(len(ws) AS BIGINT) AS n_words,
      |         CAST(coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
      |              AS BIGINT) AS n_chars
      |  FROM w)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(SUM(n_words) AS BIGINT) AS n_words,
      |       CAST(SUM(n_chars) AS BIGINT) AS n_units,
      |       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
      |       round(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_words), 6) AS fertility,
      |       round(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_chars), 6) AS chars_per_unit
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // x71 — BM25 ranked retrieval (eval-slice queries over the corpus)
  // ---------------------------------------------------------------------
  def bm25(s: SparkSession, dir: String): DataFrame =
    Curation.bm25TopK(Tables.documents(s, dir)).orderBy("query_id", "rnk")

  val bm25Sql: String = bm25CoreSql(Curation.BmK) + "\nORDER BY query_id, rnk"

  /** The BM25 ranking CTE chain, parameterized on the per-query cutoff so
    * x76's fusion oracle can reuse it at a deeper k. Yields
    * (query_id, doc_id, bm25, rnk ≤ k), no presentation sort. */
  /** `itemPred`: extra SQL predicate restricting the ITEM (indexed)
    * corpus — "TRUE" for the full split; s43's prefix oracle passes the
    * as-of stage cut so each serve point is checked against exactly the
    * corpus that had arrived. */
  private[queries] def bm25CoreSql(k: Int, itemPred: String = "TRUE"): String = {
    val (k1, b, m) = (Curation.BmK1, Curation.BmB, Curation.BenchMod)
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents WHERE doc_id % $m <> 0 AND ($itemPred)),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |qt0 AS (SELECT DISTINCT doc_id AS query_id, token FROM (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
       |  FROM documents
       |  WHERE doc_id % $m = 0 AND doc_id < ${Curation.BmQueryIdMax})),
       |qt AS (SELECT query_id, token, df FROM (
       |  SELECT qt0.query_id, qt0.token, df.df,
       |         row_number() OVER (PARTITION BY qt0.query_id
       |                            ORDER BY df.df ASC, qt0.token ASC) AS tr
       |  FROM qt0 JOIN df USING (token))
       |  WHERE tr <= ${Curation.BmQTerms}),
       |scored AS (
       |  SELECT qt.query_id, tf.doc_id,
       |         round(SUM(ln(1.0 + (n_docs - qt.df + 0.5) / (qt.df + 0.5)) *
       |                   (tf * ($k1 + 1.0)) /
       |                   (tf + $k1 * (1.0 - $b + $b * dl / avgdl))), 6) AS bm25
       |  FROM tf JOIN qt USING (token) JOIN dl USING (doc_id)
       |          CROSS JOIN stats
       |  GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |                ORDER BY bm25 DESC, doc_id ASC) AS rnk FROM scored)
       |SELECT query_id, doc_id, bm25, rnk FROM r
       |WHERE rnk <= $k""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x98 — the DECONTAMINATION DASHBOARD: one row per eval-slice doc
  // joining the three audit signals a review consumes together — the
  // exact n-gram collision count (x26's grain, from the bench side),
  // the worst shared span (x95's metric), and the top BM25-scored
  // corpus neighbor (x71's rank 1). The report that answers "which
  // eval docs do I look at first, and what's the evidence" in one
  // relation. Slice = the bm25 query slice (doc_id % 97 == 0 and
  // < BmQueryIdMax) so all three signals describe the same documents.
  // Composition of three measured-bounded relations; the joins are
  // eval-slice-sized (fixed — an eval set does not grow with the
  // corpus), so the assembly is free at any scale.
  // ---------------------------------------------------------------------
  def decontamDashboard(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    import graft.functions.{TextFunctions => TF}
    val docs = Tables.documents(s, dir)
    val isBench = col("doc_id") % Curation.BenchMod === 0 &&
      col("doc_id") < Curation.BmQueryIdMax
    val bench = docs.filter(isBench)
    val corpus = docs.filter(col("doc_id") % Curation.BenchMod =!= 0)
    val span = Dedup.maxSharedSpan(bench, corpus,
      n = Curation.SpanGramN)
    def grams(d: DataFrame) = d.select(col("doc_id"),
      explode(TF.shingles(col("text"), Curation.ContamN)).as("sh"))
    val coll = grams(corpus)
      .join(broadcast(grams(bench).select(col("doc_id").as("bench_id"), col("sh"))),
            "sh")
      .groupBy(col("bench_id"))
      .agg(count_distinct(col("doc_id")).as("n_colliding_docs"))
    val top1 = Curation.bm25TopK(docs).filter(col("rnk") === 1)
      .select(col("query_id").as("q_id"), col("doc_id").as("top1_doc"),
              col("bm25").as("top1_bm25"))
    span.join(coll, span("doc_id") === coll("bench_id"), "left")
      .join(top1, span("doc_id") === top1("q_id"), "left")
      .na.fill(0L, Seq("n_colliding_docs")).na.fill(-1L, Seq("top1_doc"))
      .na.fill(0.0, Seq("top1_bm25"))
      .select(span("doc_id"), col("max_shared_tokens"), col("n_shared_grams"),
              col("n_colliding_docs"), col("top1_doc"), col("top1_bm25"))
      .orderBy("doc_id")
  }

  val decontamDashboardSql: String = {
    val k = Curation.SpanGramN
    val cn = Curation.ContamN
    val cgram = (1 to cn).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    val m = Curation.BenchMod
    s"""WITH bmr AS (${bm25CoreSql(1)}),
       |d AS (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |         doc_id % $m = 0 AND doc_id < ${Curation.BmQueryIdMax} AS is_b
       |  FROM documents
       |), inc AS (
       |  SELECT doc_id, w FROM d WHERE is_b
       |), ref AS (
       |  SELECT w FROM d WHERE doc_id % $m <> 0
       |), refg AS (
       |  SELECT DISTINCT array_to_string(w[i+1:i+$k], ' ') AS sh
       |  FROM ref, LATERAL unnest(range(greatest(len(w)-${k - 1}, 0))) AS t(i)
       |), incg AS (
       |  SELECT doc_id, i AS pos, array_to_string(w[i+1:i+$k], ' ') AS sh
       |  FROM inc, LATERAL unnest(range(greatest(len(w)-${k - 1}, 0))) AS t(i)
       |), mm AS (
       |  SELECT DISTINCT g.doc_id, g.pos FROM incg g JOIN refg USING (sh)
       |), w1 AS (
       |  SELECT doc_id, pos,
       |         MAX(pos + ${k - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM mm
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
       |  SELECT doc_id, MIN(pos) AS s, MAX(pos) + ${k - 1} AS e
       |  FROM w3 GROUP BY doc_id, island
       |), perdoc AS (
       |  SELECT doc_id, CAST(MAX(e - s + 1) AS BIGINT) AS max_shared_tokens,
       |         CAST(COUNT(*) AS BIGINT) AS n_islands
       |  FROM spans GROUP BY doc_id
       |), nsg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
       |  FROM mm GROUP BY doc_id
       |), cg AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(greatest(len(w) - ${cn - 1}, 0)),
       |                               i -> $cgram)) AS sh
       |  FROM d
       |), coll AS (
       |  SELECT b.doc_id AS bench_id,
       |         CAST(count(DISTINCT a.doc_id) AS BIGINT) AS n_colliding_docs
       |  FROM cg a
       |  JOIN (SELECT doc_id, sh FROM cg
       |        WHERE doc_id % $m = 0 AND doc_id < ${Curation.BmQueryIdMax}) b
       |    USING (sh)
       |  WHERE a.doc_id % $m <> 0
       |  GROUP BY 1)
       |SELECT i.doc_id,
       |  COALESCE(p.max_shared_tokens, 0) AS max_shared_tokens,
       |  COALESCE(n.n_shared_grams, 0) AS n_shared_grams,
       |  COALESCE(c.n_colliding_docs, 0) AS n_colliding_docs,
       |  COALESCE(bmr.doc_id, -1) AS top1_doc,
       |  COALESCE(bmr.bm25, 0.0) AS top1_bm25
       |FROM inc i
       |LEFT JOIN perdoc p USING (doc_id)
       |LEFT JOIN nsg n USING (doc_id)
       |LEFT JOIN coll c ON i.doc_id = c.bench_id
       |LEFT JOIN bmr ON i.doc_id = bmr.query_id
       |ORDER BY i.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x74 — Unicode normalization at ingest: NFC composition + control
  // strip via the custom codegen'd `normalize_text` Catalyst expression
  // (functions/TextNorm.scala). Row-local, zero shuffles beyond the
  // presentation sort.
  // ---------------------------------------------------------------------
  def textNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Curation.unicodeAugmented(col("text"), col("doc_id")).as("aug"))
      .select(col("doc_id"),
        graft.functions.TextNorm.normalize_text(col("aug")).as("clean_text"),
        length(col("aug")).as("aug_len"))
      .withColumn("clean_len", length(col("clean_text")))
      .orderBy("doc_id")

  val textNormalizeSql: String = {
    val aug = "text || ' id' || CAST(doc_id AS VARCHAR) || ' cafe' || chr(769)" +
      " || ' ' || chr(7) || 'ctl' || chr(27) ||" +
      " (CASE WHEN doc_id % 3 = 0 THEN 'a' || chr(768)" +
      "       WHEN doc_id % 3 = 1 THEN 'e' || chr(769)" +
      "       ELSE 'o' || chr(776) END) || chr(13)"
    val clean = s"regexp_replace(nfc_normalize($aug), " +
      """'[\x00-\x08\x0B-\x1F\x7F]', '', 'g')"""
    s"""SELECT doc_id,
       |  $clean AS clean_text,
       |  length($aug) AS aug_len,
       |  length($clean) AS clean_len
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // x76 — HYBRID retrieval: reciprocal-rank fusion of the BM25 lexical
  // ranking (x71's machinery at a deeper per-list cutoff) with the
  // embedding-cosine semantic ranking (x10's machinery) over the same
  // eval-slice queries — the standard two-retriever read path of a RAG /
  // contamination-triage stack. Both constituent lists are top-N-per-
  // query and corpus-size independent BEFORE fusion (the BM25 side is
  // the df-capped, term-budgeted x71 plan; the cosine side broadcasts
  // the fixed query slice and partial-aggregates its top-k), so the
  // fusion join touches O(|Q|·N) rows. vec_id ≡ doc_id in the fixtures,
  // which is what makes the two modalities fusible.
  // ---------------------------------------------------------------------
  private[graft] val HybridListK = 20 // per-retriever depth fed into the fusion
  private[graft] val HybridK     = 10 // fused list depth
  private[graft] val RrfK0       = 60 // Cormack et al. 2009's constant

  def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    val lex = Curation.bm25TopK(Tables.documents(s, dir), k = HybridListK)
      .select(col("query_id"), col("doc_id"), col("rnk").as("rank"))
    val sem = SimilaritySearch.bruteForceTopK(
        emb.filter(col("vec_id") % Curation.BenchMod =!= 0),
        emb.filter(col("vec_id") % Curation.BenchMod === 0 &&
                   col("vec_id") < Curation.BmQueryIdMax),
        k = HybridListK)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rank"))
    SimilaritySearch.rrfFuse(lex, sem, k0 = RrfK0, k = HybridK)
      .orderBy("query_id", "rank")
  }

  /** DuckDB twin: the x71 CTE chain at the deeper cutoff, the x10 cosine
    * ranking over the same corpus/query split, fused with the identical
    * 1/(k0+rank) arithmetic (lexical term first, semantic second — sum
    * order is part of double parity). Constituent ranks surface as
    * nullable DOUBLEs on both sides. */
  val hybridRrfSql: String = {
    val m = Curation.BenchMod
    s"""WITH lex AS (${bm25CoreSql(HybridListK)}),
       |sem AS (
       |  SELECT query_id, vec_id AS doc_id, sem_rank FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id,
       |           row_number() OVER (PARTITION BY a.vec_id
       |             ORDER BY ${ExtendedQueries.cosSql} DESC, b.vec_id ASC) AS sem_rank
       |    FROM (SELECT * FROM embeddings
       |          WHERE vec_id % $m = 0 AND vec_id < ${Curation.BmQueryIdMax}) a
       |    JOIN (SELECT * FROM embeddings WHERE vec_id % $m <> 0) b ON true
       |  ) WHERE sem_rank <= $HybridListK),
       |fused AS (
       |  SELECT coalesce(l.query_id, s.query_id) AS query_id,
       |         coalesce(l.doc_id, s.doc_id) AS doc_id,
       |         CAST(l.rnk AS DOUBLE) AS lex_rank,
       |         CAST(s.sem_rank AS DOUBLE) AS sem_rank,
       |         coalesce(1.0 / ($RrfK0 + l.rnk), 0.0) +
       |         coalesce(1.0 / ($RrfK0 + s.sem_rank), 0.0) AS rrf
       |  FROM lex l FULL OUTER JOIN sem s
       |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY rrf DESC, doc_id ASC) AS rank FROM fused)
       |SELECT query_id, doc_id, lex_rank, sem_rank, rrf, rank
       |FROM ranked WHERE rank <= $HybridK ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------------
  // s39 oracle — the streamed HYBRID serving pipeline's batch ground
  // truth: x71's BM25 CTE chain at the fusion depth, the s37 IVF-fixed
  // ranking over the SAME eval-slice query set (probed candidates →
  // exact cosine → per-query rank), fused with x76's exact 1/(k0+rank)
  // arithmetic. Constants are the shared HybridListK/HybridK/RrfK0 and
  // IvfPqFixed values the Spark side resolves to.
  // ---------------------------------------------------------------------
  lazy val hybridServeStreamSql: String = hybridServeSqlFor("TRUE", "TRUE")

  /** The s39 serve SQL parameterized by the ITEM-corpus cut: `docPred`
    * restricts the lexical arm's indexed documents (over `doc_id`),
    * `vecPred` the semantic arm's indexed vectors (over `e.vec_id`) —
    * "TRUE"/"TRUE" is s39/s40's full item split; s43's as-of oracle
    * passes the arrived-prefix predicates per serve stage. ONE
    * definition of the serve semantics for all three entries. */
  private[queries] def hybridServeSqlFor(docPred: String,
                                         vecPred: String,
                                         extraCtes: String = ""): String = {
    val m = Curation.BenchMod
    import graft.operators.SimilaritySearch.{IvfPqFixed => P}
    def cos(a: String, b: String) =
      ExtendedQueries.cosSqlOn(s"$a.embedding", s"$b.embedding")
    s"""WITH ${extraCtes}lex AS (${bm25CoreSql(HybridListK, docPred)}),
       |cents AS (
       |  SELECT vec_id AS cid, embedding FROM embeddings
       |  WHERE vec_id < ${P.NLists}),
       |assign AS (
       |  SELECT vec_id, cid AS cell FROM (
       |    SELECT e.vec_id, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cos("e", "c")} DESC, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cents c
       |    WHERE e.vec_id % $m <> 0 AND ($vecPred)) t
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, cid AS cell FROM (
       |    SELECT q.vec_id AS query_id, c.cid,
       |           row_number() OVER (PARTITION BY q.vec_id
       |             ORDER BY ${cos("q", "c")} DESC, c.cid) AS rn
       |    FROM embeddings q CROSS JOIN cents c
       |    WHERE q.vec_id % $m = 0 AND q.vec_id < ${Curation.BmQueryIdMax}) t
       |  WHERE rn <= ${P.NProbe}),
       |semscored AS (
       |  SELECT p.query_id, a.vec_id,
       |         ${cos("qe", "ie")} AS cosine
       |  FROM assign a
       |  JOIN probes p ON a.cell = p.cell AND p.query_id <> a.vec_id
       |  JOIN embeddings qe ON qe.vec_id = p.query_id
       |  JOIN embeddings ie ON ie.vec_id = a.vec_id),
       |sem AS (
       |  SELECT query_id, vec_id AS doc_id, sem_rank FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |               ORDER BY cosine DESC, vec_id ASC) AS sem_rank
       |    FROM semscored) t
       |  WHERE sem_rank <= $HybridListK),
       |fused AS (
       |  SELECT coalesce(l.query_id, s.query_id) AS query_id,
       |         coalesce(l.doc_id, s.doc_id) AS doc_id,
       |         CAST(l.rnk AS DOUBLE) AS lex_rank,
       |         CAST(s.sem_rank AS DOUBLE) AS sem_rank,
       |         coalesce(1.0 / ($RrfK0 + l.rnk), 0.0) +
       |         coalesce(1.0 / ($RrfK0 + s.sem_rank), 0.0) AS rrf
       |  FROM lex l FULL OUTER JOIN sem s
       |    ON l.query_id = s.query_id AND l.doc_id = s.doc_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY rrf DESC, doc_id ASC) AS rank FROM fused)
       |SELECT query_id, doc_id, lex_rank, sem_rank, rrf, rank
       |FROM ranked WHERE rank <= $HybridK ORDER BY query_id, rank""".stripMargin
  }

  /** s43 serve-while-maintain's as-of stage count and split: item docs
    * stream in [[AsofStages]] deterministic files (stage = doc_id %
    * AsofStages), and a serve runs after EVERY maintenance batch — so
    * each stage's result must equal a from-scratch serve over exactly
    * the arrived prefix. Shared Scala↔SQL (the desync discipline). */
  private[graft] val AsofStages = 3

  // ---------------------------------------------------------------------
  // s43 oracle — one hybrid serve per as-of point, each over the
  // arrived-prefix item corpus (doc_id % AsofStages <= stage; the query
  // slice and the fixed quantizer are static by construction). The
  // incremental store's integer-sum/row-grain contract is what makes
  // every intermediate state — not just the final one — equal the
  // from-scratch rebuild this SQL computes.
  // ---------------------------------------------------------------------
  lazy val serveWhileMaintainSql: String = {
    val stages = (0 until AsofStages).map { st =>
      val body = hybridServeSqlFor(
        s"doc_id % $AsofStages <= $st", s"e.vec_id % $AsofStages <= $st")
      s"SELECT CAST($st AS INTEGER) AS stage, q.* FROM (\n$body\n) q"
    }
    stages.mkString("", "\nUNION ALL\n", "\nORDER BY stage, query_id, rank")
  }

  // ---------------------------------------------------------------------
  // s46 oracle — the hybrid serve over the RETAINED item corpus: the
  // s39/s40 serve SQL with both arms' item sides restricted by the
  // retention watermark max(doc_id)//4 (BIGINT floor division = the
  // Scala long division the stream derives; the query slice and the
  // fixed quantizer are reference artifacts, never retention-filtered).
  // A hash match proves merge-time expiry — row filters on the
  // row-grain stores plus df/stats REBASED from the retained postings —
  // left the serving state value-identical to a from-scratch build over
  // the retained corpus.
  // ---------------------------------------------------------------------
  lazy val retainedServeSql: String = {
    val w = "(SELECT max(doc_id) // 4 FROM documents)"
    hybridServeSqlFor(s"doc_id >= $w", s"e.vec_id >= $w")
  }

  // ---------------------------------------------------------------------
  // s50 oracle — the COMPOSED release pipeline as one batch SQL: the
  // hybrid serve over the admitted ∩ deduped ∩ retained item corpus.
  // Stage semantics, each the shared fragment of its standalone entry:
  //  - admission: x132's temperature (α = 1/2) keep — rates from the
  //    ordered Σ√p̄ fold over the FULL corpus (the calibration corpus),
  //    keep ⟺ the shared md5-uniform draw < rate (verbatim from
  //    temperatureSampleSql);
  //  - dedup: first-arrival winner per content fingerprint among the
  //    ADMITTED item docs. The stream's input is staged as ASCENDING
  //    doc_id ranges (one file per stage, explicit mod times), so
  //    arrival order ≡ doc_id order and the winner is exactly
  //    min(doc_id) per fp — row_number() OVER (PARTITION BY fp
  //    ORDER BY doc_id) = 1, the s24 keeper rule;
  //  - retention: winners below max(doc_id)//4 expire at the merges
  //    (the s46 watermark). Winners are computed over the PRE-retention
  //    admitted corpus on purpose: an expired winner's later-arriving
  //    duplicate was never admitted, so its content does NOT resurrect —
  //    the stage-interaction semantic this entry exists to pin.
  // A hash match proves the composed streamed run (durable fp store +
  // four serving DeltaStores + retention rebases) is value-identical to
  // this from-scratch batch build over the surviving corpus.
  // ---------------------------------------------------------------------
  /** The s50/s52 admission+dedup CTE chain — ONE definition of the
    * composed pipeline's corpus cut for both readouts (the serve and
    * the attrition report). Ends with a trailing comma: callers append
    * their own CTEs after it. */
  private lazy val releasePipelineCtes: String = {
    val m = Curation.BenchMod
    s"""tcounts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
         |ttot AS (SELECT CAST(SUM(n) AS DOUBLE) AS nn FROM tcounts),
         |tw AS (SELECT lang, CAST(n AS DOUBLE) / nn AS p,
         |              sqrt(CAST(n AS DOUBLE) / nn) AS sq FROM tcounts, ttot),
         |tz AS (SELECT list_sum(list(sq ORDER BY lang)) AS zs FROM tw),
         |tr0 AS (SELECT lang, p, sq / zs AS q FROM tw, tz),
         |tsm AS (SELECT MIN(p / q) AS s FROM tr0),
         |trate AS (SELECT lang, (q * s) / p AS rate FROM tr0, tsm),
         |admit AS (
         |  SELECT d.doc_id, d.text
         |  FROM documents d JOIN trate r USING (lang)
         |  WHERE d.doc_id % $m <> 0 AND d.text IS NOT NULL
         |    AND (CAST(CAST(concat('0x', substr(md5('${Curation.TsampleSeed}' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS DOUBLE) + 0.5)
         |          / 1152921504606846976.0 < r.rate),
         |winners AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (
         |      PARTITION BY md5(${ExtendedQueries.normalizedSql})
         |      ORDER BY doc_id) AS rn
         |    FROM admit) t
         |  WHERE rn = 1),
         |""".stripMargin
  }

  lazy val releaseServeSql: String = {
    val w = "(SELECT max(doc_id) // 4 FROM documents)"
    hybridServeSqlFor(
      s"doc_id >= $w AND doc_id IN (SELECT doc_id FROM winners)",
      s"e.vec_id >= $w AND e.vec_id IN (SELECT doc_id FROM winners)",
      releasePipelineCtes)
  }

  // ---------------------------------------------------------------------
  // s52 oracle — the release ATTRITION REPORT over the same composed
  // cut: stage counts (input → admitted → winners → retained), their
  // ratios (single IEEE divisions, exact-rounded cross-engine), and the
  // gate verdict. The Spark side reads these from the pipeline's OWN
  // audit/winner stores (appended exactly-once per batch, the winner
  // store retention-filtered at the merges); a hash match proves the
  // maintained metrics equal the from-scratch recount.
  // ---------------------------------------------------------------------
  lazy val releaseReportSql: String = {
    val m = Curation.BenchMod
    val w = "(SELECT max(doc_id) // 4 FROM documents)"
    s"""WITH ${releasePipelineCtes}icount AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_input
       |  FROM documents WHERE doc_id % $m <> 0),
       |acount AS (SELECT CAST(count(*) AS BIGINT) AS n_admitted FROM admit),
       |wcount AS (SELECT CAST(count(*) AS BIGINT) AS n_winners FROM winners),
       |rcount AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_retained
       |  FROM winners WHERE doc_id >= $w)
       |SELECT n_input, n_admitted, n_winners, n_retained,
       |  round(CAST(n_admitted AS DOUBLE) / n_input, 6) AS admit_rate,
       |  round(CAST(n_winners AS DOUBLE) / n_admitted, 6) AS dedup_keep_rate,
       |  round(CAST(n_retained AS DOUBLE) / n_winners, 6) AS retain_rate,
       |  n_retained > 0 AND CAST(n_retained AS DOUBLE) / n_winners >= 0.5
       |    AS gate_pass
       |FROM icount, acount, wcount, rcount""".stripMargin
  }

  // ---------------------------------------------------------------------
  // s53 oracle — the GATED release pipeline: s50's admission+dedup cut
  // extended with the two gates x106's batch pipeline runs between
  // exact dedup and release, each the shared fragment of its standalone
  // entry:
  //  - NEAR-DUP gate (capped-candidate CTEs): winner d is dropped iff
  //    SOME earlier exact winner a (a.doc_id < d.doc_id — the stream's
  //    ascending-id staging makes arrival order ≡ id order) shares a
  //    blocking shingle and has 3-word-shingle jaccard ≥ RelNdThreshold.
  //    Blocking keys are shingles whose df over the CALIBRATION corpus
  //    (the full item slice — time-invariant, the s48 pinning posture)
  //    is ≤ RelNdCap. The rule checks ALL earlier exact winners, not
  //    just gate survivors — every admitted representative's content is
  //    in the history — so it is non-recursive and one SQL pass.
  //  - QUARANTINE (containment CTEs): x95's island-window max shared
  //    span of each gate survivor vs the eval slice's SpanGramN-gram
  //    set; a worst island ≥ RelQuarMinSpan tokens quarantines the doc.
  //    Quarantined docs are excluded from the SERVE's corpus predicate,
  //    which also re-derives df/n_docs/avgdl over the served corpus —
  //    matching the stream's serve-time re-derivation exactly.
  // A hash match proves the composed streamed run (fp + nd-history +
  // quarantine DeltaStores, serving indexes, retention rebases, and the
  // serve-time policy filter) is value-identical to this from-scratch
  // batch build over the surviving corpus.
  // ---------------------------------------------------------------------
  private lazy val releaseGatedCtes: String = {
    val m = Curation.BenchMod
    val n = Curation.SpanGramN
    s"""${releasePipelineCtes}ndg AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(greatest(len(w) - 2, 0)),
       |                i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |        WHERE doc_id % $m <> 0)),
       |ndhot AS (
       |  SELECT sh FROM (SELECT sh, COUNT(*) AS c FROM ndg GROUP BY 1)
       |  WHERE c > ${Curation.RelNdCap}),
       |wg AS (SELECT g.doc_id, g.sh FROM ndg g JOIN winners USING (doc_id)),
       |wsz AS (SELECT doc_id, COUNT(*) AS sz FROM wg GROUP BY 1),
       |wblk AS (SELECT doc_id, sh FROM wg
       |         WHERE sh NOT IN (SELECT sh FROM ndhot)),
       |ndcand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM wblk a JOIN wblk b ON a.sh = b.sh AND a.doc_id < b.doc_id),
       |ndinter AS (
       |  SELECT c.id_a, c.id_b, COUNT(*) AS i
       |  FROM wg ga JOIN ndcand c ON ga.doc_id = c.id_a
       |  JOIN wg gb ON gb.doc_id = c.id_b AND gb.sh = ga.sh
       |  GROUP BY 1, 2),
       |nddrop AS (
       |  SELECT DISTINCT id_b AS doc_id
       |  FROM ndinter JOIN wsz za ON id_a = za.doc_id
       |               JOIN wsz zb ON id_b = zb.doc_id
       |  WHERE CAST(i AS DOUBLE) / (za.sz + zb.sz - i)
       |        >= ${Curation.RelNdThreshold}),
       |kept AS (
       |  SELECT doc_id FROM winners
       |  WHERE doc_id NOT IN (SELECT doc_id FROM nddrop)),
       |eref AS (
       |  SELECT DISTINCT array_to_string(w[i+1:i+$n], ' ') AS sh
       |  FROM (SELECT string_split(text, ' ') AS w FROM documents
       |        WHERE doc_id % $m = 0 AND doc_id < ${Curation.BmQueryIdMax}),
       |       LATERAL unnest(range(greatest(len(w) - ${n - 1}, 0))) AS t(i)),
       |kgr AS (
       |  SELECT doc_id, i AS pos, array_to_string(w[i+1:i+$n], ' ') AS sh
       |  FROM (SELECT d0.doc_id, string_split(d0.text, ' ') AS w
       |        FROM documents d0 JOIN kept k ON d0.doc_id = k.doc_id),
       |       LATERAL unnest(range(greatest(len(w) - ${n - 1}, 0))) AS t(i)),
       |km AS (SELECT DISTINCT g.doc_id, g.pos FROM kgr g JOIN eref USING (sh)),
       |kw1 AS (
       |  SELECT doc_id, pos,
       |         MAX(pos + ${n - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM km),
       |kw2 AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN prev_end IS NULL OR pos > prev_end + 1
       |              THEN 1 ELSE 0 END AS brk
       |  FROM kw1),
       |kw3 AS (
       |  SELECT doc_id, pos,
       |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM kw2),
       |kspans AS (
       |  SELECT doc_id, MIN(pos) AS s, MAX(pos) + ${n - 1} AS e
       |  FROM kw3 GROUP BY doc_id, island),
       |quar AS (
       |  SELECT doc_id FROM kspans GROUP BY doc_id
       |  HAVING MAX(e - s + 1) >= ${Curation.RelQuarMinSpan}),
       |""".stripMargin
  }

  lazy val releaseGatedServeSql: String = {
    val w = "(SELECT max(doc_id) // 4 FROM documents)"
    hybridServeSqlFor(
      s"doc_id >= $w AND doc_id IN (SELECT doc_id FROM kept) " +
        "AND doc_id NOT IN (SELECT doc_id FROM quar)",
      s"e.vec_id >= $w AND e.vec_id IN (SELECT doc_id FROM kept) " +
        "AND e.vec_id NOT IN (SELECT doc_id FROM quar)",
      releaseGatedCtes)
  }

  // ---------------------------------------------------------------------
  // x77 — EXACT PHRASE search over a positional inverted index: for each
  // eval-slice query phrase (a fixed 3-token window of the query doc),
  // every corpus document containing the phrase verbatim, with
  // occurrence count and first position — the positional-postings op
  // that bag-of-words BM25 (x71) cannot express, and the lookup shape of
  // exact-phrase decontamination. Classic positional intersection: the
  // corpus explodes ONCE to (doc, pos, token) postings, query terms
  // broadcast with their in-phrase offsets, a match is an anchor
  // (pos − offset) covered by ALL phrase offsets. Corpus-grain cost is
  // one shuffle of the rows whose token appears in some phrase —
  // selective by construction; phrase terms are contiguous doc tokens,
  // and x71's rarest-term budgeting is the mitigation if a phrase is all
  // stopwords. Integer-only arithmetic ⇒ exact hash oracle.
  // ---------------------------------------------------------------------
  private val PhraseOff = 2 // fixed window start inside the query doc
  private val PhraseLen = 3

  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val phrases = docs
      .filter(col("doc_id") % Curation.BenchMod === 0 &&
              col("doc_id") < Curation.BmQueryIdMax)
      .select(col("doc_id").as("query_id"),
              slice(toks, PhraseOff + 1, PhraseLen).as("ph"))
      .filter(size(col("ph")) === PhraseLen)
    Curation.phraseMatches(docs.filter(col("doc_id") % Curation.BenchMod =!= 0), phrases)
      .orderBy("query_id", "doc_id")
  }

  val phraseSearchSql: String = {
    val (m, off, len) = (Curation.BenchMod, PhraseOff, PhraseLen)
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
       |  FROM documents),
       |ph AS (
       |  SELECT doc_id AS query_id, w[${off + 1}:${off + len}] AS p FROM toks
       |  WHERE doc_id % $m = 0 AND doc_id < ${Curation.BmQueryIdMax}
       |    AND len(w) >= ${off + len}),
       |post AS (
       |  SELECT doc_id, i AS pos, w[i+1] AS token
       |  FROM (SELECT * FROM toks WHERE doc_id % $m <> 0),
       |       LATERAL unnest(range(len(w))) AS t(i)),
       |terms AS (
       |  SELECT query_id, i AS off, p[i+1] AS token
       |  FROM ph, LATERAL unnest(range($len)) AS t(i)),
       |anchors AS (
       |  SELECT query_id, doc_id, pos - off AS anchor,
       |         count(DISTINCT off) AS hits
       |  FROM post JOIN terms USING (token)
       |  GROUP BY 1, 2, 3 HAVING count(DISTINCT off) = $len)
       |SELECT query_id, doc_id,
       |       CAST(count(*) AS BIGINT) AS n_occurrences,
       |       CAST(min(anchor) AS BIGINT) AS first_pos
       |FROM anchors GROUP BY 1, 2 ORDER BY query_id, doc_id""".stripMargin
  }

  val all: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] = Seq(
    "x20_deterministic_split" -> ((deterministicSplit _, Some(deterministicSplitSql))),
    "x21_quality_filter"      -> ((qualityFilter _, Some(qualityFilterSql))),
    "x22_pii_scrub"           -> ((piiScrub _, Some(piiScrubSql))),
    "x23_sequence_packing"    -> ((sequencePacking _, Some(sequencePackingSql))),
    "x24_heavy_hitters"       -> ((heavyHitters _, Some(heavyHittersSql))),
    "x25_greedy_pack"         -> ((greedyPacking _, Some(greedyPackingSql))),
    "x26_contamination"       -> ((contamination _, Some(contaminationSql))),
    "x27_curation_pipeline"   -> ((curationPipeline _, Some(curationPipelineSql))),
    "x28_repetition"          -> ((repetition _, Some(repetitionSql))),
    "x29_lang_rebalance"      -> ((langRebalance _, Some(langRebalanceSql))),
    "x30_quality_top_quantile" -> ((qualityTopQuantile _, Some(qualityTopQuantileSql))),
    "x32_chunking"            -> ((chunking _, Some(chunkingSql))),
    "x33_tfidf"               -> ((tfidf _, Some(tfidfSql))),
    "x34_mixture_sample"      -> ((mixtureSample _, Some(mixtureSampleSql))),
    "x35_unigram_logprob"     -> ((unigramLogprob _, Some(unigramLogprobSql))),
    "x36_vocab_coverage"      -> ((vocabCoverage _, Some(vocabCoverageSql))),
    "x89_zipf_fit"            -> ((zipfFit _, Some(zipfFitSql))),
    "x93_dsir_selection"      -> ((dsirSelect _, Some(dsirSelectSql))),
    "x96_dsir_hashed"         -> ((dsirSelectHashed _, Some(dsirSelectHashedSql))),
    "x124_quality_classifier_fixed" -> ((qualityClassifierFixedQ _,
      Some(qualityClassifierFixedSql))),
    "x125_quality_classifier_trained" -> ((qualityClassifierTrainedQ _, None)),
    "x130_pareto_classifier_trained" -> ((paretoClassifierSampleTrainedQ _, None)),
    "x133_pareto_classifier_stored" -> ((paretoClassifierSampleStoredQ _, None)),
    "x132_temperature_sample" -> ((temperatureSampleQ _, Some(temperatureSampleSql))),
    "x98_decontam_dashboard"  -> ((decontamDashboard _, Some(decontamDashboardSql))),
    "x100_signal_agreement"   -> ((signalAgreement _, Some(signalAgreementSql))),
    "x41_datacard"            -> ((datacard _, Some(datacardSql))),
    "x42_token_budget"        -> ((tokenBudget _, Some(tokenBudgetSql))),
    "x43_segment_dedup"       -> ((segmentDedup _, Some(segmentDedupSql))),
    "x47_priority_sample"     -> ((prioritySample _, Some(prioritySampleSql))),
    "x51_domain_cap"          -> ((domainCapQ _, Some(domainCapSql))),
    "x104_selection_pipeline" -> ((selectionPipelineQ _, Some(selectionPipelineSql))),
    "x106_release_pipeline"   -> ((releasePipelineQ _, Some(releasePipelineSql))),
    "x107_repetition_profile" -> ((repetitionProfileQ _, Some(repetitionProfileSql))),
    "x52_collocations"        -> ((collocationsQ _, Some(collocationsSql))),
    "x53_approx_heavy_hitters" -> ((approxHeavyHitters _, Some(approxHeavyHittersSql))),
    "x68_bpe_merges"          -> ((bpeMergesQ _, None)),
    "x109_bpe_merges_distributed" -> ((bpeMergesDistributedQ _, None)),
    "x69_bpe_encode"          -> ((bpeEncodeQ _, None)),
    "x90_tokenizer_fertility" -> ((tokenizerFertilityQ _, None)),
    "x123_tokenizer_fertility_zero" -> ((tokenizerFertilityZeroQ _, Some(tokenizerFertilityZeroSql))),
    "x71_bm25"                -> ((bm25 _, Some(bm25Sql))),
    "x76_hybrid_rrf"          -> ((hybridRrf _, Some(hybridRrfSql))),
    "x77_phrase_search"       -> ((phraseSearch _, Some(phraseSearchSql))),
    "x74_text_normalize"      -> ((textNormalize _, Some(textNormalizeSql))),
    "x86_corpus_diff"         -> ((corpusDiffQ _, Some(corpusDiffSql))),
    "x103_snapshot_drift"     -> ((snapshotDriftQ _, Some(snapshotDriftSql))),
    "x87_bigram_xent"         -> ((bigramXent _, Some(bigramXentSql))),
    "x101_bigram_xent_hashed" -> ((bigramXentHashed _, Some(bigramXentHashedSql))),
    "x112_ccnet_buckets"      -> ((ccnetBucketsQ _, Some(ccnetBucketsSql))),
    "x113_ccnet_buckets_scaled" -> ((ccnetBucketsScaledQ _, None)),
    "x118_bigram_xent_kn"     -> ((bigramXentKN _, Some(bigramXentKNSql))),
    "x120_bigram_xent_kn_hashed" -> ((bigramXentKNHashed _, Some(bigramXentKNHashedSql))),
    "x119_pareto_quality_sample" -> ((paretoQualitySampleQ _, Some(paretoQualitySampleSql))),
    "x126_pareto_classifier_sample" -> ((paretoClassifierSampleQ _,
      Some(paretoClassifierSampleSql))),
    "x127_classifier_calibration" -> ((classifierCalibrationQ _,
      Some(classifierCalibrationSql))),
  )
}
