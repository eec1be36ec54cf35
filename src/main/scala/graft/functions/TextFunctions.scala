package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * Everything here is composed from built-in (codegen'd) expressions —
  * no UDFs — so these run inside WholeStageCodegen at full scan speed and
  * are usable in both batch and Structured Streaming plans.
  *
  * Where a function participates in the DuckDB oracle, the construction is
  * deliberately restricted to operations with identical semantics in both
  * engines (length/replace arithmetic, RE2-compatible regexes), see
  * graft.queries.ExtendedQueries for the paired SQL.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count (single-space-delimited text). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: maximal alnum runs; punctuation splits. */
  def wordpieceCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0)))

  /** Number of (non-overlapping) occurrences of `needle` as a whole word. */
  def wordOccurrences(text: Column, needle: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val token = s" $needle "
    (length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(token), " ")))
      ./(lit(token.length - 1)).cast("long")
  }

  /** Marker words per language for the n-gram-heuristic language ID.
    * Ordered: ties resolve to the earlier entry. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "de" -> Seq("der", "und", "die"),
    "fr" -> Seq("le", "et", "les"),
    "es" -> Seq("el", "y", "los"),
    "zh" -> Seq("的", "是", "在"),
  )

  /** Score for one language = Σ occurrences of its marker words. */
  def langScore(text: Column, lang: String): Column =
    LangMarkers.toMap.apply(lang)
      .map(wordOccurrences(text, _))
      .reduce(_ + _)

  /** Heuristic language ID: argmax of marker-word scores, 'und' when all
    * scores are zero. Deterministic tie-break = LangMarkers order. */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(text, l) }
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((l, s), elseCol) =>
      when(s === maxScore && maxScore > 0, lit(l)).otherwise(elseCol)
    }
  }

  /** Fraction of alphanumeric (non-space, non-punct) characters. */
  def alnumRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(lower(text), "[^a-z0-9]", "")).cast("double") / length(text))

  /** Fraction of tokens that are high-frequency stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = Seq("the", "a", "and", "of")): Column = {
    val occ = stopwords.map(wordOccurrences(text, _)).reduce(_ + _)
    when(tokenCount(text) === 0, 0.0)
      .otherwise(occ.cast("double") / tokenCount(text))
  }

  /** Mean token length in characters (single-spaced text). */
  def avgTokenLen(text: Column): Column =
    when(tokenCount(text) === 0, 0.0)
      .otherwise((length(text) - tokenCount(text) + 1).cast("double") / tokenCount(text))

  /** Composite document-quality score in [0, 1]:
    * rewards reasonable length, plausible word lengths, alphanumeric
    * content; penalizes stopword stuffing. Heuristic weights — the shape
    * (bounded linear combination of cheap per-doc stats) is what a
    * pretraining-data filter needs, each component is independently
    * usable. */
  def qualityScore(text: Column): Column = {
    val lengthTerm = least(tokenCount(text).cast("double") / 64.0, lit(1.0))
    val tokenLenTerm =
      when(avgTokenLen(text).between(3.0, 8.0), 1.0).otherwise(0.5)
    val alnumTerm = alnumRatio(text)
    val stopTerm = lit(1.0) - stopwordRatio(text)
    lit(0.3) * lengthTerm + lit(0.2) * tokenLenTerm + lit(0.2) * alnumTerm + lit(0.3) * stopTerm
  }

  /** Normalize for fingerprinting: lowercase, collapse whitespace, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint = md5 of the normalized text. Used as the exact
    * dedup key: hash-groupBy on this beats groupBy on a long text column
    * (fixed-width shuffle keys). */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Winnowing fingerprint (the MOSS scheme), plain-JVM kernel: hash
    * every word k-gram (60-bit, deterministic), then select the MINIMUM
    * hash of every window of `w` consecutive k-gram hashes. Guarantee:
    * any shared token run of length ≥ w+k-1 between two documents
    * contributes at least one common selected fingerprint — minimum
    * selection is position-independent.
    *
    * The gram hash is the top 60 bits of md5 — an ENGINE-SHARED hash
    * (DuckDB: `CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)`), which is
    * what lets the whole operator be oracle-hash-checked instead of
    * rows-only (a seeded MurmurHash3 was tried first: faster, but
    * JVM-private, so the oracle could only count rows). 60 bits keeps
    * the value positive in both engines' signed int64 and loses nothing
    * the 64-bit hash had — collision odds at corpus scale are governed
    * by the birthday bound either way.
    *
    * Deliberately NOT a Column expression: Spark's higher-order
    * functions (`transform`/`slice`/`array_min`) are CodegenFallback —
    * interpreted, tree-not-DAG, so a nested sliding-window-minimum
    * re-evaluates the whole gram pipeline per window (measured 40×
    * slower at sf0.1). The kernel runs batched per partition via
    * `mapPartitions` (see Dedup.winnowingOverlaps), like the multimodal
    * codecs. Output: sorted distinct selected hashes. */
  def winnow(text: String, k: Int = 3, w: Int = 4): Array[Long] = {
    val toks = text.split(" ")
    if (toks.length < k) return Array.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val nGrams = toks.length - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val g = {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
        sb.toString
      }
      // big-endian long of the first 8 digest bytes, top 60 bits — equals
      // parsing the first 15 hex chars of the md5 string on either engine
      val d = md.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      hashes(i) =
        (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
         ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
         ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
         ((d(6) & 0xffL) << 8)  |  (d(7) & 0xffL)) >>> 4
      i += 1
    }
    if (nGrams < w) return Array(hashes.min)
    val sel = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i <= nGrams - w) {
      var m = hashes(i)
      var j = i + 1
      while (j < i + w) { if (hashes(j) < m) m = hashes(j); j += 1 }
      sel.add(m)
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator(); i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Word n-gram shingles (distinct, first-occurrence order), the
    * MinHash/Jaccard input unit. Documents with fewer than n tokens yield
    * an EMPTY set (no truncated shingle) — mirrored by the DuckDB
    * oracle's `range(len-n+1)`. Backed by the codegen'd
    * [[WordShingles]] kernel: the equivalent HOF composition
    * (`array_distinct ∘ transform ∘ sequence/slice`) is CodegenFallback
    * and ~10× slower on the shingle-heavy dedup paths. */
  def shingles(text: Column, n: Int): Column =
    TextKernels.word_shingles(text, n)

  /** ALL word n-grams in document order (non-distinct, one per start
    * position) — `posexplode(gramSeq(...))` is the (pos, gram) input of
    * span-level dedup ([[graft.operators.Dedup.duplicatedSpans]]).
    * Backed by the codegen'd [[WordGramSeq]] kernel; same
    * split-on-single-space and <n-tokens ⇒ empty semantics as
    * [[shingles]]. */
  def gramSeq(text: Column, n: Int): Column =
    TextKernels.word_gram_seq(text, n)
}
