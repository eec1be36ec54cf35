package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CurationQueries, ExtendedQueries, InfraQueries, ReferenceQueries, TpchQueries}
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator registry: one entry per implemented
  * operator from SURVEY.md §2 (reference surface) plus the beyond-reference
  * LLM-pipeline operators. `oracleSql` carries the DuckDB-equivalent SQL
  * for every SQL-expressible entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.q14(spark, "/root/testdata/sf0.001")

  private val registry: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] =
    ReferenceQueries.all.map { case (name, (fn, sql)) => name -> ((fn, Option(sql))) } ++
    ReferenceQueries.allNoOracle ++
    TpchQueries.all ++
    ExtendedQueries.all ++
    CurationQueries.all ++
    StreamingQueries.all ++
    InfraQueries.all ++
    graft.streaming.PipelineMetrics.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (name, (fn, _)) => name -> fn }.toMap

  def oracleSql: Map[String, String] =
    registry.collect { case (name, (_, Some(sql))) => name -> sql }.toMap

  /** Operator family for the served registry (gateway `/entries`) —
    * COVERAGE.md's decision-table grouping, derived from the prefix the
    * registry names already encode. */
  def family(name: String): String = name.headOption match {
    case Some('q') => "reference-queries"
    case Some('j') => "batch-analytics"
    case Some('s') => "streaming-store"
    case Some('m') => "self-metrics"
    case Some('g') => "generator"
    case Some('x') => "llm-pipeline"
    case _         => "other"
  }

  /** Curated scale caveats for entries whose COVERAGE.md row carries
    * one — served on `/entries` so the hint travels with the registry
    * instead of living only in repo docs. Entries absent here have no
    * known scale caveat. */
  val scaleCaveats: Map[String, String] = Map(
    "x08_ngram_jaccard" ->
      "uncapped pair generation: quadratic on boilerplate cliques — use x62 at scale",
    "x38_cross_corpus_dedup" ->
      "uncapped pair generation — use x63 (df-capped) at scale",
    "x44_bloom_cross_dedup" ->
      "uncapped candidate generation — use x63 (df-capped) at scale",
    "x09_embedding_neardup" ->
      "exact pairwise cosine — use x14 (LSH-bucketed) at scale",
    "x84_semantic_split_leakage" ->
      "exact pairwise cosine pair generator — use x85 (LSH-bucketed composition) at scale",
    "x85_semantic_split_leakage_lsh" ->
      "candidate volume tracks TRUE cross-split near-dup count: mass-duplicated corpora grow pairs quadratically in the duplication factor (same regime as x14)",
    "x10_knn_bruteforce" ->
      "exact full-scan baseline — use x15/x45/x46 (IVF/PQ) at scale",
    "x93_dsir_selection" ->
      "joint-vocabulary model relation grows with the corpus — use x96 (hashed fixed-width 4096-bucket model) at scale",
    "x68_bpe_merges" ->
      "vocabulary must fit one executor task (maxVocab guard) — raise minWordFreq at web scale",
    "s25_stream_neardup" ->
      "static reference pinned in executor memory — use the bucketed-table variant when it must outlive the process",
    "x82_chi_square" ->
      "global window over the |devices|x|pages| cells relation (dashboard-sized by construction)",
    "s28_shard_writer" ->
      "wall grows with SHARD COUNT (total tokens / budget) via the partitioned write - size the token budget to the corpus",
    "x14_embedding_neardup_lsh" ->
      "candidate volume tracks TRUE near-dup pair count: mass-duplicated corpora grow pairs quadratically in the duplication factor - cluster-dedup first (x48) on such corpora",
    "x48_semdedup" ->
      "within-cell pairwise: cells bound the quadratic, but heavy duplication still grows pair work - use the cellCap mode (x102) on pathological corpora",
    "x87_bigram_xent" ->
      "bigram model relation grows faster than the open vocabulary - use x101 (hashed 256-bucket fixed-width model) at scale")
}
