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
}
