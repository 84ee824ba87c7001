package graft

import graft.queries.{AnalyticsQueries, BatchAssemblyQueries,
  BpeQueries, DedupQueries, DpoQueries, FamilyExportQueries,
  FimQueries, FreezeExactQueries,
  MixQueries, MultimodalQueries, RefQueries, SftQueries,
  SimilarityQueries,
  TextQueries, TokenizerEvalQueries, ToolQueries, UnigramQueries,
  VlmQueries, WordPieceQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in `graft.queries.*` modules as [[QueryDef]]s; this
  * object just flattens them into the harness shape.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    RefQueries.defs ++ AnalyticsQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ TextQueries.defs ++
      MultimodalQueries.defs ++ BpeQueries.defs ++ UnigramQueries.defs ++
      WordPieceQueries.defs ++ TokenizerEvalQueries.defs ++
      BatchAssemblyQueries.defs ++ SftQueries.defs ++
      FreezeExactQueries.defs ++ VlmQueries.defs ++ DpoQueries.defs ++
      FimQueries.defs ++ ToolQueries.defs ++
      FamilyExportQueries.defs ++ MixQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("ref_rename_plan")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
