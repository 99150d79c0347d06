package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from the per-domain query groups; every entry
  * exercises one or more SURVEY.md §2 operators (ids in `QueryDef.covers`)
  * and, where SQL-expressible, carries a DuckDB oracle.
  */
object SparkEntry {
  def allDefs: Seq[QueryDef] =
    graft.queries.RelationalQueries.defs ++
    graft.queries.WindowQueries.defs ++
    graft.queries.CascadeQueries.defs ++
    graft.queries.MatchQueries.defs ++
    graft.queries.DedupQueries.defs ++
    graft.queries.AnnQueries.defs ++
    graft.queries.TextQueries.defs ++
    graft.queries.EventQueries.defs ++
    graft.queries.SourceQueries.defs ++
    graft.queries.MultimodalQueries.defs ++
    graft.queries.PipelineQueries.defs ++
    graft.queries.EndToEndQueries.defs ++
    graft.queries.CurationQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's actual product spine (SURVEY §7.2), end to end:
    * curate → deflate → relevance cascade → amount waterfall → FTS
    * aggregate → undouble → org-type rollup (= q94, oracle-checked). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.EndToEndQueries.cvaEndToEnd(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(o => q.name -> o.linesIterator.map(_.trim).mkString(" "))).toMap

  /** SURVEY.md §2 operator ids exercised per query (see COVERAGE.md). */
  def coverage: Map[String, Seq[String]] =
    allDefs.map(q => q.name -> q.covers).toMap
}
