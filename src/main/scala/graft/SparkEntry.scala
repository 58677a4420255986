package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 (reference
  * operators re-expressed Spark-first, plus the LLM-data-pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL the driver replays over
  * the same parquet tables for the hash-compared correctness gate.
  */
object SparkEntry {

  /** All declared queries, from every category module. */
  private def allDefs: Map[String, QueryDef] =
    RelationalQueries.entries ++ CdcQueries.entries ++
      StreamShapeQueries.entries ++ PipelineQueries.entries ++
      CorpusOpsQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The composed curation funnel exercises scan→quality→dedup→window→
    * broadcast-join→aggregate in one plan and always emits its 8 stage
    * rows, so it is both the showcase and a stable smoke target.
    */
  def entry(spark: SparkSession): DataFrame =
    allDefs("q_corpus_curate").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (k, v) => k -> v.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
