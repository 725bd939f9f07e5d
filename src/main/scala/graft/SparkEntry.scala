package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator family from SURVEY §2,
  * implemented Spark-first in `graft.queries.*` / `graft.operators.*` on the
  * driver's testdata tables; [[oracleSql]] carries the DuckDB-equivalent SQL
  * for the correctness gate (omitted only for non-SQL-expressible ops).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the reference's full DAG (staging → intermediate → dim → fct)
    * end-to-end over synthesized raw tables.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q54_fct_indicators")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ TimeSeriesQueries.defs ++
      TextQueries.defs ++ VectorQueries.defs ++ PipelineQueries.defs ++
      TemporalQueries.defs ++ OlapQueries.defs ++ CurationQueries.defs ++
      RetrievalQueries.defs ++ GraphQueries.defs ++ IncrementalQueries.defs ++
      WebQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TimeSeriesQueries.oracles ++
      TextQueries.oracles ++ VectorQueries.oracles ++ PipelineQueries.oracles ++
      TemporalQueries.oracles ++ OlapQueries.oracles ++ CurationQueries.oracles ++
      RetrievalQueries.oracles ++ GraphQueries.oracles ++
      IncrementalQueries.oracles ++ WebQueries.oracles
}
