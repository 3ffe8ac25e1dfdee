package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryModule's registry. Each query name has a Spark
  * implementation and (where ANSI-SQL-expressible) a DuckDB oracle over
  * the same parquet tables; column names/aliases match on both sides.
  */
object SparkEntry {

  /** All registered query modules, in registration order. */
  def modules: Seq[QueryModule] = Seq(
    graft.queries.Core,
    graft.queries.Relational,
    graft.queries.TextAnalysis,
    graft.queries.Dedup,
    graft.queries.Similarity,
    graft.queries.Multimodal,
    graft.queries.EventsTime,
    graft.queries.Io,
    graft.queries.Sql)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys -> driver rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
