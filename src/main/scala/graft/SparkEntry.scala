package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The real catalog lives in [[graft.catalog.Queries]]; each entry pairs a
  * Spark implementation (usually delegating to an operator in
  * `graft.operators.*`) with a DuckDB oracle SQL string.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-per-nation 4-way join — exercises scan, broadcast join,
    * shuffle join, aggregation, sort in one plan. */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("q06_join_3way")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.byName

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
