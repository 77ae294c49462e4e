package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is declared here as a named query
  * (category objects under graft.ops) with, where SQL-expressible, a
  * DuckDB oracle that hash-matches the Spark result bit-for-bit (see the
  * determinism policy in [[Tables]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's identity: CDC latest-row-wins collapse (SURVEY §2.4 A8).
    */
  def entry(spark: SparkSession): DataFrame =
    Aggregations.queries("agg_latest_by_version")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Scans.queries ++ Projections.queries ++ Joins.queries ++
      Aggregations.queries ++ Mutations.queries ++ SortSetOps.queries ++
      Windows.queries ++ Functions.queries ++ Llm.queries ++
      graft.streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those). */
  def oracleSql: Map[String, String] =
    Scans.oracle ++ Projections.oracle ++ Joins.oracle ++
      Aggregations.oracle ++ Mutations.oracle ++ SortSetOps.oracle ++
      Windows.oracle ++ Functions.oracle ++ Llm.oracle ++
      graft.streaming.StreamingOps.oracle
}
