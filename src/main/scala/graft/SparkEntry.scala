package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's inventory. Each key in [[queries]] has a
  * DuckDB-oracle SQL twin in [[oracleSql]] (same column names — the driver's
  * compare sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.TimeSeries.queries ++
      graft.queries.Joins.queries ++
      graft.queries.Aggregates.queries ++
      graft.queries.Windows.queries ++
      graft.queries.SortsSetsFns.queries ++
      graft.queries.NorthStar.queries ++
      graft.queries.Pipeline.queries ++
      graft.queries.Graph.queries ++
      graft.queries.Streaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
      graft.queries.TimeSeries.oracleSql ++
      graft.queries.Joins.oracleSql ++
      graft.queries.Aggregates.oracleSql ++
      graft.queries.Windows.oracleSql ++
      graft.queries.SortsSetsFns.oracleSql ++
      graft.queries.NorthStar.oracleSql ++
      graft.queries.Pipeline.oracleSql ++
      graft.queries.Graph.oracleSql ++
      graft.queries.Streaming.oracleSql
}
