package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * `queries` is assembled from per-area modules under `graft.queries`; each
  * entry pairs a Spark DataFrame build with DuckDB oracle SQL (when the
  * semantics are SQL-expressible) for the driver's hash compare.
  */
object SparkEntry {
  private def allDefs: Seq[QueryDef] =
    graft.queries.CoreQueries.defs ++
      graft.queries.JoinQueries.defs ++
      graft.queries.GroupQueries.defs ++
      graft.queries.WindowQueries.defs ++
      graft.queries.MiscQueries.defs ++
      graft.queries.DeepQueries.defs ++
      graft.queries.ExtensionQueries.defs ++
      graft.queries.AnalyticsQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.toQueries(allDefs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryDef.toOracle(allDefs)
}
