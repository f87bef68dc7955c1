package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark DataFrame build plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL.
  *
  * Contract notes (driver compare):
  *   - column names must match between the Spark result and the oracle SQL
  *     (the compare sorts columns by name before hashing);
  *   - every result is given a deterministic total ORDER BY on both sides;
  *   - floating aggregates are computed in DECIMAL then cast to DOUBLE on
  *     both sides so the value is order-independent and bitwise identical.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object QueryDef {
  /** Assemble registry maps from query modules. */
  def toQueries(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.build).toMap
  def toOracle(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
