package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver
  * hash-matches it against. Non-expressible ops leave `oracle` empty and
  * get the driver's weaker rows-only check (SparkEntry contract).
  *
  * Determinism contract for every oracle-bearing query (SURVEY.md §7.4.1):
  * a total ORDER BY, rounded float aggregates, and identical column names
  * and types on both sides.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
