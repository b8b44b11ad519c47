package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query from SURVEY.md §2.2: a Spark program plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver
  * hash-checks it against. `oracle = None` → driver records a weaker
  * rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
