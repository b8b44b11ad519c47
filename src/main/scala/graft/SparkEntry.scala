package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  * `queries` is the declared operator inventory (SURVEY.md §2.2);
  * each entry with an `oracleSql` twin is hash-checked against DuckDB
  * on the same parquet tables by the driver's Verify harness.
  */
object SparkEntry {

  val allDefs: Seq[QueryDef] =
    Scans.defs ++ Joins.defs ++ Aggregates.defs ++ Windows.defs ++
      SetsFuncs.defs ++ SqlQueries.defs ++ Streaming.defs ++
      Extensions.defs ++ NorthStar.defs ++ Ingest.defs ++ Sampling.defs ++
      Curation5x.defs ++ Analytics.defs ++ Warehouse.defs ++ Graphs.defs

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): the
    * multiway-join revenue rollup (Q09 shape). */
  def entry(spark: SparkSession): DataFrame =
    Joins.q09.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** DuckDB-equivalent SQL per query (driver's correctness oracle). */
  def oracleSql: Map[String, String] =
    allDefs.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
