package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation patterns (SURVEY.md §4 / the 100 TB
  * checklist). Low-cardinality grouping keys (e.g. 5 event types over
  * 100 TB) funnel entire key groups through single reducers; salting
  * splits each group across `buckets` reducers and recombines.
  *
  * Plain SUM/COUNT don't need this (Spark's partial aggregation
  * already combines map-side); the wins are for state-heavy aggs —
  * COUNT(DISTINCT), collect-style, sketches — where per-reducer state
  * is proportional to group payload.
  */
object Skew {

  /** Exact distinct count per group via salting: the salt is derived
    * from the DISTINCT column (`xxhash64 % buckets`), so every
    * distinct value lands in exactly one (group, salt) cell and the
    * per-salt distinct counts add up exactly. Two balanced shuffles
    * instead of one skewed one. */
  def saltedDistinctCount(df: DataFrame, groupCols: Seq[String],
      distinctCol: String, buckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(col(distinctCol)), lit(buckets)))
    val partial = salted
      .groupBy((groupCols :+ "_salt").map(col): _*)
      .agg(countDistinct(col(distinctCol)).as("_partial"))
    partial.groupBy(groupCols.map(col): _*)
      .agg(sum("_partial").as(s"${distinctCol}_distinct"))
  }

  /** Salted exact-decimal sum + count (the generic two-stage shape for
    * any algebraic agg under extreme key skew). The salt is a per-row
    * counter, NOT value-derived — a constant-valued hot group would
    * collapse a content hash into one bucket, reproducing the skew.
    * The decimal partial sums are associative, so the (partitioning-
    * dependent) salt assignment cannot change the result. */
  def saltedSumCount(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, buckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val partial = salted
      .groupBy((groupCols.map(col) :+ col("_salt")): _*)
      .agg(sum(valueCol.cast(graft.Canon.Money)).as("_psum"),
        count(lit(1)).as("_pcnt"))
    partial.groupBy(groupCols.map(col): _*)
      .agg(round(sum("_psum").cast("double"), 6).as("value_sum"),
        sum("_pcnt").as("cnt"))
  }
}
