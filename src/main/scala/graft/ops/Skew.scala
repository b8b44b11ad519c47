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

  /** Skew-salted join: the dim side is replicated `buckets`× (one copy
    * per salt), the fact side tags each row with a salt derived from
    * its OWN unique identity (not the join key — the join key is the
    * hot value we're trying to spread), and the join runs on
    * (key, salt). A hot fact key's rows then land on `buckets`
    * reducers instead of one; the result multiset is exactly the plain
    * join's (each fact row still meets exactly one dim copy). Use when
    * the dim is too big to broadcast but small enough that a
    * `buckets`× blow-up beats a straggler reducer — the third option
    * between BHJ and AQE skew-split (which only kicks in at partition-
    * size thresholds and can't help a single monster KEY inside one
    * partition group). The hint pins the shuffle-join path so the
    * salted shape is what actually executes at test scale too. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, buckets: Int,
      saltSource: Seq[String]): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltSource.map(col): _*), lit(buckets.toLong)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(saltedDim.hint("shuffle_hash"),
      saltedFact(factKey) === saltedDim(dimKey) &&
        saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
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
