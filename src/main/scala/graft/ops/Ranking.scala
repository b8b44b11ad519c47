package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the building block q59's budget
  * selection uses, factored out: a total-order rank over the whole
  * relation WITHOUT a single-partition window. Range shuffle on the
  * sort key (partition i's rows all precede partition i+1's), per-
  * partition row counts collected driver-side (bounded by the
  * partition count, never row count), then partition-LOCAL row_number
  * plus the partition's offset. Ties must be broken by the caller's
  * sort columns (include a unique key) — with a total order, the rank
  * is partitioning-independent and therefore oracle-stable.
  *
  * The stage barrier goes through [[graft.Staging.stage]]: local
  * blocks by default, a RELIABLE checkpoint under
  * `spark.graft.reliableCheckpoint=true` so a preemptible fleet's
  * lost executor costs a re-read instead of the job (round-16
  * verdict item 8; results bit-identical either way, spec-pinned).
  */
object Ranking {

  def globalRank(df: DataFrame, rankCol: String,
      sortCols: Column*): DataFrame = {
    val staged = df.repartitionByRange(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      // the counts agg and the rank pass must see the SAME partitioning
      // (range sampling re-runs otherwise)
      .transform(graft.Staging.stage)
    val counts = staged.groupBy("_pid").agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid + 1, acc + n) }
        .init.zip(counts).map { case ((_, off), (pid, _)) => pid -> off }.toMap
    val w = Window.partitionBy("_pid").orderBy(sortCols: _*)
    staged.withColumn(rankCol,
      row_number().over(w).cast("long") +
        coalesce(element_at(typedLit(offsets), col("_pid")), lit(0L)))
      .drop("_pid")
  }

  /** Distributed global RUNNING SUM of `valCol` over the total order
    * `sortCols` — the prefix-sum twin of [[globalRank]] (and the
    * machinery q59's budget selection inlines): range shuffle on the
    * sort key, per-partition value totals collected driver-side
    * (bounded by partition count), partition-LOCAL window sum plus the
    * preceding partitions' offset. No single-partition window at any
    * size. The caller's sort columns must form a total order (include
    * a unique key) so the prefix at every row is partitioning-
    * independent and oracle-stable. */
  def globalPrefixSum(df: DataFrame, sumCol: String, valCol: String,
      sortCols: Column*): DataFrame = {
    val staged = df.repartitionByRange(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .transform(graft.Staging.stage) // offsets agg + main pass must share one partitioning
    val totals = staged.groupBy("_pid")
      .agg(sum(col(valCol).cast("long")).as("_t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] =
      totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid + 1, acc + t) }
        .init.zip(totals).map { case ((_, off), (pid, _)) => pid -> off }.toMap
    val w = Window.partitionBy("_pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged.withColumn(sumCol,
      sum(col(valCol).cast("long")).over(w) +
        coalesce(element_at(typedLit(offsets), col("_pid")), lit(0L)))
      .drop("_pid")
  }

  /** Token-balanced shard assignment (LPT-flavored): rank docs by
    * size descending (unique-key tiebreak), deal rank-round-robin
    * into `shards` — the biggest docs spread first, so shard token
    * totals stay within a few percent of each other, which is what a
    * distributed training job needs from its input shards. Entirely
    * deterministic: the assignment is a pure function of the corpus. */
  def balancedShards(df: DataFrame, sizeCol: String, idCol: String,
      shards: Int): DataFrame =
    globalRank(df, "_rank", col(sizeCol).desc, col(idCol).asc)
      .withColumn("shard", ((col("_rank") - 1) % shards).cast("int"))
      .drop("_rank")
}
