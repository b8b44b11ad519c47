package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md Q14): for each left row, attach the single
  * right row with the largest `rightTime <= leftTime` within the same
  * key; ties on time broken by the smallest `tieBreak`.
  *
  * Implemented as UNION + window rather than a range join: both sides
  * are tagged, unioned, shuffled once on the key, sorted by
  * (time, side, tieBreak), and a running `last(_, ignoreNulls)` carries
  * the most recent right-side payload onto each left row. This is
  * O(n log n) per key with ONE shuffle and no candidate-pair blowup —
  * the naive `t_r <= t_l` range join materializes a candidate set
  * quadratic in per-key density, which at 100 TB is the difference
  * between a sort and an explosion. (Mirrors the KDB/Flink as-of
  * "merge" formulation.)
  */
object AsOf {

  /** @param rightCols right-side columns to attach (null when no match) */
  def join(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightCols: Seq[String], tieBreak: String): DataFrame = {

    val rv = struct(rightCols.map(c => right(c)): _*)
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).cast("timestamp").as("_t"),
      lit(0).as("_side"), col(tieBreak).cast("long").as("_tb"), rv.as("_rv"))
    val l = left
      .withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime).cast("timestamp"))
      .withColumn("_side", lit(1))
      .withColumn("_tb", lit(null).cast("long"))
      .withColumn("_rv", lit(null).cast(r.schema("_rv").dataType))

    // Right rows sort before left rows at equal time (as-of is `<=`);
    // among right rows at equal time, tieBreak DESC makes the running
    // `last` resolve to the smallest tieBreak.
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_match", last("_rv", ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val out = left.columns.toSeq.map(col) ++
      rightCols.map(c => col(s"_match.$c").as(s"asof_$c"))
    matched.select(out: _*)
  }

  /** Native-operator variant: plans [[graft.plans.AsOfJoinPlan]], which
    * [[graft.plans.AsOfJoinStrategy]] (via GraftExtensions) executes as
    * a co-partitioned sort-merge — one shuffle per side, O(n+m) merge,
    * constant memory. Same declared semantics as [[join]]. */
  def joinNative(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightCols: Seq[String], tieBreak: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val lp = GraftBridge.analyzed(left)
    val rp = GraftBridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n)
        .getOrElse(throw new IllegalArgumentException(s"no column $n"))
    val df = GraftBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinPlan(lp, rp,
        attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime),
        rightCols.map(c => attr(rp, c)), attr(rp, tieBreak)))
    df.toDF(left.columns.toSeq ++ rightCols.map(c => s"asof_$c"): _*)
  }
}
