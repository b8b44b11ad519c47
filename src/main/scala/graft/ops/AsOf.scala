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

  /** Time-bucketed scale variant: parallelism = |keys × time-buckets|
    * instead of |keys| — the guard for low-cardinality keys, where
    * [[joinNative]]'s ClusteredDistribution(key) would cap reducers at
    * the key count (20 in q14) no matter the cluster size.
    *
    * Both sides co-partition on (key, bucketOf(time)). Boundary
    * carry-over makes per-bucket merges globally correct: for every
    * (key, bucket) the LEFT side populates, the latest right row from
    * any STRICTLY EARLIER bucket is forward-filled in as one extra
    * "carry" row (computed declaratively: latest-per-(key,rbucket) via
    * window, then a running `last(ignoreNulls)` over the bucket axis
    * where markers sort before same-bucket latests, so a marker sees
    * only earlier buckets). Within a bucket the match is either an
    * in-bucket right row ≤ t or that carry — exactly the global as-of
    * answer. Cost: one extra narrow window over ~|key×bucket| rows;
    * right rows are never replicated more than once per left-populated
    * bucket gap. The final merge is the same native sort-merge exec,
    * keyed on struct(key, bucket).
    *
    * @param bucketOf maps a time column to a coarse bucket id; width
    *   trades carry-row volume (narrow buckets) against per-reducer
    *   row count (wide buckets). */
  def joinBucketed(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightCols: Seq[String], tieBreak: String)
      (bucketOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {

    val l = left.withColumn("_b", bucketOf(col(leftTime)))
      .withColumn("_kb", struct(col(leftKey), col("_b")))
    // right side, narrowed: null key/time rows can never match
    val r0 = right.select(Seq(col(rightKey).as("_k"),
        col(rightTime).as("_t"), col(tieBreak).as("_tb")) ++
        rightCols.map(c => right(c).as(s"_p_$c")): _*)
      .filter(col("_k").isNotNull && col("_t").isNotNull)
      .withColumn("_b", bucketOf(col("_t")))

    // latest right row per (key, rbucket): max time, ties → min tieBreak
    val wLatest = Window.partitionBy("_k", "_b")
      .orderBy(col("_t").desc, col("_tb").asc)
    val pv = struct(col("_t") +: col("_tb") +:
      rightCols.map(c => col(s"_p_$c")): _*)
    val latest = r0.withColumn("_rn", row_number().over(wLatest))
      .filter(col("_rn") === 1).select(col("_k"), col("_b"),
        lit(1).as("_side"), pv.as("_pv"))

    // markers: the (key, bucket) pairs the left actually populates
    val markers = l.select(col(leftKey).as("_k"), col("_b")).distinct()
      .select(col("_k"), col("_b"), lit(0).as("_side"),
        lit(null).cast(latest.schema("_pv").dataType).as("_pv"))

    // forward fill along the bucket axis; side 0 < side 1 within a
    // bucket, so a marker's running last() sees only earlier buckets
    val wFill = Window.partitionBy("_k")
      .orderBy(col("_b").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carries = markers.unionByName(latest)
      .withColumn("_carry", last("_pv", ignoreNulls = true).over(wFill))
      .filter(col("_side") === 0 && col("_carry").isNotNull)
      .select(Seq(col("_k"), col("_b"), col("_carry._t").as("_t"),
        col("_carry._tb").as("_tb")) ++
        rightCols.map(c => col(s"_carry._p_$c").as(s"_p_$c")): _*)

    val augmented = r0.select(carries.columns.map(col): _*)
      .unionByName(carries)
      .withColumn("_kb", struct(col("_k"), col("_b")))
    val renamed = augmented.select(Seq(col("_kb"), col("_t"), col("_tb")) ++
      rightCols.map(c => col(s"_p_$c").as(c)): _*)

    joinNative(l, "_kb", leftTime, renamed, "_kb", "_t", rightCols, "_tb")
      .drop("_b", "_kb")
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
