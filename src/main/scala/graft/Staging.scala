package graft

import org.apache.spark.sql.DataFrame

/** Stage-barrier materialization policy for the iterative / staged
  * operators (round-16 verdict item 8).
  *
  * The ranking, dedup-blocking and pointer-jumping ops materialize
  * intermediates to (a) pin ONE partitioning across the offsets-agg +
  * main-pass pair, (b) stop self-joins re-executing the expensive
  * producer on both sides, and (c) keep iterative lineage flat. The
  * default mechanism is `localCheckpoint()` — executor-local blocks,
  * no reliable-storage write, ideal on a healthy cluster — but those
  * blocks DIE WITH THEIR EXECUTOR and truncated lineage means Spark
  * cannot recompute them: on a preemptible / spot-instance fleet one
  * lost node kills the whole job instead of costing a recompute.
  *
  * [[stage]] makes the trade a CONF, not a code change (the GraphX
  * `checkpoint()` trade): set `spark.graft.reliableCheckpoint=true`
  * (plus `spark.sparkContext.setCheckpointDir` to a fault-tolerant
  * path — HDFS/object store at scale) and every stage barrier becomes
  * a RELIABLE checkpoint that survives executor loss, at the price of
  * one write+read of the staged relation per barrier. The staged
  * relations are deliberately slim (signatures, ids, labels — never
  * corpus text), so the reliable write is KB–MB per stage, not a
  * corpus copy. Results are bit-identical either way (spec-pinned).
  */
object Staging {

  /** Conf key selecting reliable checkpoints for stage barriers. */
  val ConfKey = "spark.graft.reliableCheckpoint"

  /** Materialize `df` as a stage barrier under the session's
    * reliability policy: `localCheckpoint()` (default) or a reliable
    * `checkpoint()` when [[ConfKey]] is true. Both are EAGER — every
    * call site relies on the barrier pinning a partitioning or
    * stopping a double-execution at build time. */
  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get(ConfKey, "false").toBoolean) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ConfKey=true requires sparkContext.setCheckpointDir " +
          "(a fault-tolerant path — HDFS/object store at cluster scale)")
      df.checkpoint()
    } else df.localCheckpoint()
  }
}
