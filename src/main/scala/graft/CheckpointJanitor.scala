package graft

import java.lang.ref.WeakReference
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{LogicalRDD, QueryExecution}
import org.apache.spark.sql.util.QueryExecutionListener

/** Deterministic eviction of localCheckpoint blocks.
  *
  * The dedup/similarity kernels eagerly `localCheckpoint` their
  * expensive intermediates (signatures, candidate pairs). The
  * ContextCleaner frees those blocks only after a GC proves the RDD
  * unreachable — in a back-to-back suite that lands mid-NEXT-query,
  * which BENCHLOG round 9 measured as multi-second q41d-family jitter
  * (full-suite max/min up to 5×). This janitor makes the lifetime
  * explicit instead of GC-timed:
  *
  *  - [[dropNow]] — the producer KNOWS the relation's last consumer
  *    already ran (e.g. `sh` once the candidate sliver is
  *    materialized, a label-propagation round once the next round is
  *    checkpointed): drop the blocks on the spot.
  *  - [[evictAfterConsumption]] — the last consumer is the QUERY'S OWN
  *    terminal action (count/collect/write), which hasn't run yet when
  *    the query fn returns its lazy result: register the RESULT, which
  *    registers every `LogicalRDD` inside its plan, and a
  *    [[QueryExecutionListener]] unpersists each as soon as an
  *    execution whose plan CONTAINS it completes. The returned plan
  *    stays lazy (EXPLAINS still sees the real join tree), but the
  *    blocks die with the query instead of with a GC.
  *
  * Contract: a registered checkpoint is single-consumption — after the
  * first completed execution that read it, its blocks are gone and
  * plans referencing it cannot be executed again (a localCheckpoint
  * has no lineage to recompute from). Registration therefore happens
  * at the QUERY-DEF level (NorthStar q41b/c/d/f/g), where the harness
  * contract guarantees exactly one execution per invocation (Verify
  * writes once; each Bench run re-invokes the fn, building fresh
  * checkpoints) — never inside the reusable Dedup operators, whose
  * spec callers legitimately execute one result several times.
  *
  * Registration holds the RDD only WEAKLY: if the consumer never runs,
  * the reference clears with the plan and the ContextCleaner's normal
  * GC path still applies — the janitor can only make eviction earlier,
  * never later.
  */
object CheckpointJanitor {

  private val installed = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())
  private val pending =
    new java.util.concurrent.ConcurrentHashMap[Int, WeakReference[RDD[_]]]()

  private def checkpointRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.optimizedPlan.collect { case r: LogicalRDD => r.rdd }

  /** Drop a localCheckpointed relation's blocks immediately — callers
    * assert no consumer will read it again. */
  def dropNow(df: DataFrame): Unit =
    checkpointRdds(df).foreach { r =>
      pending.remove(r.id)
      r.unpersist(blocking = false)
    }

  /** Register a localCheckpointed relation for eviction as soon as a
    * completed execution's plan contains it (see class doc for the
    * single-consumption contract). Returns `df` for chaining. */
  def evictAfterConsumption(df: DataFrame): DataFrame = {
    install(df.sparkSession)
    checkpointRdds(df).foreach(r => pending.put(r.id, new WeakReference(r)))
    df
  }

  private def install(s: SparkSession): Unit =
    if (installed.add(s)) s.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        sweep(qe)
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit =
        sweep(qe)
      private def sweep(qe: QueryExecution): Unit =
        // walk the finished plan's leaves; evict exactly the pending
        // relations this execution consumed (unrelated queries don't
        // carry their LogicalRDDs, so nothing else is touched)
        try qe.optimizedPlan.foreach {
          case r: LogicalRDD =>
            val ref = pending.remove(r.rdd.id)
            if (ref != null) Option(ref.get()).foreach(_.unpersist(blocking = false))
          case _ => ()
        } catch { case _: Throwable => () } // never break the listener bus
    })
}
