package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Concurrency contract of [[CheckpointJanitor]] (the bucketedJoinInput
  * precedent): two threads running janitor-registered queries on the
  * SAME session must never unpersist a checkpoint the other thread's
  * in-flight plan still needs — the listener sweep walks only the
  * COMPLETED execution's own `LogicalRDD` leaves, so eviction is keyed
  * to the consuming plan, not to "whatever is pending". And `dropNow`
  * of an already-swept relation must be a no-op.
  *
  * The listener fires on the async listener bus, so block state is
  * asserted with a bounded `eventually` poll, never a sleep-free read.
  */
class CheckpointJanitorSpec extends SparkSpec {
  import spark.implicits._

  private def checkpointRdd(df: DataFrame): RDD[_] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.head

  private def eventually[A](timeoutMs: Long = 30000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(50)
    }
    cond
  }

  private def freshCheckpointed(tag: Int): DataFrame =
    spark.range(0, 1000).select(($"id" + tag).as("v")).localCheckpoint()

  test("sweep evicts only the completed plan's checkpoints, not a concurrent one") {
    val a = CheckpointJanitor.evictAfterConsumption(freshCheckpointed(1))
    val b = CheckpointJanitor.evictAfterConsumption(freshCheckpointed(2))
    val (ra, rb) = (checkpointRdd(a), checkpointRdd(b))
    assert(ra.getStorageLevel != StorageLevel.NONE)
    assert(rb.getStorageLevel != StorageLevel.NONE)
    // consume ONLY a — the sweep of a's execution must leave b alone
    assert(a.count() == 1000)
    assert(eventually()(ra.getStorageLevel == StorageLevel.NONE),
      "consumed checkpoint a was not evicted")
    assert(rb.getStorageLevel != StorageLevel.NONE,
      "sweep of a's execution evicted b's un-consumed checkpoint")
    // b still executes correctly afterwards, then evicts
    assert(b.count() == 1000)
    assert(eventually()(rb.getStorageLevel == StorageLevel.NONE),
      "consumed checkpoint b was not evicted")
  }

  test("dropNow of an already-swept relation is a no-op") {
    val df = CheckpointJanitor.evictAfterConsumption(freshCheckpointed(3))
    val r = checkpointRdd(df)
    assert(df.count() == 1000)
    assert(eventually()(r.getStorageLevel == StorageLevel.NONE))
    // both the listener already swept it and the blocks are gone:
    // dropNow must neither throw nor resurrect anything
    CheckpointJanitor.dropNow(df)
    CheckpointJanitor.dropNow(df) // and stays idempotent
    assert(r.getStorageLevel == StorageLevel.NONE)
  }

  test("two threads register+consume concurrently without cross-eviction") {
    // Each thread builds its own registered checkpoint, then consumes
    // it TWICE with a barrier in between arranged so the other
    // thread's sweep has fired before the second read. If a sweep ever
    // evicted a foreign pending checkpoint, the second read of a
    // localCheckpoint (no lineage to recompute from) would throw.
    val iters = 8
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { t =>
      new Thread(() => {
        try {
          for (i <- 0 until iters) {
            // NOT registered: a plain checkpoint consumed twice across
            // the other thread's sweeps — must survive both reads
            val unregistered = freshCheckpointed(100 + t * 1000 + i)
            val registered = CheckpointJanitor.evictAfterConsumption(
              freshCheckpointed(t * 1000 + i))
            assert(unregistered.count() == 1000)
            assert(registered.count() == 1000)
            // the other thread's sweeps race with this window
            Thread.sleep(10)
            assert(unregistered.count() == 1000)
            CheckpointJanitor.dropNow(unregistered)
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent janitor use failed: ${errors.peek()}")
  }
}
