package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query job/stage profiler for the optimization rounds (guide §1:
  * measure first). For each named query it runs the declared fn
  * `runs` times (after one untimed warmup) and prints, per run, every
  * Spark JOB with its wall time, stage count, task count, and shuffle
  * read/write bytes — the breakdown that says whether a query's wall
  * is one expensive stage, many sequential barrier jobs, or scheduler
  * overhead. Optionally dumps `explain("formatted")` to a file per
  * query (the plans/r21 evidence artifacts).
  *
  * Usage:
  *   scripts/qprof.sh <sfDir> <planOutDirOrNONE> <runs> q41o_... q81_...
  */
object QProf {

  private final case class JobRec(id: Int, desc: String, wallMs: Long,
      stages: Int, tasks: Int, shufRead: Long, shufWrite: Long,
      taskTimeMs: Long)

  private final class Collector extends SparkListener {
    val jobs = new mutable.LinkedHashMap[Int, (Long, String, mutable.Set[Int])]
    val done = mutable.ArrayBuffer.empty[JobRec]
    // stageId -> (tasks, shufRead, shufWrite, taskTime)
    val stageAgg = new mutable.HashMap[Int, (Int, Long, Long, Long)]
    // stageId -> (deserTime, gcTime, cpuTimeNs, resultSerTime)
    val stageAgg2 = new mutable.HashMap[Int, (Long, Long, Long, Long)]
    // stageId -> name (callsite) for attribution
    val stageName = new mutable.HashMap[Int, String]

    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
      synchronized { stageName(e.stageInfo.stageId) = e.stageInfo.name }

    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      jobs(e.jobId) = (e.time, desc, mutable.Set(e.stageIds: _*))
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      val m = e.taskMetrics
      if (m != null) {
        val (t, r, w, tt) = stageAgg.getOrElse(e.stageId, (0, 0L, 0L, 0L))
        stageAgg(e.stageId) = (t + 1,
          r + m.shuffleReadMetrics.totalBytesRead,
          w + m.shuffleWriteMetrics.bytesWritten,
          tt + m.executorRunTime)
        val (d, g, c, rs) = stageAgg2.getOrElse(e.stageId, (0L, 0L, 0L, 0L))
        stageAgg2(e.stageId) = (d + m.executorDeserializeTime,
          g + m.jvmGCTime, c + m.executorCpuTime, rs + m.resultSerializationTime)
      }
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobs.remove(e.jobId).foreach { case (t0, desc, stageIds) =>
        var tasks = 0; var r = 0L; var w = 0L; var tt = 0L
        stageIds.foreach { sid =>
          stageAgg.get(sid).foreach { case (t2, r2, w2, tt2) =>
            tasks += t2; r += r2; w += w2; tt += tt2 }
        }
        done += JobRec(e.jobId, desc, e.time - t0, stageIds.size, tasks,
          r, w, tt)
      }
    }
    def reset(): Unit = synchronized { done.clear(); stageAgg.clear(); stageAgg2.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val planDir = args(1)
    val runs = args(2).toInt
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach(n => graft.Tables.load(spark, sfDir, n).count())
    val col = new Collector
    spark.sparkContext.addSparkListener(col)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warmup (untimed): builds memoized artifacts, warms codegen
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"[qprof] $name warmup failed: $e") }
      System.gc()
      if (planDir != "NONE") {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(planDir, s"$name.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, plan)
      }
      (1 to runs).foreach { r =>
        col.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener bus is async — poll until the job list stops
        // growing (round-22 advice fix: a fixed sleep undercounted
        // jobs on loaded runs), bounded at 2 s
        var lastN = -1; var stable = 0; var waited = 0
        while (stable < 3 && waited < 2000) {
          Thread.sleep(50); waited += 50
          val n = col.synchronized(col.done.size)
          if (n == lastN) stable += 1 else { stable = 0; lastN = n }
        }
        val recs = col.synchronized { col.done.toVector }
        println(f"== $name run=$r wall=$wall%.3f s jobs=${recs.size} " +
          f"jobWallSum=${recs.map(_.wallMs).sum / 1e3}%.3f s")
        recs.foreach { j =>
          println(f"   job=${j.id}%4d ${j.wallMs}%6d ms stages=${j.stages}%2d " +
            f"tasks=${j.tasks}%4d taskTime=${j.taskTimeMs}%7d ms " +
            f"shufR=${j.shufRead / 1024}%8d KiB shufW=${j.shufWrite / 1024}%8d KiB " +
            (if (j.desc.nonEmpty) s" [${j.desc.take(60)}]" else ""))
        }
        if (r == runs) {
          // top stages by task time, with callsite, for attribution
          val top = col.synchronized {
            col.stageAgg.toSeq.sortBy(-_._2._4).take(12).map {
              case (sid, (t, sr, sw, tt)) =>
                (sid, t, tt, sr, sw, col.stageName.getOrElse(sid, "?"))
            }
          }
          println("   -- top stages by taskTime (last run) --")
          top.foreach { case (sid, t, tt, sr, sw, n) =>
            val (d, g, c, rs) = col.synchronized {
              col.stageAgg2.getOrElse(sid, (0L, 0L, 0L, 0L)) }
            println(f"   stage=$sid%5d tasks=$t%4d taskTime=$tt%7d ms " +
              f"cpu=${c / 1000000}%7d ms deser=$d%5d gc=$g%5d rs=$rs%4d " +
              f"shufR=${sr / 1024}%7d KiB shufW=${sw / 1024}%7d KiB  $n")
          }
        }
        System.gc()
      }
      if (sys.env.getOrElse("QPROF_OPMETRICS", "0") == "1") {
        // one more run, then walk the executed plan printing per-node
        // SQL metrics (codegen/sort/agg/join times) — per-OPERATOR
        // attribution of the CPU the stage view can't localize
        val df = fn(spark, sfDir)
        df.count()
        def walk(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
          val ms = p.metrics.map { case (k, m) =>
            s"$k=${m.value}" }.filter(!_.endsWith("=0")).take(6).mkString(" ")
          println(("  " * d) + p.nodeName + "  " + ms)
          p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              walk(a.executedPlan, d + 1)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(q.plan, d + 1)
            case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
              println(("  " * (d + 1)) + "[reused " + r.child.nodeName + "]")
            case _ => p.children.foreach(walk(_, d + 1))
          }
        }
        walk(df.queryExecution.executedPlan, 0)
      }
    }
    spark.stop()
  }
}
