package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measures what the bucketed shingle artifact (q41m) buys in the
  * big-batch regime: the same cross-corpus near-dup pipeline run over
  * (a) the flat artifact with broadcast probes (q41l's bench-scale
  * plan), (b) the flat artifact with MERGE-hinted probes (the plan a
  * too-big-to-broadcast rare-shingle relation forces — the corpus
  * relation re-shuffles per batch), and (c) the bucketed artifact with
  * the same hints (q41m — corpus side exchange-free). Reports wall
  * seconds and total shuffle WRITE bytes per variant (a stage-level
  * listener sum), which is the number that scales with corpus size in
  * (b) but with batch size in (c). SCALING.md records the output.
  *
  * Run: sbt "runMain graft.tools.ShingleBucketProbe <corpusDir> [batchDir]"
  * — a batchDir different from corpusDir pins the LAW: corpus 10× with
  * the batch FIXED isolates which variant's shuffle volume grows with
  * corpus size (flat) vs batch size (bucketed).
  */
object ShingleBucketProbe {

  private final class ShuffleBytes extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val read = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      read.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
    }
    def reset(): Unit = { bytes.set(0L); read.set(0L) }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchDir = if (args.length > 1) args(1) else dir
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val corpus = graft.Tables.documents(spark, dir).select("doc_id", "text")
    // the EXACT q41k/q41l/q41m workload — reuse the fixture so the
    // probe can never drift from what SCALING.md attributes to it
    val batch = graft.queries.NorthStar.nearDupBatch(spark, batchDir)

    // build both artifacts up front (build cost is NOT what the probe
    // measures — both layouts pay one corpus pass at build time)
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_shbp").toString + "/index"
    val (shFlat, dfFlat) = graft.ops.ShingleIndex.buildOrLoad(
      spark, corpus, "doc_id", "text", k = 2, scratch)
    val (shBkSh, shBkDoc, dfBk) = graft.ops.ShingleIndex.buildOrLoadBucketed(
      spark, corpus, "doc_id", "text", k = 2,
      table = graft.ops.ShingleIndex.tableFor("shingle_probe", dir))

    val listener = new ShuffleBytes
    spark.sparkContext.addSparkListener(listener)

    def measure(tag: String)(verdicts: => org.apache.spark.sql.DataFrame): Unit = {
      // one untimed warmup so JIT/codegen state is uniform across tags
      verdicts.count()
      System.gc()
      Thread.sleep(1000) // let straggling stage events from the warmup drain
      listener.reset()
      val t0 = System.nanoTime()
      val n = verdicts.filter($"matched" === 1).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // drain this run's stage events before reading
      println(f"[shbp] $tag%-18s wall=$wall%6.2fs shuffleWrite=${listener.bytes.get / 1048576.0}%8.2f MiB matched=$n")
    }
    def run(tag: String,
        shE: org.apache.spark.sql.DataFrame,
        shEDoc: org.apache.spark.sql.DataFrame,
        dfE: org.apache.spark.sql.DataFrame): Unit =
      measure(tag)(graft.ops.Dedup.incrementalNearDupWith(shE, shEDoc, dfE,
        batch, "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2))

    run("flat+broadcast", shFlat, shFlat, dfFlat)
    run("flat+smj", shFlat.hint("merge"), shFlat.hint("merge"),
      dfFlat.hint("merge"))
    run("bucketed+smj", shBkSh.hint("merge"), shBkDoc.hint("merge"),
      dfBk.hint("merge"))

    // ---- the LSM lifecycle (q41o): the law must SURVIVE an append ----
    // append a FIXED batch-sized delta (novel ids), then probe the
    // 2-segment artifact with the same hints: per-batch shuffle volume
    // must stay batch-sized (the q41m law), and the APPEND itself must
    // cost delta-shingling + a rollup-sized df merge — fixed delta at
    // growing corpus isolates any corpus-proportional term
    val lsmRoot = java.nio.file.Files
      .createTempDirectory("graft_shbp_lsm").toString + "/lsm"
    val lsmBase = graft.ops.ShingleIndex.tableFor("shingle_probe_lsm", dir)
    graft.ops.ShingleIndex.saveLsm(spark, corpus, "doc_id", "text", 2,
      lsmRoot, lsmBase)
    val delta = graft.queries.NorthStar.nearDupBatch(spark, batchDir)
      .filter($"doc_id" >= 3000000L) // the novel (vowel-swapped) half
    System.gc(); Thread.sleep(1000)
    listener.reset()
    val tA = System.nanoTime()
    graft.ops.ShingleIndex.appendLsm(spark, delta, "doc_id", "text", 2,
      lsmRoot, lsmBase)
    val wallA = (System.nanoTime() - tA) / 1e9
    Thread.sleep(1000)
    println(f"[shbp] lsm-append         wall=$wallA%6.2fs shuffleWrite=${listener.bytes.get / 1048576.0}%8.2f MiB read=${listener.read.get / 1048576.0}%8.2f MiB (fixed delta; the manifest-summary guard makes READ delta-sized too — round-19 verdict item 4)")
    def probeLsm(): Unit = {
      val (segs, dfLsm) = graft.ops.ShingleIndex.loadLsm(spark, lsmRoot)
      measure(s"lsm+smj seg=${segs.size}")(
        graft.ops.Dedup.incrementalNearDupSegmented(
          segs.map { case (sh, doc) => (sh.hint("merge"), doc.hint("merge")) },
          dfLsm.hint("merge"), batch, "doc_id", "text",
          k = 2, maxDf = 20, threshold = 0.2))
    }
    probeLsm()

    // segment-count law: probe cost grows with segment count (one
    // probe-join pair per segment — the LSM read tax), and compaction
    // resets it. Append three more disjoint novel deltas → 5 segments,
    // probe, compact → 1 segment, probe again.
    val moreDeltas = Seq(
      ("aeiou", "eioua", 6000000L), ("aeiou", "iouae", 7000000L),
      ("aeiou", "ouaei", 8000000L))
    moreDeltas.foreach { case (from, to, off) =>
      val d = graft.Tables.documents(spark, batchDir)
        .filter($"doc_id" % 10 === 4)
        .select(($"doc_id" + off).as("doc_id"),
          translate($"text", from, to).as("text"))
      graft.ops.ShingleIndex.appendLsm(spark, d, "doc_id", "text", 2,
        lsmRoot, lsmBase)
    }
    probeLsm()
    System.gc(); Thread.sleep(1000)
    listener.reset()
    val tC = System.nanoTime()
    graft.ops.ShingleIndex.compactLsm(spark, lsmRoot, lsmBase)
    val wallC = (System.nanoTime() - tC) / 1e9
    Thread.sleep(1000)
    println(f"[shbp] lsm-compact        wall=$wallC%6.2fs shuffleWrite=${listener.bytes.get / 1048576.0}%8.2f MiB (corpus-sized rewrite, paid once per cadence)")
    probeLsm()
    spark.stop()
  }
}
