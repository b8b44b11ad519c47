package graft.tools

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× scaling probe for the two text-analysis cost models whose
  * guards were documented-but-unexercised before round 16 (verdict
  * item 9):
  *
  *  - q81 more-like-this: with a FIXED query batch (queryModulo scales
  *    with the corpus so the batch stays ~50 docs), candidate volume
  *    is Σ_term tf_q(term)·df(term) — linear in n. The df-CEILING
  *    drops hot terms from the inverted index; the probe measures
  *    candidates + wall with and without it.
  *  - q41k cross-corpus near-dup: per-batch cost bounded by batch
  *    shingles × maxDf, corpus contributes only its hashed-shingle
  *    relation.
  *
  * Usage: runMain graft.tools.TextScaleProbe <sfDir> <queryModulo> [maxDf]
  */
object TextScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qmod = args(1).toInt
    val maxDf = if (args.length > 2) args(2).toLong else 0L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val n = docs.count()
    // q81 uncapped: candidate volume + end-to-end wall
    val (candRaw, candRawWall) = timed {
      TextAnalysis.moreLikeThisStages(docs, "doc_id", "text", 5, qmod)._1.count()
    }
    val (resRaw, rawWall) = timed {
      TextAnalysis.moreLikeThis(docs, "doc_id", "text", 5, qmod).count()
    }
    println(f"[textscale] dir=$dir n=$n qmod=$qmod q81 uncapped: " +
      f"cand=$candRaw candWall=$candRawWall%.2f rows=$resRaw wall=$rawWall%.2f")
    if (maxDf > 0) {
      val (candCap, candCapWall) = timed {
        TextAnalysis.moreLikeThisStages(docs, "doc_id", "text", 5, qmod, maxDf)
          ._1.count()
      }
      val (resCap, capWall) = timed {
        TextAnalysis.moreLikeThis(docs, "doc_id", "text", 5, qmod, maxDf).count()
      }
      println(f"[textscale] q81 maxDf=$maxDf: cand=$candCap " +
        f"candWall=$candCapWall%.2f rows=$resCap wall=$capWall%.2f " +
        f"candRatio=${candCap.toDouble / math.max(candRaw, 1)}%.3f")
    }
    // Mixed-corpus ceiling demo: the driver fixture's vocabulary is
    // DEGENERATE for a df-ceiling (31 terms, all df≈0.78n — no tail),
    // so any ceiling is all-or-nothing. Real corpora have a stop-term
    // head AND a discriminative tail; reproduce that shape
    // deterministically by appending one shared-by-two term per doc
    // (uid<doc_id DIV 2>): the ceiling then drops the hot head, keeps
    // the tail, and the index join collapses to the discriminative
    // pairs — the actual web-scale deployment of the dial.
    if (maxDf > 0) {
      val mixed = docs.withColumn("text",
        concat(col("text"), lit(" uid"), (col("doc_id") / 2).cast("long")))
      val (candMix, candMixWall) = timed {
        TextAnalysis.moreLikeThisStages(mixed, "doc_id", "text", 5, qmod)._1.count()
      }
      val (candMixCap, candMixCapWall) = timed {
        TextAnalysis.moreLikeThisStages(mixed, "doc_id", "text", 5, qmod, maxDf)
          ._1.count()
      }
      val (resMixCap, mixCapWall) = timed {
        TextAnalysis.moreLikeThis(mixed, "doc_id", "text", 5, qmod, maxDf).count()
      }
      println(f"[textscale] q81 mixed-corpus: uncapped cand=$candMix " +
        f"(wall=$candMixWall%.2f) vs maxDf=$maxDf cand=$candMixCap " +
        f"(wall=$candMixCapWall%.2f) rows=$resMixCap resWall=$mixCapWall%.2f " +
        f"candRatio=${candMixCap.toDouble / math.max(candMix, 1)}%.6f")
    }
    // q41k: the q41h/q41k fresh-crawl batch at this scale
    val sevenths = docs.filter(col("doc_id") % 7 === 0)
    val batch = sevenths.withColumn("doc_id", col("doc_id") + 200000000L)
      .unionByName(sevenths.select((col("doc_id") + 300000000L).as("doc_id"),
        concat(col("text"), lit(" v2")).as("text")))
    val (verdicts, ndWall) = timed {
      Dedup.incrementalNearDup(docs, batch, "doc_id", "text").count()
    }
    println(f"[textscale] q41k: batch=${batch.count()} verdicts=$verdicts " +
      f"wall=$ndWall%.2f")
    spark.stop()
  }
}
