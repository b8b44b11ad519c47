package graft.tools

import graft.ops.{Pq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** nprobe operating-point sweep for the IVFPQ composition (q88b) —
  * the round-16 recall-dial measurement (verdict item 1: default
  * recall 0.550/0.496 sits below the engine's own ≥0.6 band). For
  * each nprobe in the sweep list, measures IVFPQ recall vs the exact
  * L2 top-5 plus the IVF-with-exact-rerank recall at the SAME nprobe
  * (the coarse-probe ceiling IVFPQ cannot exceed), and the query
  * wall. The chosen default derives from this table the way
  * `Pq.depth()` derives the shortlist: smallest nprobe whose measured
  * recall clears the band at 1× AND 10×.
  *
  * Usage: runMain graft.tools.IvfpqProbe <sfDir> <queryIdModulus> [nprobes CSV]
  */
object IvfpqProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qmod = args(1).toLong
    val nprobes = if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq
                  else Seq(4, 6, 8, 10)
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
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") % qmod === 0).localCheckpoint()
    val nQ = queries.count()
    // exact L2 truth set (PQ approximates L2, not cosine)
    val exactL2 = {
      val c = emb.select(col("vec_id").as("vid"), col("embedding").as("ce"))
        .withColumn("cnorm", Similarity.normSqDecimal(col("ce")))
      val qq = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .withColumn("qnorm", Similarity.normSqDecimal(col("qe")))
      val d2 = (col("cnorm") + col("qnorm")) -
        (lit(2.0) * Similarity.dotDecimal(col("qe"), col("ce")))
      val w = Window.partitionBy("qid").orderBy(d2.asc, col("vid"))
      c.join(broadcast(qq), col("qid") =!= col("vid"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select("qid", "vid").localCheckpoint()
    }
    println(s"[ivfpqprobe] dir=$dir n=$n queries=$nQ sweep=${nprobes.mkString(",")}")
    for (np <- nprobes) {
      val (ivfpqHits, ivfpqWall) = timed {
        Pq.ivfpqTopK(emb, queries, k = 5, cells = 16, nprobe = np)
          .select("qid", "vid").intersect(exactL2).count()
      }
      val (resHits, resWall) = timed {
        Pq.ivfpqResidualTopK(emb, queries, k = 5, cells = 16, nprobe = np)
          .select("qid", "vid").intersect(exactL2).count()
      }
      // coarse ceiling: IVF cells at same nprobe, exact L2 rerank of
      // ALL candidates in probed cells (what a perfect ADC would get)
      val (ceilHits, ceilWall) = timed {
        val cents = Similarity.ivfCentroids(emb, 16)
        val assigned = Similarity.ivfAssign(emb, cents)
        val probe = Similarity.probeCells(cents, queries, np).select("qid", "cell")
        val cand = probe.join(assigned, "cell")
          .filter(col("qid") =!= col("vid")).select("qid", "vid").distinct()
        val c = emb.select(col("vec_id").as("vid"), col("embedding").as("ce"))
          .withColumn("cnorm", Similarity.normSqDecimal(col("ce")))
        val qq = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
          .withColumn("qnorm", Similarity.normSqDecimal(col("qe")))
        val d2 = (col("cnorm") + col("qnorm")) -
          (lit(2.0) * Similarity.dotDecimal(col("qe"), col("ce")))
        val w = Window.partitionBy("qid").orderBy(d2.asc, col("vid"))
        cand.join(c, "vid").join(broadcast(qq), "qid")
          .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
          .select("qid", "vid").intersect(exactL2).count()
      }
      println(f"[ivfpqprobe] nprobe=$np%-2d ivfpqRecall=${ivfpqHits.toDouble / (nQ * 5)}%.3f " +
        f"ivfpqWall=$ivfpqWall%.2f residualRecall=${resHits.toDouble / (nQ * 5)}%.3f " +
        f"residualWall=$resWall%.2f ceilRecall=${ceilHits.toDouble / (nQ * 5)}%.3f " +
        f"ceilWall=$ceilWall%.2f")
    }
    spark.stop()
  }
}
