package graft.tools

import graft.ops.{Pq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recall-at-equal-M measurement for the k-means PQ codebooks
  * (round-17 verdict item 7): PQ/ADC recall vs the exact L2 top-k,
  * raw strided books (q88) against `iters` Lloyd-refined books (q88d),
  * same M, K, shortlist. Also reports mean subspace quantization
  * error (mean d² of each vector's subvector to its assigned
  * centroid) — the quantity Lloyd descends.
  *
  * Usage: runMain graft.tools.PqKmeansProbe <sfDir> [itersCSV]
  */
object PqKmeansProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iterss = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
                 else Seq(0, 1, 2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").localCheckpoint()
    val queries = emb.filter(col("vec_id") % 100 === 0).localCheckpoint()
    val k = 5
    // exact L2 top-k ground truth
    val c = emb.select(col("vec_id").as("vid"), col("embedding").as("ce"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("l2").asc, col("vid").asc)
    val truth = q.crossJoin(c).filter(col("qid") =!= col("vid"))
      .withColumn("l2",
        (Similarity.dotDecimal(col("ce"), col("ce")) +
          Similarity.dotDecimal(col("qe"), col("qe"))) -
          lit(2.0) * Similarity.dotDecimal(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    for (iters <- iterss) {
      val t0 = System.nanoTime()
      val cb = Pq.codebooksIter(emb, iters)
      val tTrain = (System.nanoTime() - t0) / 1e9
      // mean subspace quantization error under these books
      val codes = Pq.encode(emb, cb)
      val errs = (0 until Pq.M).map { m =>
        val cents = cb.collect { case (`m`, code, v, vn) => (code, v, vn) }
        val whenCases = cents.map { case (code, v, vn) =>
          (col(s"c$m") === code,
            (Similarity.dotDecimal(slice(col("embedding"), m * Pq.subDim + 1, Pq.subDim),
              slice(col("embedding"), m * Pq.subDim + 1, Pq.subDim)) -
              lit(2.0) * Similarity.dotDecimal(
                slice(col("embedding"), m * Pq.subDim + 1, Pq.subDim),
                array(v.map(lit(_)): _*))) + lit(vn))
        }
        whenCases.tail.foldLeft(when(whenCases.head._1, whenCases.head._2)) {
          case (acc, (p, v)) => acc.when(p, v)
        }.as(s"e$m")
      }
      val qerr = codes.join(emb.select(col("vec_id").as("vid"), col("embedding")), "vid")
        .select(errs: _*)
        .agg(avg(errs.indices.map(i => col(s"e$i")).reduce(_ + _)))
        .head().getDouble(0)
      val got = Pq.pqTopKKmeans(emb, queries, k, iters = iters)
        .select("qid", "vid").as[(Long, Long)].collect().toSet
      val recall = (got & truth).size.toDouble / truth.size
      println(f"[pqkmeans] $dir iters=$iters recall=$recall%.3f " +
        f"qerr=$qerr%.4f train=$tTrain%.1fs")
    }
    spark.stop()
  }
}
