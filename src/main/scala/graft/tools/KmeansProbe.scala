package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lloyd-iteration sweep for the IVF quantizer (round-16 verdict item
  * 2): recall@5 vs exact cosine at EQUAL nprobe for iters = 1 (the
  * q42d one-step quantizer) vs deeper fixed-iteration k-means
  * (q42f), plus per-cell occupancy spread — the evidence that extra
  * build passes buy tighter cells.
  *
  * Usage: runMain graft.tools.KmeansProbe <sfDir> <queryIdModulus> [iters CSV]
  */
object KmeansProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qmod = args(1).toLong
    val itersList = if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq
                    else Seq(1, 2, 3, 5)
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
    val exact5 = Similarity.cosineTopK(emb, queries, k = 5)
      .select("qid", "vid").localCheckpoint()
    println(s"[kmeansprobe] dir=$dir n=$n queries=$nQ iters=${itersList.mkString(",")}")
    for (it <- itersList) {
      val (cents, buildWall) = timed(Similarity.ivfCentroidsIter(emb, 16, it))
      val occ = Similarity.ivfAssign(emb, cents)
        .groupBy("cell").count().select("count")
        .collect().map(_.getLong(0))
      val (hits, wall) = timed {
        Similarity.ivfTopKWith(cents, emb, queries, k = 5, nprobe = 4)
          .select("qid", "vid").intersect(exact5).count()
      }
      println(f"[kmeansprobe] iters=$it%-2d recall=${hits.toDouble / (nQ * 5)}%.3f " +
        f"wall=$wall%.2f buildWall=$buildWall%.2f cells=${occ.length} " +
        f"occMax=${occ.max} occMin=${occ.min} " +
        f"occCv=${ // coefficient of variation of cell occupancy
          val m = occ.sum.toDouble / occ.length
          math.sqrt(occ.map(o => (o - m) * (o - m)).sum / occ.length) / m}%.3f")
    }
    spark.stop()
  }
}
