package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-validation probe for the ANN paths (SCALING.md): measures
  * recall vs exact brute force, candidate volume, and wall for the
  * corpus-sized entry points (`annTopKScaled`, `ivfTopK`) on a given
  * embeddings table.
  *
  * Usage: runMain graft.tools.AnnProbe <sfDir> <queryIdModulus> [tables]
  */
object AnnProbe {

  def main(args: Array[String]): Unit = {
    // tables <= 0 (and the no-arg default) = the production derivation
    // (Similarity.tablesForCorpus); a positive value pins it for sweeps
    val (dir, qmodS, tables) = args match {
      case Array(d, q)    => (d, q, 0)
      case Array(d, q, t) => (d, q, t.toInt)
    }
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
    val queries = emb.filter(col("vec_id") % qmodS.toLong === 0).localCheckpoint()
    val nQ = queries.count()
    val exact5 = Similarity.cosineTopK(emb, queries, k = 5)
      .select("qid", "vid").localCheckpoint()
    val (annHits, annWall) = timed {
      Similarity.annTopKScaled(emb, queries, k = 5, tables = tables)
        .select("qid", "vid").intersect(exact5).count()
    }
    val (ivfHits, ivfWall) = timed {
      Similarity.ivfTopK(emb, queries, k = 5, cells = 16, nprobe = 4)
        .select("qid", "vid").intersect(exact5).count()
    }
    val planes = Similarity.planesForCorpus(n)
    val (cand, candWall) = timed {
      Similarity.nearDupCandidates(emb, planes, tables = 4).count()
    }
    val effTables = if (tables > 0) tables else Similarity.tablesForCorpus(n)
    println(f"[annprobe] dir=$dir n=$n queries=$nQ planes=$planes tables=$effTables " +
      f"annRecall=${annHits.toDouble / (nQ * 5)}%.3f annWall=$annWall%.2f " +
      f"ivfRecall=${ivfHits.toDouble / (nQ * 5)}%.3f ivfWall=$ivfWall%.2f " +
      f"candidates=$cand candWall=$candWall%.2f")
    spark.stop()
  }
}
