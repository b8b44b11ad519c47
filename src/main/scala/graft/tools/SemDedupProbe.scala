package graft.tools

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost decomposition of q41j (SemDeDup): times the LSH-bucketed
  * cosine pair stage, the pointer-jumping CC stage, and the final
  * verdict join separately — adjudicating whether the suite's top
  * wall is dominated by real per-pair work or by the CC driver
  * loop's fixed per-round job costs.
  *
  * Usage: runMain graft.tools.SemDedupProbe <sfDir>
  */
object SemDedupProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    emb.count() // warm the scan

    for (r <- 1 to 3) {
      val (pairs, tPairs) = timed {
        Similarity.cosineNearDupsAuto(emb,
            planesPerTable = 4, tables = 4, threshold = 0.35)
          .select($"vec_a".as("da"), $"vec_b".as("db"))
          .localCheckpoint() // materialize: isolates pair-stage cost
      }
      val nPairs = pairs.count()
      val ((comp, rounds), tCc) = timed {
        val (c, n) = Dedup.nearDupComponentsWithRounds(pairs)
        (c.localCheckpoint(), n)
      }
      val (nOut, tJoin) = timed {
        val comp0 = comp.select($"doc".as("vec_id"), $"comp")
        val full = emb.select($"vec_id")
          .join(comp0, Seq("vec_id"), "left_outer")
          .select($"vec_id", coalesce($"comp", $"vec_id").as("comp"))
        val sizes = full.groupBy("comp").agg(count(lit(1)).as("comp_size"))
        full.join(sizes, "comp").count()
      }
      println(f"[semdedupprobe] round=$r pairs=$tPairs%.2fs($nPairs) " +
        f"cc=$tCc%.2fs(${rounds}rounds) verdict=$tJoin%.2fs($nOut)")
    }
    spark.stop()
  }
}
