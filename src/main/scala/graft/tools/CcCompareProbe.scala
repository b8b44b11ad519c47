package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Star-vs-hash-to-min CC decomposition on the REAL q41f (n-gram
  * Jaccard) and q41j (SemDeDup) pair relations — pairs stage isolated
  * via localCheckpoint, each CC algorithm timed on the same
  * materialized input. Usage: runMain graft.tools.CcCompareProbe <sfDir>
  */
object CcCompareProbe {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    docs.count()
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 2, maxDf = 20, threshold = 0.2)
      .select("da", "db").localCheckpoint()
    println(s"[cccompare] q41f pairs=${pairs.count()}")
    for (r <- 1 to 3) {
      val ((_, rs), ts) = timed {
        val (c, n) = Dedup.nearDupComponentsWithRounds(pairs)
        (c.count(), n)
      }
      val ((_, rh), th) = timed {
        val (c, n) = Dedup.nearDupComponentsHashToMinWithRounds(pairs)
        (c.count(), n)
      }
      println(f"[cccompare] q41f run=$r star=$ts%.2fs(${rs}r) htm=$th%.2fs(${rh}r)")
    }
    spark.stop()
  }
}
