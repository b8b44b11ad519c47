package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Throwaway profiling harness for focused iteration (not a query path). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val names = if (args.nonEmpty) args.toSeq else Seq("q41d_dedup_ngram_jaccard")
    for (n <- names; i <- 1 to 5) {
      time(s"$n run $i") {
        println(s"$n rows = " + SparkEntry.queries(n)(spark, sfDir).count())
      }
    }
    spark.stop()
  }
}
