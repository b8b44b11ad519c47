package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, SparkEntry}
import graft.ops.Dedup

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
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, sfDir)
    time("docs count")(println("docs = " + docs.count()))
    val sh0 = Dedup.wordShingles(docs, "doc_id", "text", 2)
    time("shingles count")(println("shingles = " + sh0.count()))
    val sh = time("checkpoint hashed") {
      sh0.select($"doc", xxhash64($"shingle").as("sh")).localCheckpoint()
    }
    val docFreq = sh.groupBy("sh").agg(count(lit(1)).as("c"))
    val rare = sh.join(docFreq.filter($"c" <= 20), "sh")
    time("rare count")(println("rare = " + rare.count()))
    val cand = rare.as("a").join(rare.as("b"), $"a.sh" === $"b.sh" &&
        $"a.doc" < $"b.doc")
      .select($"a.doc".as("da"), $"b.doc".as("db")).distinct()
    time("cand count")(println("cand = " + cand.count()))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n"))
    val common = cand
      .join(sh.as("s1"), $"s1.doc" === $"da")
      .join(sh.as("s2"), $"s2.doc" === $"db" && $"s2.sh" === $"s1.sh")
      .groupBy("da", "db").agg(count(lit(1)).as("cm"))
    time("common count")(println("common = " + common.count()))
    time("full q41d") {
      println("q41d rows = " +
        SparkEntry.queries("q41d_dedup_ngram_jaccard")(spark, sfDir).count())
    }
    time("full q41d again") {
      println("q41d rows = " +
        SparkEntry.queries("q41d_dedup_ngram_jaccard")(spark, sfDir).count())
    }
    spark.stop()
  }
}
