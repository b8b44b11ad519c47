package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Per-round changed-count trace of the q41j CC loop on the real
  * SemDeDup pair graph — diagnosing why the measured round count
  * exceeds the O(log diameter) expectation. */
object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val pairs = graft.ops.Similarity.cosineNearDupsAuto(emb,
        planesPerTable = 4, tables = 4, threshold = 0.35)
      .select($"vec_a".as("da"), $"vec_b".as("db")).localCheckpoint()
    val edges = pairs.select($"da".as("a"), $"db".as("b"))
      .unionByName(pairs.select($"db".as("a"), $"da".as("b")))
      .localCheckpoint()
    println(s"[ccprobe] pairs=${pairs.count()} nodes=${edges.select("a").distinct().count()}")
    var labels = edges.groupBy($"a").agg(min($"b").as("nmin"))
      .select($"a".as("doc"), least($"a", $"nmin").as("comp")).localCheckpoint()
    var changed = 1L; var it = 0
    while (changed > 0 && it < 25) {
      val viaN = edges.join(labels.select($"doc".as("b"), $"comp"), "b")
        .select($"a".as("doc"), $"comp")
      val prelim = viaN.unionByName(labels).groupBy("doc").agg(min("comp").as("comp"))
      var j = prelim
      for (_ <- 1 to 4) {
        j = j.join(j.select($"doc".as("comp"), $"comp".as("jump")), Seq("comp"), "left")
          .select($"doc", least($"comp", coalesce($"jump", $"comp")).as("comp"))
      }
      val next = j.localCheckpoint()
      changed = next.join(labels.select($"doc", $"comp".as("prev")), "doc")
        .filter($"comp" =!= $"prev").count()
      it += 1
      println(s"[ccprobe] round=$it changed=$changed")
      labels = next
    }
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("n")).orderBy($"n".desc)
    println("[ccprobe] top components: " + sizes.limit(5).collect().mkString(", "))
    spark.stop()
  }
}
