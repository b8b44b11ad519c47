package graft.tools

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Band-collision volume of the portable MinHash family across the
  * SF decade (round-17 verdict item 2): candidate pairs from the 8×4
  * banding, split into TRUE near-dups (est_jaccard ≥ threshold) and
  * SPURIOUS collisions (est below it). The v1 affine-lane family's
  * correlated lanes produced bucket pile-ups; v2's law is that
  * spurious volume stays a small multiple of true volume as the
  * corpus scales. Usage: runMain graft.tools.BandCollisionProbe
  */
object BandCollisionProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val n = docs.count()
      val sigs = Dedup.minHashSignaturesPortable(docs, "doc_id", "text", 2, 32)
      val cands = Dedup.minHashNearDupsPortable(sigs, bands = 8, rowsPer = 4,
        threshold = 0.0).localCheckpoint()
      val total = cands.count()
      val trueDups = cands.filter(col("est_jaccard") >= 0.5).count()
      val low = cands.filter(col("est_jaccard") < 0.25).count()
      println(s"[bandcollision] $dir docs=$n candidates=$total " +
        s"true(est>=0.5)=$trueDups mid=${total - trueDups - low} low(est<0.25)=$low")
      graft.CheckpointJanitor.dropNow(cands)
    }
    spark.stop()
  }
}
