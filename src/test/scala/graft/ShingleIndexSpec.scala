package graft

import graft.ops.{Dedup, ShingleIndex}
import org.apache.spark.sql.functions._

/** The persisted corpus shingle artifact must reproduce the inline
  * cross-corpus near-dup build bit-for-bit, and loading must actually
  * skip the corpus pass (build-once semantics). */
class ShingleIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.documents(spark, sf).select("doc_id", "text")

  private def batch = {
    val d = corpus
    d.filter($"doc_id" % 10 === 3)
      .select(($"doc_id" + 2000000L).as("doc_id"),
        concat(lit("copy "), $"text").as("text"))
      .unionByName(d.filter($"doc_id" % 10 === 4)
        .select(($"doc_id" + 3000000L).as("doc_id"),
          translate($"text", "aeiou", "xyzwv").as("text")))
  }

  test("indexed cross-corpus near-dup is bit-identical to the inline build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shix").toString
    val (shE, dfE) = ShingleIndex.buildOrLoad(spark, corpus,
      "doc_id", "text", k = 2, s"$dir/index")
    val indexed = Dedup.incrementalNearDupWith(shE, dfE, batch,
      "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
    val inline = Dedup.incrementalNearDup(corpus, batch,
      "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
    assert(indexed.exceptAll(inline).isEmpty && inline.exceptAll(indexed).isEmpty,
      "indexed path diverges from the inline build")
    // verdicts are non-trivial on this batch: the prefix copies match
    assert(indexed.filter($"matched" === 1).count() > 0)
  }

  test("buildOrLoad loads without touching the corpus on the second call") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shix2").toString
    ShingleIndex.buildOrLoad(spark, corpus, "doc_id", "text", k = 2,
      s"$dir/index")
    // second call must resolve from the artifact alone — a corpus that
    // would EXPLODE if scanned proves shingling never ran
    val poison = corpus.withColumn("text",
      raise_error(lit("corpus pass ran on the load path")).cast("string"))
    val (shE, dfE) = ShingleIndex.buildOrLoad(spark, poison,
      "doc_id", "text", k = 2, s"$dir/index")
    assert(shE.count() > 0 && dfE.count() > 0)
    // the df rollup must agree with re-aggregating the shingle relation
    val re = shE.groupBy("sh").agg(count(lit(1)).as("ce"))
    assert(dfE.exceptAll(re).isEmpty && re.exceptAll(dfE).isEmpty)
  }
}
