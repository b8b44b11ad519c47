package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Dedup operator semantics: exact keeps the smallest id; MinHash/LSH
  * and SimHash must surface every true duplicate pair (identical
  * texts → identical signatures → guaranteed candidates). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def dupCorpus = {
    val d = Tables.documents(spark, sf).select("doc_id", "text")
    d.unionByName(d.filter($"doc_id" % 10 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000))
  }

  test("exact dedup keeps the smallest id per text") {
    val out = Dedup.exact(dupCorpus, "doc_id", "text")
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter($"doc_id" >= 1000000).count() == 0) // originals kept
  }

  test("minhash LSH finds every identical pair") {
    val sigs = Dedup.minHashSignatures(
      Dedup.wordShingles(dupCorpus, "doc_id", "text", 2), 32)
    val pairs = Dedup.minHashNearDups(sigs, bands = 8, rowsPer = 4, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = Tables.documents(spark, sf).filter($"doc_id" % 10 === 0)
      .select($"doc_id").as[Long].collect()
      .map(id => (id, id + 1000000)).toSet
    assert(expected.subsetOf(pairs), s"missing: ${expected -- pairs}")
  }

  test("fused minhash/simhash kernels are bit-identical to the composed forms") {
    val composedSigs = Dedup.minHashSignatures(
      Dedup.wordShingles(dupCorpus, "doc_id", "text", 2), 32)
    val fusedSigs = Dedup.minHashSignaturesFast(dupCorpus, "doc_id", "text", 2, 32)
    assert(fusedSigs.exceptAll(composedSigs).isEmpty &&
      composedSigs.exceptAll(fusedSigs).isEmpty,
      "MinHashSigs diverges from minHashSignatures∘wordShingles")
    val composedSim = Dedup.simHash(dupCorpus, "doc_id", "text")
    val fusedSim = Dedup.simHashFast(dupCorpus, "doc_id", "text")
    assert(fusedSim.exceptAll(composedSim).isEmpty &&
      composedSim.exceptAll(fusedSim).isEmpty,
      "SimHash64 diverges from simhash_agg over exploded tokens")
  }

  test("simhash: identical texts at distance 0, all true pairs found") {
    val pairs = Dedup.simHashNearDups(
      Dedup.simHash(dupCorpus, "doc_id", "text"), maxHamming = 3)
    val exact = pairs.filter($"doc_b" === $"doc_a" + 1000000)
    assert(exact.filter($"dist" =!= 0).count() == 0)
    val expected = Tables.documents(spark, sf).filter($"doc_id" % 10 === 0).count()
    assert(exact.count() == expected)
  }
}
