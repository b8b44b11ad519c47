package graft

import graft.ops.{IvfIndex, Similarity}

/** IVF index lifecycle: the persisted coarse quantizer must reproduce
  * the inline build bit-exactly, and the probe path over a LOADED
  * index must return byte-identical answers to the rebuild-per-query
  * form — the split that makes IVF an actual index at 100 TB. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  test("save/load round-trips centroids bit-exactly; loaded probe == inline build") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.ivfCentroids(emb, cells = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/index"
    IvfIndex.save(spark, cents, dir)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.map(_._1) == cents.map(_._1), "cell ids diverged")
    cents.zip(loaded).foreach { case ((c0, v0, n0), (c1, v1, n1)) =>
      assert(c0 == c1)
      assert(java.util.Arrays.equals(v0, v1), s"cell $c0 centroid not bit-exact")
      assert(n0 == n1, s"cell $c0 stored norm diverged")
    }
    val q = emb.filter($"vec_id" % 100 === 0)
    val inline = Similarity.ivfTopK(emb, q, k = 5, cells = 16, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    val probed = Similarity.ivfTopKWith(loaded, emb, q, k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(probed == inline, "loaded-index probe diverges from inline build")
  }

  test("buildOrLoad builds once, then loads without rebuilding") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf2").toString + "/index"
    val built = IvfIndex.buildOrLoad(spark, emb, cells = 8, path = dir)
    // capture the data file's mtime; a second call must LOAD, not rewrite
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty, "no parquet written")
    val mtimes = files.map(f => f.getName -> f.lastModified()).toMap
    val again = IvfIndex.buildOrLoad(spark, emb, cells = 8, path = dir)
    val filesAfter = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(filesAfter.map(f => f.getName -> f.lastModified()).toMap == mtimes,
      "second buildOrLoad rewrote the index instead of loading it")
    assert(again.map(_._1) == built.map(_._1))
    built.zip(again).foreach { case ((_, v0, n0), (_, v1, n1)) =>
      assert(java.util.Arrays.equals(v0, v1) && n0 == n1)
    }
  }
}
