package graft

import graft.ops.{Compaction, StagedRefresh}

/** Small-file compaction (q94's operator): the rewrite must collapse
  * the file count to ceil(bytes/target), move every row unchanged,
  * stay idempotent, and ride the atomic swap (the fragmented
  * predecessor survives one cycle for in-flight readers). */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_cmpspec").toString + "/t"

  private def genDirs(root: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(_.getPath.getName).filter(_.startsWith("gen-")).toSet
  }

  test("compaction collapses a fragmented generation to the sized file count") {
    val root = freshRoot()
    StagedRefresh.refresh((1 to 10000).toDF("v").repartition(32), root)
    val (_, before, after, bytes) =
      Compaction.compact(spark, root, targetBytes = 64L * 1024 * 1024)
    assert(before == 32, s"fragmented load should have 32 files, had $before")
    val expected = math.max(1L, (bytes + 64L * 1024 * 1024 - 1) / (64L * 1024 * 1024)).toInt
    assert(after == expected, s"expected $expected compacted files, got $after")
    assert(after < before)
  }

  test("compaction moves every row and invents none") {
    val root = freshRoot()
    StagedRefresh.refresh((1 to 5000).toDF("v").repartition(16), root)
    Compaction.compact(spark, root, targetBytes = 64L * 1024 * 1024)
    val got = StagedRefresh.readCurrent(spark, root).as[Int].collect().sorted
    assert(got.toSeq == (1 to 5000), "compacted data differs from the source")
  }

  test("compaction is idempotent: re-compacting holds the file count") {
    val root = freshRoot()
    StagedRefresh.refresh((1 to 2000).toDF("v").repartition(8), root)
    val (_, _, after1, _) = Compaction.compact(spark, root, 64L * 1024 * 1024)
    val (_, before2, after2, _) = Compaction.compact(spark, root, 64L * 1024 * 1024)
    assert(before2 == after1 && after2 == after1,
      s"re-compaction changed layout: $after1 -> $after2")
  }

  test("compaction is a swap: the fragmented predecessor survives one cycle") {
    val root = freshRoot()
    StagedRefresh.refresh((1 to 100).toDF("v").repartition(4), root)
    val fragGen = StagedRefresh.currentGen(spark, root).get
    val (newGen, _, _, _) = Compaction.compact(spark, root, 64L * 1024 * 1024)
    assert(StagedRefresh.currentGen(spark, root).contains(newGen))
    assert(genDirs(root) == Set(fragGen, newGen),
      "GC must spare exactly the fragmented predecessor")
    // the previous-snapshot read still serves the pre-compaction layout
    assert(StagedRefresh.readPrevious(spark, root).as[Int].collect().sorted
      .toSeq == (1 to 100))
  }

  test("compacting an empty root fails loudly") {
    val root = freshRoot()
    intercept[IllegalStateException] {
      Compaction.compact(spark, root, 1024L)
    }
  }
}
