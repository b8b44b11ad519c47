package graft

import graft.ops.StagedRefresh
import graft.queries.Ingest

/** Stage-and-swap full refresh: a writer killed at ANY point between
  * the stages must leave readers on a complete generation — old XOR
  * new, never an empty or half-written dataset. Crash injection via
  * the refresh hooks. */
class StageSwapSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    java.nio.file.Files.createTempDirectory("graft_swap").toString + "/ds"

  private case object Crash extends RuntimeException("injected crash")

  private def vals(root: String): Set[Int] =
    StagedRefresh.readCurrent(spark, root).as[Int].collect().toSet

  test("crash between stage and swap: readers stay on the OLD generation") {
    val root = freshRoot()
    StagedRefresh.refresh(Seq(1, 2, 3).toDF("v"), root)
    intercept[Crash.type] {
      StagedRefresh.refresh(Seq(10, 20).toDF("v"), root,
        hook = { case "staged" => throw Crash; case _ => () })
    }
    assert(vals(root) == Set(1, 2, 3), "reader saw a half-committed refresh")
    // recovery: the next successful refresh goes live and GCs the orphan
    StagedRefresh.refresh(Seq(10, 20).toDF("v"), root)
    assert(vals(root) == Set(10, 20))
  }

  test("crash after swap: readers see the NEW generation") {
    val root = freshRoot()
    StagedRefresh.refresh(Seq(1).toDF("v"), root)
    intercept[Crash.type] {
      StagedRefresh.refresh(Seq(2).toDF("v"), root,
        hook = { case "swapped" => throw Crash; case _ => () })
    }
    assert(vals(root) == Set(2), "swap happened but readers still see old data")
  }

  test("a crash before the FIRST swap fails readers loudly, never as empty data") {
    val root = freshRoot()
    intercept[Crash.type] {
      StagedRefresh.refresh(Seq(1).toDF("v"), root,
        hook = { case "staged" => throw Crash; case _ => () })
    }
    val ex = intercept[IllegalStateException] { StagedRefresh.readCurrent(spark, root) }
    assert(ex.getMessage.contains("no completed generation"))
  }

  test("old generations are GC'd but the immediate predecessor survives one cycle") {
    val root = freshRoot()
    StagedRefresh.refresh(Seq(1).toDF("v"), root)
    StagedRefresh.refresh(Seq(2).toDF("v"), root)
    StagedRefresh.refresh(Seq(3).toDF("v"), root)
    val gens = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).toSet
    assert(gens == Set("gen-2", "gen-3"), s"unexpected generation set $gens")
    assert(vals(root) == Set(3))
  }

  test("catalog refresh: crash between stage and repoint leaves the view on the OLD generation") {
    Ingest.catalogRefresh(spark, Seq(("a", 1)).toDF("token_symbol", "x"))
    val before = spark.table("polygonscan.wallet_txs").collect().toSeq
    intercept[Crash.type] {
      Ingest.catalogRefresh(spark, Seq(("b", 2)).toDF("token_symbol", "x"),
        hook = { case "staged" => throw Crash; case _ => () })
    }
    assert(spark.table("polygonscan.wallet_txs").collect().toSeq == before,
      "view repointed despite the crash before the swap")
    // recovery: next load swaps to the new generation
    Ingest.catalogRefresh(spark, Seq(("b", 2)).toDF("token_symbol", "x"))
    assert(spark.table("polygonscan.wallet_txs").select("token_symbol")
      .as[String].collect().toSeq == Seq("b"))
  }
}
