package graft

import graft.sources.polygonscan.FixturePageSource
import org.apache.spark.sql.functions._

/** The DSv2 connector: pagination completeness (incl. the fixed
  * §0.1-1 bug — exact-page-boundary wallets), block-range pushdown,
  * partition-per-wallet parallelism, error tolerance modes. */
class PolygonscanSpec extends SparkSpec {
  import spark.implicits._

  private def read(wallets: String, pageSize: Int = 100) =
    spark.read.format("polygonscan")
      .option("wallets", wallets).option("pageSize", pageSize.toString)
      .option("source", "fixture").load()

  test("pagination fetches every row, including exact page boundaries") {
    // wallet 0: exactly 100 txs = exactly one full page (boundary case)
    assert(FixturePageSource.totalTxs(0, 100) == 100)
    val counts = read("0xw0,0xw1,0xw2,0xw3,0xw4")
      .groupBy("wallet_address").count()
      .as[(String, Long)].collect().toMap
    (0 to 4).foreach { w =>
      assert(counts(s"0xw$w") == FixturePageSource.totalTxs(w, 100),
        s"wallet $w: ${counts(s"0xw$w")}")
    }
  }

  test("block-range predicates push into the scan") {
    val df = read("0xw1").filter($"block_number" >= 50 && $"block_number" <= 60)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("blocks=[50,60]"), plan)
    assert(df.count() == 11)
  }

  test("one input partition per wallet") {
    assert(read("0xw0,0xw1,0xw2").rdd.getNumPartitions == 3)
  }

  test("permissive mode skips a failing wallet; failfast propagates") {
    val ok = spark.read.format("polygonscan")
      .option("wallets", s"0xw0,${FixturePageSource.failingWallet}")
      .option("pageSize", "100").option("source", "fixture")
      .option("mode", "permissive").load()
    assert(ok.groupBy("wallet_address").count().count() == 1)

    val bad = spark.read.format("polygonscan")
      .option("wallets", FixturePageSource.failingWallet)
      .option("pageSize", "100").option("source", "fixture")
      .option("mode", "failfast").load()
    intercept[Exception] { bad.count() }
  }

  test("column pruning reaches the reader") {
    val df = read("0xw1").select("hash")
    assert(df.schema.fieldNames.sameElements(Array("hash")))
    assert(df.distinct().count() == FixturePageSource.totalTxs(1, 100))
  }
}
