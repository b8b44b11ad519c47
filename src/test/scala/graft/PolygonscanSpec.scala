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

  test("wallet EqualTo filter prunes to one input partition") {
    val df = read("0xw0,0xw1,0xw2,0xw3,0xw4")
      .filter($"wallet_address" === "0xw2")
    assert(df.rdd.getNumPartitions == 1)
    assert(df.queryExecution.executedPlan.toString.contains("wallets=1"))
    assert(df.count() == FixturePageSource.totalTxs(2, 100))
  }

  test("wallet IN filter prunes partitions; unknown wallets drop out") {
    val df = read("0xw0,0xw1,0xw2,0xw3,0xw4")
      .filter($"wallet_address".isin("0xw1", "0xw3", "0xwNOPE"))
    assert(df.rdd.getNumPartitions == 2)
    val counts = df.groupBy("wallet_address").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map(
      "0xw1" -> FixturePageSource.totalTxs(1, 100),
      "0xw3" -> FixturePageSource.totalTxs(3, 100)))
  }

  test("scan builder reports pushed wallet predicate and plans pruned partitions") {
    import org.apache.spark.sql.sources.{EqualTo, In}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val opts = new CaseInsensitiveStringMap(java.util.Map.of(
      "wallets", "0xw0,0xw1,0xw2,0xw3,0xw4",
      "pageSize", "100", "source", "fixture"))
    val b = new graft.sources.polygonscan.PolygonscanScanBuilder(opts)
    val in = In("wallet_address", Array("0xw0", "0xw1", "0xw4"))
    val eq = EqualTo("wallet_address", "0xw4")
    val residual = b.pushFilters(Array(in, eq))
    assert(residual.isEmpty, "pruning satisfies the predicate completely")
    assert(b.pushedFilters().toSet == Set[org.apache.spark.sql.sources.Filter](in, eq))
    // EqualTo ∩ In = {0xw4}: exactly one partition survives
    val parts = b.build().toBatch.planInputPartitions()
    assert(parts.length == 1)
  }

  test("OR of wallet equalities prunes partitions (union semantics)") {
    val df = read("0xw0,0xw1,0xw2,0xw3,0xw4")
      .filter($"wallet_address" === "0xw1" || $"wallet_address" === "0xw3")
    assert(df.rdd.getNumPartitions == 2)
    assert(df.queryExecution.executedPlan.toString.contains("wallets=2"))
    val counts = df.groupBy("wallet_address").count()
      .as[(String, Long)].collect().toMap
    assert(counts == Map(
      "0xw1" -> FixturePageSource.totalTxs(1, 100),
      "0xw3" -> FixturePageSource.totalTxs(3, 100)))
  }

  test("OR mixing wallet equality with another column is NOT pruned") {
    // (wallet = w1 OR block_number < 5) can match any wallet — the
    // whole Or must stay residual and no partition may be dropped
    val df = read("0xw0,0xw1,0xw2")
      .filter($"wallet_address" === "0xw1" || $"block_number" < 5)
    assert(df.rdd.getNumPartitions == 3)
    val expect = FixturePageSource.totalTxs(1, 100) + 2 * 5
    assert(df.count() == expect)
  }

  test("contradictory block range plans zero partitions") {
    val df = read("0xw0,0xw1,0xw2")
      .filter($"block_number" > 100 && $"block_number" < 50)
    assert(df.rdd.getNumPartitions == 0)
    assert(df.count() == 0)
  }

  test("column pruning reaches the reader") {
    val df = read("0xw1").select("hash")
    assert(df.schema.fieldNames.sameElements(Array("hash")))
    assert(df.distinct().count() == FixturePageSource.totalTxs(1, 100))
  }
}
