package graft

import graft.functions.WeiToToken
import org.apache.spark.sql.functions._

class WeiToTokenSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches builtin composition incl. >2^53 values") {
    WeiToToken.register(spark)
    val df = Seq(
      (9006999999999999999L, 18), // > 2^53: the reference's precision edge
      (1500000L, 6), (42L, 0), (123456789L, 8))
      .toDF("v", "d")
    val out = df.select(
      expr("wei_to_token(v, d)").as("native"),
      ($"v".cast("double") / pow(lit(10), $"d")).as("builtin"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, b) => assert(n == b, s"$n != $b") }
    // interpreted eval path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = WeiToToken(Literal(1500000L), Literal(6)).eval(null)
    assert(interp == 1.5d)
  }

  test("optimizer rule strength-reduces wei_to_token(v, 0) to a cast") {
    WeiToToken.register(spark)
    Tables.registerViews(spark, sf)
    val df = spark.sql("SELECT wei_to_token(value_raw, 0) q FROM wallet_txs")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("wei_to_token"), opt)
    assert(df.count() > 0)
  }

  test("SQL text resolves the registered function") {
    WeiToToken.register(spark)
    Tables.registerViews(spark, sf)
    val r = spark.sql(
      "SELECT wei_to_token(value_raw, token_decimal) q FROM wallet_txs LIMIT 5")
    assert(r.count() == 5)
  }
}
