package graft

import graft.functions.TopKFreq
import org.apache.spark.sql.functions._

class TopKFreqSpec extends SparkSpec {
  import spark.implicits._

  test("exact when capacity covers cardinality, across partitions") {
    TopKFreq.register(spark)
    Tables.registerViews(spark, sf)
    // force many partials so serialize/merge actually runs
    Fixtures.walletTxs(spark, sf).repartition(16)
      .createOrReplaceTempView("wt_parts")
    val got = spark.sql(
      """SELECT t.col.value AS v, t.col.cnt AS c
        |FROM (SELECT explode(topk_freq(token_symbol, 5, 64)) AS col
        |      FROM wt_parts) t""".stripMargin)
      .as[(String, Long)].collect().toSeq
    val expect = Fixtures.walletTxs(spark, sf)
      .groupBy("token_symbol").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"token_symbol").limit(5)
      .as[(String, Long)].collect().toSeq
    assert(got == expect, s"$got vs $expect")
  }

  test("space-saving keeps a dominant heavy hitter under eviction") {
    TopKFreq.register(spark)
    val df = (Seq.fill(500)("hot") ++ (1 to 200).map(i => s"cold_$i"))
      .toDF("s")
    df.createOrReplaceTempView("ss_input")
    val top = spark.sql(
      "SELECT explode(topk_freq(s, 1, 16)) AS col FROM ss_input")
      .select("col.value").as[String].collect()
    assert(top.headOption.contains("hot"))
  }
}
