package graft

import org.apache.spark.sql.functions._

/** Determinism of the canonical aggregates: results must not depend on
  * partitioning (partial-aggregate combine order). */
class CanonSpec extends SparkSpec {
  import spark.implicits._

  test("dsum/davg are partitioning-independent") {
    val df = Tables.lineitem(spark, sf)
    def run(parts: Int) =
      df.repartition(parts)
        .agg(Canon.dsum($"l_extendedprice"), Canon.davg($"l_extendedprice"),
          Canon.dstddevSamp($"l_extendedprice"), Canon.dvarSamp($"l_extendedprice"))
        .collect()(0)
    assert(run(1) == run(7))
    assert(run(7) == run(32))
  }

  test("revenue matches exact BigDecimal model") {
    val rows = Tables.lineitem(spark, sf)
      .select($"l_extendedprice", $"l_discount").limit(500)
      .as[(Double, Double)].collect()
    val model = rows.map { case (e, d) =>
      (BigDecimal(e).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        (BigDecimal(1) - BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    }.sum.toDouble
    val got = Tables.lineitem(spark, sf).limit(500)
      .agg(Canon.revenue($"l_extendedprice", $"l_discount")).collect()(0).getDouble(0)
    assert(math.abs(got - model) < 1e-6, s"$got vs $model")
  }
}
