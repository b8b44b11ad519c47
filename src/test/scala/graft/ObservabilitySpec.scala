package graft

import org.apache.spark.sql.functions._

/** R20: the per-query observability envelope — every executed action
  * lands one structured metric (tag, duration, rows, outcome).
  * Listener delivery is asynchronous, so assertions poll. */
class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private def eventually(pred: => Boolean, ms: Long = 5000): Boolean = {
    val deadline = System.currentTimeMillis + ms
    while (System.currentTimeMillis < deadline) {
      if (pred) return true
      Thread.sleep(50)
    }
    pred
  }

  test("successful actions record relation-tagged metrics with durations") {
    Observability.register(spark)
    Observability.clear()
    Tables.documents(spark, sf).filter($"doc_id" < 100).count()
    assert(eventually(Observability.metrics
        .exists(_.relations.exists(_.contains("documents")))),
      s"no documents-scan metric recorded: ${Observability.metrics}")
    val m = Observability.metrics
      .find(_.relations.exists(_.contains("documents"))).get
    assert(m.durationMs >= 0 && m.error.isEmpty)
  }

  test("failed actions record the failure outcome") {
    Observability.register(spark)
    Observability.clear()
    intercept[Exception] {
      Tables.documents(spark, sf)
        .select(expr("assert_true(doc_id < 0)")).collect()
    }
    assert(eventually(Observability.metrics.exists(_.error.isDefined)),
      "failure not recorded")
  }

  test("registration is idempotent — no duplicate metrics per action") {
    Observability.register(spark)
    Observability.register(spark)
    Observability.clear()
    Tables.region(spark, sf).count()
    assert(eventually(Observability.metrics.count(_.funcName == "count") >= 1))
    Thread.sleep(500) // settle: a duplicate listener would double-fire
    val n = Observability.metrics.count(_.funcName == "count")
    assert(n == 1, s"expected exactly 1 'count' metric, got $n")
  }
}
