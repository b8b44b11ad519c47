package graft

import graft.queries.{Joins, Scans}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Physical-plan assertions (SURVEY.md §4): the declarative programs
  * must compile to the plans we'd want at 100 TB — broadcast joins for
  * small dims, filters and projection pushed into the parquet scan. */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  test("q12 small-dim join picks BroadcastHashJoin") {
    val plan = Joins.q12.fn(spark, sf).queryExecution.executedPlan
    def hasBhj(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.isInstanceOf[BroadcastHashJoinExec] || p.children.exists(hasBhj) ||
        (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            hasBhj(a.executedPlan)
          case _ => false
        })
    assert(hasBhj(plan), plan.toString)
  }

  test("bucketed tables join without any shuffle exchange (q50)") {
    // model the 100 TB regime: both sides too big to broadcast, so the
    // planner must rely on the bucketed layout for co-location
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = graft.queries.Ingest.bucketedJoinInput(spark, sf)
    joined.collect() // force the final AQE plan
    def finalPlan(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val plan = finalPlan(joined.queryExecution.executedPlan).toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must be exchange-free:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("concurrent bucketedJoinInput calls serialize the rebuild (no torn tables)") {
    // force a rebuild so both threads race the check+build path, then
    // hit it from two threads: the synchronized block must serialize
    // the DROP/overwrite sequence — both callers see complete tables
    graft.queries.Ingest.invalidateBucketedForTest()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val counts = Await.result(
      Future.sequence(Seq.fill(2)(Future {
        graft.queries.Ingest.bucketedJoinInput(spark, sf).count()
      })), 120.seconds)
    assert(counts.distinct.size == 1 && counts.head > 0, counts.toString)
  }

  test("q41g neighborhood pairing stays an equi-join (no cartesian/BNLJ)") {
    // the rank-window pairing is built as explode(sequence) + equi-join
    // precisely so a theta band "b.rk BETWEEN a.rk+1 AND a.rk+w" never
    // degenerates into a per-block nested-loop product — pin that the
    // executed plan contains neither
    val df = graft.ops.Dedup.editDistanceNearDupsScaled(
      Tables.documents(spark, sf), "doc_id", "text", "lang", "n_chars")
    df.collect() // force the final AQE plan
    def render(p: org.apache.spark.sql.execution.SparkPlan): String = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    val plan = render(df.queryExecution.executedPlan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("filters push into the parquet scan") {
    val df = Tables.lineitem(spark, sf).filter($"l_quantity" > 30.0)
      .select("l_orderkey")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), scan)
  }

  test("q05 filters push into the MATERIALIZED wallet_txs parquet scan") {
    // round-12 verdict item 5: the fixture used to be an expression
    // view over events — every column computed at plan time, so q05's
    // scan showed PushedFilters: []. The materialized twin must push
    // its conjunction into the reader like any production table.
    val plan = graft.queries.Scans.q05.fn(spark, sf)
      .queryExecution.executedPlan.toString
    // the plan string truncates metadata lists at 100 chars, so match
    // the EqualTo prefix rather than the full literal
    assert(plan.contains("GreaterThan(quantity,100.0)") &&
      plan.contains("EqualTo(token_symbol,"),
      s"wallet_txs scan lost filter pushdown:\n$plan")
  }

  test("column pruning: 2-column projection reads a 2-column schema") {
    val df = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), scan)
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    val df = Tables.lineitem(spark, sf).filter($"l_quantity" > 30.0)
      .select(($"l_extendedprice" * ($"l_quantity" - 1)).as("x"))
    def hasWscg(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec] ||
        p.children.exists(hasWscg)
    assert(hasWscg(df.queryExecution.executedPlan),
      df.queryExecution.executedPlan.toString)
  }
}
