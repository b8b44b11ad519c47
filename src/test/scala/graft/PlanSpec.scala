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

  test("q61 sessionization: windows and session aggregate share ONE hash exchange") {
    // HashPartitioning(user_id) satisfies the (user_id, session_idx)
    // aggregate's clustered distribution, so the only exchanges are the
    // initial user_id shuffle and the final orderBy range partitioning
    val df = graft.queries.Analytics.q61.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(hashEx == 1,
      s"expected exactly 1 hash exchange (got $hashEx):\n$finalPlan")
  }

  test("q60b upsert: partial aggregate collapses BELOW the exchange, no window") {
    val df = graft.queries.Warehouse.q60b.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "latest-wins must not plan a window")
    // the partial max(struct) must sit under the cust_id exchange
    val finalPlan = plan.split("== Initial Plan ==").head
    val exIdx = finalPlan.indexOf("Exchange hashpartitioning(cust_id")
    val partIdx = finalPlan.indexOf("partial_max(struct")
    assert(exIdx >= 0 && partIdx > exIdx,
      "partial_max(struct) must run map-side, below the key exchange")
  }

  test("q62 layout query prunes partitions at planning time") {
    val df = graft.queries.Ingest.q62.fn(spark, sf)
    df.collect()
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "day-equality filter must become a PARTITION filter, not a data filter")
    // 30 day partitions in the layout; the pruned scan must list only
    // one day's files (a handful), not the table
    val files = scan.metrics("numFiles").value
    assert(files > 0 && files <= 8,
      s"pruned scan read $files files — pruning is not happening")
  }

  test("q64 join against the filtered calendar prunes partitions DYNAMICALLY") {
    val df = graft.queries.Ingest.q64.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected a dynamic pruning subquery on the fact scan:\n${plan.take(3000)}")
  }

  test("q67 lookup on the bucketing key reads a pruned bucket subset") {
    val df = graft.queries.Ingest.q67.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"scan must report bucket pruning:\n${plan.take(2000)}")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      "the IN-list lookup must touch a strict subset of buckets")
  }

  test("q47b salted join plans a ShuffledHashJoin keyed on (partkey, salt)") {
    val df = graft.queries.Joins.q47b.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin [l_partkey"), plan.take(2000))
    assert(plan.contains("_salt"), "salt must be part of the join key")
  }
}
