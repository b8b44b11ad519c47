package graft

import graft.ops.AsOf
import org.apache.spark.sql.functions._

/** As-of join semantics: largest right time ≤ left time per key, ties
  * → smallest tie-break id (SURVEY.md Q14 definition), verified
  * against a brute-force range-join + window on the same data. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of matches brute-force formulation") {
    val left = Tables.orders(spark, sf).withColumn("k", $"o_custkey" % 20)
    val right = Tables.events(spark, sf).withColumn("k", $"user_id" % 20)

    val merged = AsOf.join(left, "k", "o_orderdate", right, "k", "ts",
      Seq("event_id"), "event_id")
      .select($"o_orderkey", $"asof_event_id")

    val brute = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.ts" <= $"l.o_orderdate", "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"l.o_orderkey")
          .orderBy($"r.ts".desc_nulls_last, $"r.event_id".asc)))
      .filter($"rn" === 1)
      .select($"l.o_orderkey".as("o_orderkey"), $"r.event_id".as("asof_event_id"))

    assert(merged.exceptAll(brute).isEmpty && brute.exceptAll(merged).isEmpty)
  }

  test("native sort-merge operator agrees with the window formulation") {
    val left = Tables.orders(spark, sf).withColumn("k", $"o_custkey" % 20)
    val right = Tables.events(spark, sf).withColumn("k", $"user_id" % 20)
    val window = AsOf.join(left, "k", "o_orderdate", right, "k", "ts",
      Seq("event_id"), "event_id").select("o_orderkey", "asof_event_id")
    val native = AsOf.joinNative(left, "k", "o_orderdate", right, "k", "ts",
      Seq("event_id"), "event_id").select("o_orderkey", "asof_event_id")
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
    // and the physical plan really is the custom operator
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
  }

  test("native operator handles string keys and null right times") {
    val left = Tables.orders(spark, sf)
      .withColumn("k", concat(lit("key_"), ($"o_custkey" % 20).cast("string")))
    val right = Tables.events(spark, sf)
      .withColumn("k", concat(lit("key_"), ($"user_id" % 20).cast("string")))
      // null-time rows must be skipped, not crash the merge
      .withColumn("ts", when($"event_id" % 17 === 0, lit(null).cast("timestamp"))
        .otherwise($"ts"))
    val native = AsOf.joinNative(left, "k", "o_orderdate", right, "k", "ts",
      Seq("event_id"), "event_id").select("o_orderkey", "asof_event_id")
    val window = AsOf.join(left, "k", "o_orderdate",
      right.filter($"ts".isNotNull), "k", "ts",
      Seq("event_id"), "event_id").select("o_orderkey", "asof_event_id")
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
  }

  test("time-bucketed variant agrees with the window formulation") {
    val left = Tables.orders(spark, sf).withColumn("k", $"o_custkey" % 20)
    val right = Tables.events(spark, sf).withColumn("k", $"user_id" % 20)
    val window = AsOf.join(left, "k", "o_orderdate", right, "k", "ts",
      Seq("event_id"), "event_id").select("o_orderkey", "asof_event_id")
    val bucketed = AsOf.joinBucketed(left, "k", "o_orderdate", right, "k", "ts",
      Seq("event_id"), "event_id")(t => floor(unix_timestamp(t) / lit(604800L)))
      .select("o_orderkey", "asof_event_id")
    assert(bucketed.exceptAll(window).isEmpty && window.exceptAll(bucketed).isEmpty)
  }

  test("bucketed variant scales a SINGLE hot key across time buckets") {
    // one key: joinNative's ClusteredDistribution(key) would cap
    // parallelism at 1 reducer; (key, bucket) partitioning must not —
    // and carry-over must keep cross-bucket answers exact (events are
    // sparse vs orders, so many buckets rely on carried matches)
    val left = Tables.orders(spark, sf).withColumn("k", lit(1))
    val right = Tables.events(spark, sf).withColumn("k", lit(1))
      .filter($"event_id" % 97 === 0) // sparse right side → bucket gaps
    val day: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => floor(unix_timestamp(t) / lit(86400L))
    val nBuckets = left.select(day($"o_orderdate")).distinct().count()
    assert(nBuckets > 10, s"fixture must span many buckets, got $nBuckets")
    val window = AsOf.join(left, "k", "o_orderdate", right, "k", "ts",
      Seq("event_id"), "event_id").select("o_orderkey", "asof_event_id")
    val bucketed = AsOf.joinBucketed(left, "k", "o_orderdate", right, "k", "ts",
      Seq("event_id"), "event_id")(day)
      .select("o_orderkey", "asof_event_id")
    assert(bucketed.exceptAll(window).isEmpty && window.exceptAll(bucketed).isEmpty)
  }

  test("left rows with no prior right row get null") {
    val l = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-03-01 00:00:00"))
      .toDF("id", "t").withColumn("t", $"t".cast("timestamp")).withColumn("k", lit(1))
    val r = Seq((10L, "2024-02-01 00:00:00")).toDF("rid", "rt")
      .withColumn("rt", $"rt".cast("timestamp")).withColumn("k", lit(1))
    val out = AsOf.join(l, "k", "t", r, "k", "rt", Seq("rid"), "rid")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).isEmpty)     // before any right row
    assert(out(2L).contains(10L))
  }
}
