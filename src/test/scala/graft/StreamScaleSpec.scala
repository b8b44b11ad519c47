package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryProgress, Trigger}

/** Streaming state at 10x events (round-12 verdict item 5): the three
  * stateful families — session-window agg (q38 shape), stateful dedup
  * (q39 shape), stream-stream join (q48 shape) — must run a
  * DATA-INDEPENDENT trigger count under AvailableNow: per-trigger
  * state-commit machinery is the fixed cost, data volume only grows
  * the per-trigger row work. A trigger count that grows with input
  * means the source regressed to per-file batching and every streaming
  * bench number changes meaning. Runs under the RocksDB provider (the
  * 100 TB state story) and records state rows/commit counts for
  * SCALING.md. */
class StreamScaleSpec extends SparkSpec {
  import spark.implicits._

  private val rocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** 1x and 10x event dirs: 10 disjoint id-shifted shards (ts
    * unchanged — watermark behavior identical; ids disjoint — per-shard
    * results independent). Built once per suite. */
  private lazy val base: String = {
    val b = java.nio.file.Files.createTempDirectory("graft_sscale").toString
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val e = ev.agg(max("event_id")).head().getLong(0) + 1
    val u = ev.agg(max("user_id")).head().getLong(0) + 1
    // driver-testdata layout ($dir/events.parquet), DIRECTORY-shaped —
    // Spark writes create a dir of part files, the layout every real
    // table has at scale (and the one the round-12 staging bug ate)
    ev.write.parquet(s"$b/x1/events.parquet")
    (0 until 10).map(k => ev.select(
        ($"event_id" + k * e).as("event_id"), $"ts",
        ($"user_id" + k * u).as("user_id"), $"event_type", $"value"))
      .reduce(_ unionByName _)
      .write.parquet(s"$b/x10/events.parquet")
    b
  }

  private lazy val dirs: (String, String) =
    (s"$base/x1/events.parquet", s"$base/x10/events.parquet")

  private def events(dir: String): DataFrame = {
    val sch = spark.read.parquet(dir).schema
    spark.readStream.schema(sch).parquet(dir)
  }

  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run a streaming DF to completion, return (sink rows, progresses). */
  private def run(df: DataFrame, mode: String): (Long, Seq[StreamingQueryProgress]) = {
    val name = s"sscale_${sinkCounter.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(name).count()
    spark.catalog.dropTempView(name)
    (rows, q.recentProgress.toSeq)
  }

  private def sessionAgg(dir: String): DataFrame =
    events(dir)
      .groupBy(session_window($"ts", "5 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("cnt"))

  private def dedup(dir: String): DataFrame =
    events(dir)
      .withColumn("dup", explode(array(lit(1), lit(2), lit(3)))).drop("dup")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  private def streamJoin(dir: String, joinType: String = "inner"): DataFrame = {
    val a = events(dir).withWatermark("ts", "10 minutes")
      .select($"user_id", $"ts".as("ts_a"))
    val b = events(dir).withWatermark("ts", "10 minutes")
      .select($"user_id".as("user_b"), $"ts".as("ts_b"))
    a.join(b, $"user_id" === $"user_b" &&
      $"ts_b" > $"ts_a" && $"ts_b" <= $"ts_a" + expr("INTERVAL 5 MINUTES"),
      joinType)
  }

  test("declared streaming queries read a DIRECTORY-shaped events table") {
    // the staging layer must link part files, not the table dir itself
    // (a symlinked dir is skipped by the source listing → silent empty
    // stream — the round-12 10x finding)
    val r1 = graft.queries.Streaming.q36.fn(spark, s"$base/x1").count()
    val r10 = graft.queries.Streaming.q36.fn(spark, s"$base/x10").count()
    assert(r1 > 0, "q36 read zero rows from a directory-shaped events table")
    assert(r10 == r1, // same (user-agnostic) tumbling buckets, 10x counts inside
      s"q36 window-bucket count changed with sharding ($r1 -> $r10)")
  }

  test("declared streaming queries read a PARTITION-NESTED events table with partition VALUES intact") {
    // round-12 advice + round-13 review: a hive-partitioned table
    // (shard=N/part-*.parquet) must stream (a) non-empty and (b) with
    // the partition COLUMN VALUES — a staging layer that flattened the
    // partition dirs away read every partition column as NULL while
    // row counts looked fine
    val nested = s"$base/nested"
    Tables.events(spark, sf).withColumn("shard", $"event_id" % 3)
      .write.partitionBy("shard").parquet(s"$nested/events.parquet")
    val flat = graft.queries.Streaming.q36.fn(spark, s"$base/x1").count()
    val part = graft.queries.Streaming.q36.fn(spark, nested).count()
    assert(part > 0, "q36 read zero rows from a partition-nested events table")
    // the partition column rides along but the tumbling buckets are the
    // same ts/event_type payload → identical window-bucket count
    assert(part == flat,
      s"q36 window-bucket count diverged on nested layout ($flat -> $part)")
    // partition VALUES: stream grouped by the partition column must see
    // the same per-shard counts the batch read sees (never NULLs)
    val sch = spark.read.parquet(s"$nested/events.parquet").schema
    val byShard = spark.readStream.schema(sch).parquet(s"$nested/events.parquet")
      .groupBy("shard").count()
    val q = byShard.writeStream.format("memory").queryName("nested_shards")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("nested_shards").as[(Long, Long)].collect().toMap
    spark.catalog.dropTempView("nested_shards")
    val want = spark.read.parquet(s"$nested/events.parquet")
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(got == want,
      s"partition-column values diverged streaming vs batch: $got vs $want")
  }

  test("trigger count is invariant at 10x events for all three stateful families (RocksDB)") {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, rocksProvider)
    try {
      val cases = Seq(
        ("session_window", sessionAgg(_: String), "complete"),
        ("dedup", dedup(_: String), "append"),
        ("stream_stream_join", streamJoin(_: String), "append"),
        // q48c's shape (round-14 verdict item 4): left-outer adds
        // matched-ness tracking and null emission at watermark
        // eviction; id-shifted shards are independent, so rows must
        // still scale exactly 10x and triggers stay data-independent
        ("stream_stream_left_outer",
          streamJoin(_: String, "left_outer"), "append"))
      cases.foreach { case (label, mk, mode) =>
        val t1 = System.nanoTime()
        val (rows1, prog1) = run(mk(dirs._1), mode)
        val w1 = (System.nanoTime() - t1) / 1e9
        val t10 = System.nanoTime()
        val (rows10, prog10) = run(mk(dirs._2), mode)
        val w10 = (System.nanoTime() - t10) / 1e9
        // disjoint id-shifted shards: output must scale exactly 10x
        assert(rows10 == 10 * rows1, s"$label: rows $rows1 -> $rows10 at 10x input")
        // THE pin: trigger count is data-independent (and tiny)
        assert(prog1.length == prog10.length,
          s"$label: trigger count grew with input (${prog1.length} -> ${prog10.length})")
        assert(prog10.length <= 3,
          s"$label: ${prog10.length} triggers — no longer fixed micro-batch machinery")
        def stateRows(ps: Seq[StreamingQueryProgress]) =
          ps.flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).maxOption.getOrElse(0L)
        def commits(ps: Seq[StreamingQueryProgress]) =
          ps.flatMap(_.stateOperators.toSeq).length
        info(f"$label: wall $w1%.2f -> $w10%.2f s (${w10 / w1}%.1fx), " +
          f"triggers ${prog1.length} -> ${prog10.length}, " +
          f"state rows ${stateRows(prog1)} -> ${stateRows(prog10)}, " +
          f"state-op commits/query ${commits(prog1)} -> ${commits(prog10)}")
      }
    } finally prev match {
      case Some(p) => spark.conf.set(confKey, p)
      case None    => spark.conf.unset(confKey)
    }
  }

  test("streaming defs analyze and agree on all three physical ts encodings") {
    // Round-13 postmortem: driver testdata regenerated events.ts from
    // TIMESTAMP(NANOS) (→ LongType under nanosAsLong) to micros-NTZ
    // (→ TIMESTAMP_NTZ), and `withWatermark` hard-rejects NTZ event
    // time — q37/q39/q48 silently vanished from the oracle artifact.
    // Pin the TYPE axis: every watermark-bearing query must analyze,
    // run, and produce IDENTICAL results on each encoding the driver
    // has ever shipped (Tables.normalizeTs documents the policy).
    val root = java.nio.file.Files.createTempDirectory("graft_tsenc").toString
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    // (a) nanos-since-epoch LONG — what TIMESTAMP(NANOS) parquet reads
    // as under spark.sql.legacy.parquet.nanosAsLong
    ev.withColumn("ts", unix_micros($"ts") * 1000)
      .write.parquet(s"$root/enc_long/events.parquet")
    // (b) micros NTZ (timestamp[us], isAdjustedToUTC=false) — the
    // round-13 driver layout that broke the watermark queries
    ev.withColumn("ts", $"ts".cast("timestamp_ntz"))
      .write.parquet(s"$root/enc_ntz/events.parquet")
    // (c) micros adjusted-to-UTC — plain TIMESTAMP
    val outKey = "spark.sql.parquet.outputTimestampType"
    val prevOut = spark.conf.getOption(outKey)
    spark.conf.set(outKey, "TIMESTAMP_MICROS")
    try ev.write.parquet(s"$root/enc_ltz/events.parquet")
    finally prevOut match {
      case Some(p) => spark.conf.set(outKey, p)
      case None    => spark.conf.unset(outKey)
    }
    val encodings = Seq("enc_long", "enc_ntz", "enc_ltz")
    // sanity: the three dirs really carry three distinct read types
    val readTypes = encodings.map(e =>
      spark.read.parquet(s"$root/$e/events.parquet")
        .schema.fields.find(_.name == "ts").get.dataType.typeName).distinct
    assert(readTypes.size == 3, s"encodings collapsed to $readTypes — axis not exercised")
    val qs = Seq(graft.queries.Streaming.q36, graft.queries.Streaming.q37,
      graft.queries.Streaming.q39, graft.queries.Streaming.q48)
    qs.foreach { q =>
      val results = encodings.map { e =>
        val rows = q.fn(spark, s"$root/$e").collect().map(_.toString).sorted.toSeq
        assert(rows.nonEmpty, s"${q.name} returned zero rows on $e")
        e -> rows
      }
      val distinct = results.map(_._2).distinct
      assert(distinct.size == 1,
        s"${q.name} results diverged across ts encodings: " +
          results.map { case (e, r) => s"$e=${r.length} rows" }.mkString(", "))
      info(s"${q.name}: ${results.head._2.length} rows, identical on ${encodings.mkString("/")}")
    }
  }

  /** `slices` time slices 30 min apart, one parquet FILE each, mtimes
    * ascending so maxFilesPerTrigger=1 feeds them to the stream in
    * time order — the long-running-ingest shape where the watermark
    * ADVANCES across triggers and old join state must evict. */
  private def writeSlices(dir: String, slices: Int, perSlice: Int): Unit = {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until slices).foreach { k =>
      val df = spark.range(perSlice).select(
        ($"id" % 50).as("user_id"),
        timestamp_millis(lit(t0 + k * 1800000L) + ($"id" % 300) * 1000).as("ts"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_slice")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(dir, f"slice_$k%03d.parquet")
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.move(part.toPath, dst)
      dst.toFile.setLastModified(t0 + k * 60000L)
    }
  }

  /** The q48-shaped watermarked interval self-join over a slice dir,
    * one file per trigger; q48c's left-outer shape shares the
    * machinery (outer state carries the extra "matched" bit and the
    * null-emission obligation — its horizon must bound identically). */
  private def slicedJoin(dir: String, joinType: String = "inner"): DataFrame = {
    val sch = spark.read.parquet(dir).schema
    def src = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val a = src.withWatermark("ts", "10 minutes")
      .select($"user_id", $"ts".as("ts_a"))
    val b = src.withWatermark("ts", "10 minutes")
      .select($"user_id".as("user_b"), $"ts".as("ts_b"))
    a.join(b, $"user_id" === $"user_b" &&
      $"ts_b" > $"ts_a" && $"ts_b" <= $"ts_a" + expr("INTERVAL 5 MINUTES"),
      joinType)
  }

  test("join state is bounded by the watermark horizon, not total input (RocksDB)") {
    // Round-12 verdict item 6: the 10x table pinned trigger invariance
    // with ALL data inside one watermark window — state there is 10x
    // rows by construction. The 100-TB law is different: with the
    // watermark advancing across triggers, state must hold only the
    // horizon (10 min watermark + 5 min join interval ≈ one 30-min
    // slice), so DOUBLING the slice count (total input) must leave
    // peak state rows FLAT. That flat line is what makes an unbounded
    // stream runnable at all.
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, rocksProvider)
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_horizon").toString
      val perSlice = 400
      writeSlices(s"$root/s12", 12, perSlice)
      writeSlices(s"$root/s24", 24, perSlice)
      def batchPairs(dir: String): Long = {
        val ev = spark.read.parquet(dir)
        ev.as("a").join(ev.as("b"),
          $"a.user_id" === $"b.user_id" && $"b.ts" > $"a.ts" &&
            $"b.ts" <= $"a.ts" + expr("INTERVAL 5 MINUTES")).count()
      }
      def stateMax(ps: Seq[StreamingQueryProgress]): Long =
        ps.flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).maxOption.getOrElse(0L)
      def memMax(ps: Seq[StreamingQueryProgress]): Long =
        ps.flatMap(_.stateOperators.toSeq).map(_.memoryUsedBytes).maxOption.getOrElse(0L)
      def commitMax(ps: Seq[StreamingQueryProgress]): Long =
        ps.flatMap(_.stateOperators.toSeq).map(_.commitTimeMs).maxOption.getOrElse(0L)
      val (rows12, prog12) = run(slicedJoin(s"$root/s12"), "append")
      val (rows24, prog24) = run(slicedJoin(s"$root/s24"), "append")
      // correctness first: the incremental join equals the batch self-join
      assert(rows12 == batchPairs(s"$root/s12"), "12-slice join diverged from batch")
      assert(rows24 == batchPairs(s"$root/s24"), "24-slice join diverged from batch")
      val (s12, s24) = (stateMax(prog12), stateMax(prog24))
      info(f"peak state rows: $s12 (12 slices) -> $s24 (24 slices); " +
        f"peak state mem ${memMax(prog24) / 1024} KiB, " +
        f"max commit ${commitMax(prog24)} ms, triggers ${prog24.length}")
      // THE pin: watermark eviction keeps peak state flat as total
      // input doubles (allow 50% jitter for trigger alignment)
      assert(s24 <= s12 * 3 / 2,
        s"peak state grew with total input ($s12 -> $s24) — watermark eviction broken")
      // and the horizon itself is small vs the run's total state-side
      // input (24 slices x perSlice x 2 sides)
      assert(s24 < 24L * perSlice * 2 / 3,
        s"peak state $s24 holds most of the input — horizon not bounding")
      // q48c's LEFT-OUTER shape: state additionally tracks matched-ness
      // and owes null rows at eviction — the horizon must bound the
      // same way, and outer output = inner pairs + null-extended rows
      // bounded by the left input
      val (o12, oprog12) = run(slicedJoin(s"$root/s12", "left_outer"), "append")
      val (o24, oprog24) = run(slicedJoin(s"$root/s24", "left_outer"), "append")
      assert(o12 >= rows12 && o12 <= rows12 + 12L * perSlice,
        s"outer 12-slice rows $o12 outside [inner, inner + left rows]")
      assert(o24 >= rows24 && o24 <= rows24 + 24L * perSlice,
        s"outer 24-slice rows $o24 outside [inner, inner + left rows]")
      val (os12, os24) = (stateMax(oprog12), stateMax(oprog24))
      info(f"outer peak state rows: $os12 (12) -> $os24 (24)")
      assert(os24 <= os12 * 3 / 2,
        s"outer-join peak state grew with total input ($os12 -> $os24)")
      // FULL-outer: both sides owe null rows at eviction — the last
      // un-declared watermarked join type; same horizon bound applies
      val (f24, fprog24) = run(slicedJoin(s"$root/s24", "full_outer"), "append")
      assert(f24 >= o24 && f24 <= o24 + 24L * perSlice,
        s"full-outer rows $f24 outside [left-outer, left-outer + right rows]")
      assert(stateMax(fprog24) <= os24 * 3 / 2,
        s"full-outer peak state ${stateMax(fprog24)} above the left-outer horizon $os24")
    } finally prev match {
      case Some(p) => spark.conf.set(confKey, p)
      case None    => spark.conf.unset(confKey)
    }
  }
}
