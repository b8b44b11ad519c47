package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.functions._

/** Real incremental streaming (SURVEY.md Q37's late-data semantics),
  * exercised across micro-batches via maxFilesPerTrigger=1.
  *
  * Pins Spark's actual watermark timing: the watermark advances using
  * the PREVIOUS batch's max event time, so a late row arriving in the
  * same batch as the window's eviction still joins it; a late row in
  * any LATER batch is dropped by the committed watermark
  * (numRowsDroppedByWatermark). Single-batch runs can't see any of
  * this — which is why the oracle for q37 is batch-equivalence and
  * late-data behavior is pinned here instead.
  */
class StreamingLateDataSpec extends SparkSpec {
  import spark.implicits._

  test("watermark drops late rows once committed in a prior batch") {
    val dir = Files.createTempDirectory("graft_late").toString
    def writeBatch(name: String, mtime: Long, rows: Seq[(Long, String)]): Unit = {
      val tmp = Files.createTempDirectory("graft_late_stage").toString
      rows.toDF("event_id", "t")
        .select($"event_id", $"t".cast("timestamp").as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .find(_.endsWith(".parquet")).get
      val dst = Paths.get(dir, name)
      Files.copy(Paths.get(part), dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    }
    // batch0: 3 on-time events in [00:00, 00:10)
    writeBatch("b1.parquet", 1000000, Seq(
      (1L, "2024-01-01 00:01:00"), (2L, "2024-01-01 00:05:00"),
      (3L, "2024-01-01 00:09:00")))
    // batch1: an hour later — watermark will advance to 00:55
    writeBatch("b2.parquet", 2000000, Seq((4L, "2024-01-01 01:10:00")))
    // batch2: late row in the SAME batch as the eviction → still joins
    writeBatch("b3.parquet", 3000000, Seq((5L, "2024-01-01 00:05:30")))
    // batch3: late row AFTER the watermark committed → dropped
    writeBatch("b4.parquet", 4000000, Seq((6L, "2024-01-01 00:06:30")))

    val sch = spark.read.parquet(dir).schema
    val agg = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .withWatermark("ts", "15 minutes")
      .groupBy(window($"ts", "10 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("ws"), $"cnt")
    val q = agg.writeStream.format("memory").queryName("late_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    val lateDropped = q.recentProgress
      .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
    q.stop()

    val out = spark.table("late_sink").as[(String, Long)].collect().toMap
    // window emitted once, with the 3 on-time rows + the same-batch
    // late row; never re-emitted for the post-watermark row
    assert(out == Map("2024-01-01 00:00:00" -> 4L), out.toString)
    assert(lateDropped == 1, s"expected exactly one watermark-dropped row, got $lateDropped")
  }

  test("repeated streaming queries stage ONE temp dir per dataset and drop sink views") {
    def stagedDirs: Set[String] = {
      val tmp = Paths.get(System.getProperty("java.io.tmpdir"))
      Files.list(tmp).toArray.map(_.toString)
        .filter(_.contains("graft_stream")).toSet
    }
    // first run establishes the (at most one) staged dir for sf0.001
    graft.queries.Streaming.q36.fn(spark, sf).collect()
    val after1 = stagedDirs
    // three more invocations across different queries, same dataset:
    // no new dirs may appear
    graft.queries.Streaming.q36.fn(spark, sf).collect()
    graft.queries.Streaming.q39.fn(spark, sf).collect()
    graft.queries.Streaming.q37.fn(spark, sf).collect()
    val after4 = stagedDirs
    assert(after4 == after1,
      s"staged dirs grew: ${(after4 -- after1).mkString(", ")}")
    // runToTable drops its memory-sink view once the result is
    // resolved. The views live on the DEDICATED stream session (its
    // temp views are invisible to the parent), so the assertion must
    // list THAT session's catalog — the parent's is trivially empty.
    val leaked = graft.queries.Streaming.streamSession(spark)
      .catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_sink_"))
    assert(leaked.isEmpty, s"leaked sink views: ${leaked.mkString(", ")}")
  }
}
