package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryProgress, Trigger}

/** 100×-shaped state-size law for the stream-stream joins (round-17
  * verdict item 5): under RocksDB, peak join state must track the
  * WATERMARK HORIZON (lag + join interval), not total input. Two
  * sweeps over the q48c-shaped left-outer interval self-join:
  *   - slice sweep at fixed 10-min lag: 12 → 120 30-min slices (10×
  *     the input, identically shaped) — peak state rows must stay
  *     FLAT;
  *   - lag sweep at fixed 120 slices: 5 → 10 → 40 → 80-min lag —
  *     peak state must grow ∝ horizon and stay ≪ input.
  * Reports numRowsTotal and RocksDB memoryUsedBytes from the
  * StreamingQueryProgress state operators.
  *
  * Usage: runMain graft.tools.StreamStateProbe
  */
object StreamStateProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val perSlice = 400
    def writeSlices(dir: String, slices: Int): Unit = {
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

    def joined(dir: String, lagMin: Int): DataFrame = {
      val sch = spark.read.parquet(dir).schema
      def src = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(dir)
      val a = src.withWatermark("ts", s"$lagMin minutes")
        .select($"user_id", $"ts".as("ts_a"))
      val b = src.withWatermark("ts", s"$lagMin minutes")
        .select($"user_id".as("user_b"), $"ts".as("ts_b"))
      a.join(b, $"user_id" === $"user_b" &&
        $"ts_b" > $"ts_a" && $"ts_b" <= $"ts_a" + expr("INTERVAL 5 MINUTES"),
        "left_outer")
    }

    var n = 0
    def run(df: DataFrame): (Long, Seq[StreamingQueryProgress]) = {
      n += 1
      val name = s"probe_sink_$n"
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
      val q = df.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val progress = q.recentProgress.toSeq
      val rows = spark.table(name).count()
      spark.catalog.dropTempView(name)
      (rows, progress)
    }

    def peak(ps: Seq[StreamingQueryProgress]): (Long, Long) = (
      ps.flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).maxOption.getOrElse(0L),
      ps.flatMap(_.stateOperators.toSeq).map(_.memoryUsedBytes).maxOption.getOrElse(0L))

    val root = java.nio.file.Files.createTempDirectory("graft_sstate").toString
    writeSlices(s"$root/s12", 12)
    writeSlices(s"$root/s120", 120)

    for ((label, dir, lag) <- Seq(
        ("slices=12 lag=10m", s"$root/s12", 10),
        ("slices=120 lag=10m", s"$root/s120", 10),
        ("slices=120 lag=5m", s"$root/s120", 5),
        ("slices=120 lag=40m", s"$root/s120", 40),
        ("slices=120 lag=80m", s"$root/s120", 80))) {
      val t0 = System.nanoTime()
      val (rows, ps) = run(joined(dir, lag))
      val wall = (System.nanoTime() - t0) / 1e9
      val (sRows, sMem) = peak(ps)
      val input = dir.split("/").last match {
        case "s12" => 12 * perSlice * 2; case _ => 120 * perSlice * 2 }
      println(f"[streamstate] $label out_rows=$rows peak_state_rows=$sRows " +
        f"(input_rows=$input) peak_state_mem=${sMem / 1024}KiB " +
        f"triggers=${ps.length} wall=$wall%.1fs")
    }
    spark.stop()
  }
}
