package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (BASELINE.md): times every declared query at the
  * given scale factor (median of 3 runs each) and prints ONE JSON line
  * `{"metric":…,"value":total,"unit":"sec","queries":{…},"sf":…}`. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup: JIT/codegen/file-listing paths out of the timings
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    // optional comma-separated query filter for focused iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      var failed = false
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // a crashing query must not masquerade as a fast success
      val med = if (failed) -1.0 else times(times.length / 2)
      (name, med, times.head, times.last)
    }
    val qs = results.map { case (k, med, _, _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    // min/median/max per query: makes cold-vs-warm spread visible so a
    // single outlier run can't masquerade as a regression (or a win)
    val st = results.map { case (k, med, mn, mx) =>
      "\"" + k + "\":{\"min\":" + mn + ",\"med\":" + med + ",\"max\":" + mx + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"stats":$st,"sf":"$sfDir"}"""
    println(json)
    // The single ~9 KB stdout line gets truncated by log-tail capture;
    // persist the same JSON to a file so the numbers always survive.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "tmp/bench_out.json"))
    Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(outPath,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
