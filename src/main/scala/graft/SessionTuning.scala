package graft

import org.apache.spark.sql.SparkSession

/** Local-runtime tuning shared by the Bench / Verify / tools session
  * builders (round-21 optimization; guide §1 measurement + §7.3 thread
  * dumps identified both).
  *
  * These settings do not change what any query computes — they swap
  * slow LOCAL-MODE-ONLY code paths for the ones a real deployment
  * already runs:
  *
  *  - `spark.shuffle.sort.bypassMergeThreshold=1`: with the session's
  *    32 shuffle partitions every SQL exchange fell below the
  *    bypass-merge threshold (200) and used BypassMergeSortShuffleWriter,
  *    which opens ONE FILE PER REDUCER per map task (32×32 = 1024
  *    file creates per exchange, then merges and deletes them).
  *    Thread-dump sampling of the q41 probe family showed executor
  *    tasks RUNNABLE in `FileOutputStream.open0` /
  *    `copyFileStreamNIO` — file churn, not data. At cluster scale
  *    shuffle.partitions exceeds 200, so production exchanges run the
  *    serialized (Unsafe) sort writer — one spill file + index per map
  *    task — already; this makes local mode run the same writer.
  *    Measured (isolated, n=4, same window): q41o 9.6 s → 7.6 s.
  *
  *  - `fs.file.impl=graft.hadoop.NioLocalFileSystem`: without
  *    libhadoop.so, Hadoop's RawLocalFileSystem forks a `chmod`
  *    SUBPROCESS per created file (and the default LocalFileSystem
  *    additionally writes a `.crc` sibling per file). Every parquet
  *    write, streaming state/offset/commit log, and staged refresh
  *    paid a fork per file. The NIO subclass makes the same syscall
  *    libhadoop's native path makes. Measured (isolated, n=4, same
  *    window): q41o 7.6 s → 6.0 s on top of the writer switch.
  *
  * Both are overridable via env for A/B measurement
  * (SPARK_GRAFT_BYPASS_THRESHOLD / SPARK_GRAFT_LOCAL_FS=default).
  */
object SessionTuning {
  def apply(b: SparkSession.Builder): SparkSession.Builder = {
    val bypass = sys.env.getOrElse("SPARK_GRAFT_BYPASS_THRESHOLD", "1")
    val b2 = b.config("spark.shuffle.sort.bypassMergeThreshold", bypass)
    if (sys.env.getOrElse("SPARK_GRAFT_LOCAL_FS", "nio") == "nio")
      b2.config("spark.hadoop.fs.file.impl",
        classOf[graft.hadoop.NioLocalFileSystem].getName)
    else b2
  }
}
