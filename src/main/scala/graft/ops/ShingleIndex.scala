package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the cross-corpus near-dup operator's corpus side
  * (round-17 verdict item 4 — the q41h-fingerprint-table shape for
  * q41k): at 100 TB the corpus's hashed-shingle relation is BUILT
  * ONCE — one shingling pass over the corpus, (doc, sh) plus its
  * per-shingle document-frequency rollup (sh, ce) — and then every
  * arriving batch probes it; re-shingling the whole corpus per batch
  * (what a bare `incrementalNearDup` call does) was the measured
  * super-linear wall of the 100× SCALING rung.
  *
  * At-rest format: two parquet relations under one root —
  * `<path>/shingles` (doc BIGINT, sh BIGINT) and `<path>/df`
  * (sh BIGINT, ce BIGINT). xxhash64 values round-trip parquet
  * bit-exactly, so a loaded artifact reproduces the inline build's
  * blocking decisions and verdicts to the bit (ShingleIndexSpec pins
  * operator-output equality; the q41l driver entry hash-checks the
  * whole pipeline against q41k's oracle SQL).
  *
  * Scale notes: the shingle relation is the corpus's DISTINCT
  * (doc, bigram-hash) pairs — ~tokens-per-doc rows per doc, 16
  * bytes each; the df rollup is one row per distinct shingle. Both
  * partition like any parquet relation; a production deployment
  * would additionally bucket `shingles` by `sh` so the per-batch
  * candidate join reads co-located buckets without shuffling the
  * corpus side (the q50 bucketed-join discipline — the artifact's
  * schema already supports it, the local scratch skips the metastore
  * dependency). Delta maintenance is append-shaped: new corpus docs
  * append their (doc, sh) rows and the df rollup merges by sum.
  */
object ShingleIndex {

  /** Build the artifact from `corpus` and write it under `path`. */
  def save(corpus: DataFrame, idCol: String, textCol: String, k: Int,
      path: String): Unit = {
    val shE = Dedup.wordShingles(Dedup.spreadToCores(corpus), idCol,
        textCol, k)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    shE.write.mode("overwrite").parquet(s"$path/shingles")
    shE.groupBy("sh").agg(count(lit(1)).as("ce"))
      .write.mode("overwrite").parquet(s"$path/df")
    graft.CheckpointJanitor.dropNow(shE)
  }

  /** Lazy readers over a saved artifact. */
  def load(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/df"))

  /** Load `path` when it already holds the artifact, else build from
    * `corpus` and save. The check reads only the path listing. */
  def buildOrLoad(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, k: Int, path: String): (DataFrame, DataFrame) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/df")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      save(corpus, idCol, textCol, k, path)
    load(spark, path)
  }
}
