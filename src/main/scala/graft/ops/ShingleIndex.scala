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
  * would additionally bucket the relations per access key —
  * [[saveBucketed]] implements that layout and q41m exercises it.
  * Delta maintenance is append-shaped — [[append]] implements it and
  * q41n exercises the probe → accept → append → probe lifecycle.
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

  /** Lazy readers over a saved artifact. Heals an interrupted
    * [[append]] df swap first: if the rollup dir is missing but a
    * committed `df_next` exists, the crash happened between the swap's
    * delete and rename — `df_next` is complete by construction (it
    * commits BEFORE the delete), so finishing the rename restores the
    * artifact instead of failing on a missing path. */
  def load(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    healDfSwap(spark, path)
    (spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/df"))
  }

  private def healDfSwap(spark: SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = new org.apache.hadoop.fs.Path(s"$path/df")
    val next = new org.apache.hadoop.fs.Path(s"$path/df_next")
    if (!fs.exists(new org.apache.hadoop.fs.Path(df, "_SUCCESS")) &&
        fs.exists(new org.apache.hadoop.fs.Path(next, "_SUCCESS"))) {
      fs.delete(df, true) // clear any uncommitted debris
      require(fs.rename(next, df), s"df rollup swap recovery failed under $path")
    }
  }

  /** Delta maintenance — fold `newDocs` (e.g. the docs a probe just
    * ACCEPTED into the corpus) into a saved artifact: their (doc, sh)
    * rows append to the shingle relation, and the df rollup merges by
    * sum (counts are additive — df counts distinct (doc, sh) rows and
    * the new doc ids are new). One shingling pass over the DELTA, a
    * rollup-sized merge, zero corpus re-reads of text: the maintenance
    * cost a 100 TB deployment pays per accepted batch.
    *
    * The df merge lands via write-new + directory swap (the rollup is
    * read while being replaced, so in-place overwrite would corrupt
    * it); a crash inside the swap's delete→rename window is healed on
    * the next [[load]] (`df_next` commits before the delete, so
    * finishing the rename restores it). The two RELATIONS still do not
    * update atomically: a crash between the shingle append and the df
    * swap leaves counts behind the shingle rows (blocking then sees
    * slightly-low df — conservative, more candidates, same verdicts'
    * correctness envelope — and the gap persists until a rebuild). A
    * production deployment wraps both writes in the q46 stage-and-swap
    * generation pattern or a transactional table format;
    * ShingleIndexSpec pins append ≡ rebuild-from-union on the happy
    * path and the swap-crash recovery.
    *
    * `newDocs` ids must be NEW — re-appending a doc would silently
    * double its (doc, sh) rows and df counts, corrupting Jaccard
    * verdicts — so overlap fails fast. The guard costs one doc-column
    * pass over the artifact (column-pruned parquet read); a deployment
    * that tracks accepted ids elsewhere can pre-screen instead. */
  def append(spark: SparkSession, newDocs: DataFrame, idCol: String,
      textCol: String, k: Int, path: String): Unit = {
    val shA = Dedup.wordShingles(Dedup.spreadToCores(newDocs), idCol,
        textCol, k)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    val dup = spark.read.parquet(s"$path/shingles").select("doc")
      .join(shA.select("doc").distinct(), Seq("doc"), "left_semi")
      .limit(1).count()
    require(dup == 0L,
      s"append would double-count: newDocs contains doc ids already in $path")
    shA.write.mode("append").parquet(s"$path/shingles")
    val merged = spark.read.parquet(s"$path/df")
      .join(shA.groupBy("sh").agg(count(lit(1)).as("ca")),
        Seq("sh"), "full_outer")
      .select(col("sh"),
        (coalesce(col("ce"), lit(0L)) + coalesce(col("ca"), lit(0L))).as("ce"))
    merged.write.mode("overwrite").parquet(s"$path/df_next")
    graft.CheckpointJanitor.dropNow(shA)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/df"), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$path/df_next"),
      new org.apache.hadoop.fs.Path(s"$path/df")),
      s"df rollup swap failed under $path")
  }

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

  /** Bucket count of the BUCKETED artifact layout ([[saveBucketed]]).
    * Matches the session shuffle parallelism at bench scale; a 100 TB
    * deployment picks buckets so one bucket ≈ a healthy scan-partition
    * size (the q50 discipline). */
  val Buckets = 32

  /** Collision-safe catalog table name for `dir`'s bucketed artifact:
    * the sanitized dir alone can collide (".../sf0.1" and ".../sf0_1"
    * both sanitize to sf0_1 — the second caller would silently probe
    * the first corpus), so the raw dir's hash rides along. */
  def tableFor(prefix: String, dir: String): String =
    prefix + "_" + dir.replaceAll("[^a-zA-Z0-9]", "_") +
      "_" + java.lang.Integer.toHexString(dir.hashCode)

  /** The big-batch at-rest layout: THREE relations in the session
    * catalog — the (doc, sh) relation bucketed+sorted by `sh`
    * (`_sh`), a second copy bucketed+sorted by `doc` (`_doc`), and
    * the df rollup bucketed by `sh` (`_df`).
    *
    * Why it exists: the plain [[save]] layout is enough when a batch's
    * rare-shingle relation broadcasts — the candidate probe then scans
    * the corpus artifact once with no shuffle on either side. But a
    * big batch (TBs of fresh crawl against a 100 TB corpus) has a
    * rare-shingle set far past broadcast size, so the probe joins
    * become shuffle joins — and with the corpus relation stored flat,
    * EVERY batch re-shuffles the whole corpus on the probe keys.
    * Bucketing pays each shuffle ONCE at build time, per ACCESS KEY:
    * the rare-shingle probe and the df sum join through `sh` (the
    * `_sh`/`_df` copies), while the candidate-fetch semi join — pull
    * every shingle of the corpus docs that blocked against the batch —
    * joins through `doc` (the `_doc` copy; one sh-bucketed copy alone
    * leaves that fetch re-shuffling the corpus by doc per batch, the
    * measured 10×-corpus term in ShingleBucketProbe). With all three
    * in place only batch-sized relations move per batch
    * (ShingleIndexSpec pins the corpus side exchange-free under a
    * disabled broadcast threshold — the q50/q14c discipline applied
    * to the dedup artifact; SCALING.md records the fixed-batch
    * shuffle-volume law). Storage cost: 2× the 16-byte (doc, sh)
    * rows — the price of shuffle-free access on both keys. */
  def saveBucketed(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, k: Int, table: String,
      buckets: Int = Buckets): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft")
    val shE = Dedup.wordShingles(Dedup.spreadToCores(corpus), idCol,
        textCol, k)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    def materialize(name: String, df: DataFrame, key: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS graft.$name")
      // clear any stale location from a previous JVM: the in-memory
      // catalog forgets tables across sessions but the warehouse
      // directory persists (the Ingest.ensureBucketedTables pattern)
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, s"graft.db/$name")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(loc, true)
      df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, key).sortBy(key).saveAsTable(s"graft.$name")
    }
    materialize(s"${table}_sh", shE, "sh")
    materialize(s"${table}_doc", shE, "doc")
    materialize(s"${table}_df",
      shE.groupBy("sh").agg(count(lit(1)).as("ce")), "sh")
    graft.CheckpointJanitor.dropNow(shE)
  }

  /** Readers over a bucketed artifact — (shBySh, shByDoc, df). Plans
    * built on these carry the bucketed output partitioning, so a join
    * through the matching key skips the corpus-side exchange. */
  def loadBucketed(spark: SparkSession, table: String)
      : (DataFrame, DataFrame, DataFrame) =
    (spark.table(s"graft.${table}_sh"),
      spark.table(s"graft.${table}_doc"),
      spark.table(s"graft.${table}_df"))

  /** [[buildOrLoad]] for the bucketed layout: the existence check is
    * the catalog entry (all three tables present), so a fresh JVM over
    * a stale warehouse directory rebuilds rather than trusting files
    * the in-memory catalog no longer describes. */
  def buildOrLoadBucketed(spark: SparkSession, corpus: DataFrame,
      idCol: String, textCol: String, k: Int, table: String,
      buckets: Int = Buckets): (DataFrame, DataFrame, DataFrame) = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft")
    if (!spark.catalog.tableExists(s"graft.${table}_sh") ||
        !spark.catalog.tableExists(s"graft.${table}_doc") ||
        !spark.catalog.tableExists(s"graft.${table}_df"))
      saveBucketed(spark, corpus, idCol, textCol, k, table, buckets)
    loadBucketed(spark, table)
  }
}
