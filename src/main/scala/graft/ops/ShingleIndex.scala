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

  /** Build the artifact from `corpus` and write it under `path`.
    * Completion is recorded by an artifact-OWNED `_BUILT` marker, not
    * the committer's optional `_SUCCESS` files (round-18 advice: with
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` — common
    * on object stores — `_SUCCESS` never appears and a gate keyed on
    * it would rebuild on every call). */
  def save(corpus: DataFrame, idCol: String, textCol: String, k: Int,
      path: String): Unit = {
    val spark = corpus.sparkSession
    val shE = Dedup.wordShingles(Dedup.spreadToCores(corpus), idCol,
        textCol, k)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    shE.write.mode("overwrite").parquet(s"$path/shingles")
    shE.groupBy("sh").agg(count(lit(1)).as("ce"))
      .write.mode("overwrite").parquet(s"$path/df")
    graft.CheckpointJanitor.dropNow(shE)
    touch(spark, s"$path/_BUILT")
  }

  private def touch(spark: SparkSession, p: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hadoopFs(spark, hp).create(hp, true).close()
  }

  /** Lazy readers over a saved artifact. Heals a crashed [[append]]
    * first — from the append's own staged delta and markers, so a
    * reader never sees the shingle relation ahead of the df rollup
    * (stale-low df is NOT merely conservative: it reorders the
    * fallback generator's (df, shingle) ranking and can MISS matches,
    * not only admit extra candidates — round-18 advice). */
  def load(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    healPending(spark, path)
    (spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/df"))
  }

  /** Delta maintenance — fold `newDocs` (e.g. the docs a probe just
    * ACCEPTED into the corpus) into a saved artifact: their (doc, sh)
    * rows join the shingle relation, and the df rollup merges by sum
    * (counts are additive — df counts distinct (doc, sh) rows and the
    * new doc ids are new). One shingling pass over the DELTA, a
    * rollup-sized merge, zero corpus re-reads of text: the maintenance
    * cost a 100 TB deployment pays per accepted batch.
    *
    * Crash protocol (round-18 advice closed — the old two-commit form
    * was un-retryable and could leave df behind the shingle rows until
    * a rebuild). The delta commits to `delta_<T>` FIRST (T = a hash of
    * the delta's doc-id set, so a retry of the same accept derives the
    * same token), then a `pending_<T>` marker makes the append
    * resumable; from that point [[finishAppend]] is deterministic and
    * idempotent — token-prefixed FILE MOVES splice the staged delta
    * into the shingle relation (a re-run skips moves already made),
    * the merged df writes to `df_next` with an `_APPLIED_<T>` sentinel
    * riding INSIDE the directory and an artifact-owned
    * `df_next_COMMITTED` marker, and the swap finishes delete→rename.
    * A crash at ANY instant heals on the next [[load]] or [[append]]
    * ([[healPending]] re-drives `finishAppend` from the staged delta;
    * the sentinel inside df tells a healed swap from an un-merged df,
    * so the merge never double-applies). The two relations can still
    * be observed mid-append by a CONCURRENT reader (single-writer,
    * non-snapshot — the price of the flat layout); readers that need
    * old-XOR-new isolation use the LSM layout (q41o), whose pointer
    * swap is the q46 generation pattern.
    *
    * `newDocs` ids must be NEW — re-appending a doc would silently
    * double its (doc, sh) rows and df counts, corrupting Jaccard
    * verdicts — so overlap fails fast, EXCEPT when the batch is a
    * retry of an append that already landed: the token is derived
    * BEFORE the guard, and a batch whose `_APPLIED_<token>` sentinel
    * rides inside df AND whose docs are all present returns as a
    * no-op (round-19 advice — callers can now retry an accept
    * blindly; the old contract threw on a retried success and the
    * caller could not tell it from corruption; the window closes at
    * the NEXT append's df swap, after which a very late retry hits
    * the dup guard instead).
    *
    * Token derivation walks a DETERMINISTIC sequence seeded by the
    * delta's id-set XOR fold and uses the first token no OTHER append
    * owns — "owns" meaning token-prefixed files already spliced into
    * the shingle relation, or a sentinel whose docs are not this
    * batch's. A colliding token is therefore never REUSED: the old
    * protocol deleted the colliding sentinel and proceeded under the
    * same token, and the df merge's `<token>-*` glob then re-counted
    * the OLD batch's spliced files — a 2^-64 silent-corruption
    * window (round-20 review). The walk is retry-stable: a retry sees
    * the same ownership state, skips the same tokens, and lands on
    * its own sentinel. The guard costs one doc-column pass over the
    * artifact (column-pruned parquet read) and runs AFTER healing, so
    * a crashed self-append can never masquerade as a double-append. */
  def append(spark: SparkSession, newDocs: DataFrame, idCol: String,
      textCol: String, k: Int, path: String): Unit = {
    healPending(spark, path) // finish any crashed append first
    sweepOrphans(spark, path) // writer-side only — see healPending doc
    val shA = Dedup.wordShingles(Dedup.spreadToCores(newDocs), idCol,
        textCol, k)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    val ids = shA.select("doc").distinct()
    // deterministic token seed from the delta's id set
    // (order-independent XOR fold — a plain sum overflows int64 under
    // ANSI): a retried accept of the same batch derives the same
    // sequence and heals as itself
    val idFold = ids.agg(bit_xor(xxhash64(col("doc")))).head()
    if (idFold.isNullAt(0)) { // empty delta — nothing to fold in
      graft.CheckpointJanitor.dropNow(shA)
      return
    }
    val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(path))
    val shinglesDir = new org.apache.hadoop.fs.Path(s"$path/shingles")
    val splicedNames = fs.listStatus(shinglesDir).map(_.getPath.getName)
    // lazily evaluated at most once: are ALL batch docs already in the
    // artifact (the retried-success signature)?
    lazy val allPresent = ids.join(
        spark.read.parquet(s"$path/shingles").select("doc"),
        Seq("doc"), "left_anti")
      .limit(1).count() == 0L
    var fold = idFold.getLong(0)
    var token: String = null
    var attempts = 0
    while (token == null) {
      require(attempts < 64, s"token walk did not terminate under $path")
      val t = java.lang.Long.toHexString(fold)
      val sentinel = fs.exists(
        new org.apache.hadoop.fs.Path(s"$path/df/_APPLIED_$t"))
      if (sentinel && allPresent) { // retried accept — already landed
        graft.CheckpointJanitor.dropNow(shA)
        return
      }
      if (!sentinel && !splicedNames.exists(_.startsWith(t + "-")))
        token = t // unowned — ours
      else { // owned by an earlier append: deterministic remix
        fold = java.lang.Long.rotateLeft(fold, 31) * 0x9E3779B97F4A7C15L + 1L
        attempts += 1
      }
    }
    val dup = spark.read.parquet(s"$path/shingles").select("doc")
      .join(ids, Seq("doc"), "left_semi")
      .limit(1).count()
    require(dup == 0L,
      s"append would double-count: newDocs contains doc ids already in $path")
    shA.write.mode("overwrite").parquet(s"$path/delta_$token")
    graft.CheckpointJanitor.dropNow(shA)
    touch(spark, s"$path/pending_$token")
    finishAppend(spark, path, token)
  }

  /** The resumable tail of [[append]] — every step idempotent, driven
    * from the committed `delta_<token>` dir alone. */
  private def finishAppend(spark: SparkSession, path: String,
      token: String): Unit = {
    val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(path))
    val applied = new org.apache.hadoop.fs.Path(s"$path/df/_APPLIED_$token")
    if (!fs.exists(applied)) {
      // 1. splice the staged delta into the shingle relation by FILE
      // MOVE under token-prefixed names — re-runs skip moved files
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/delta_$token"))
        .filter(_.getPath.getName.endsWith(".parquet"))
        .foreach { st =>
          val dst = new org.apache.hadoop.fs.Path(
            s"$path/shingles/$token-${st.getPath.getName}")
          // tolerate a concurrent healer winning the same move (a
          // reader healing the pending append we are finishing): a
          // failed rename is fine iff the destination exists
          if (!fs.exists(dst) && !fs.rename(st.getPath, dst))
            require(fs.exists(dst),
              s"delta splice failed: ${st.getPath} -> $dst")
        }
      // 2. merged rollup → df_next (+ the applied sentinel riding
      // inside, so a completed swap is self-describing), then the
      // committed marker gating the swap
      val committed = new org.apache.hadoop.fs.Path(
        s"$path/df_next_COMMITTED")
      if (!fs.exists(committed)) {
        val delta = spark.read.parquet(s"$path/shingles/$token-*.parquet")
        spark.read.parquet(s"$path/df")
          .join(delta.groupBy("sh").agg(count(lit(1)).as("ca")),
            Seq("sh"), "full_outer")
          .select(col("sh"),
            (coalesce(col("ce"), lit(0L)) + coalesce(col("ca"), lit(0L))).as("ce"))
          .write.mode("overwrite").parquet(s"$path/df_next")
        touch(spark, s"$path/df_next/_APPLIED_$token")
        touch(spark, s"$path/df_next_COMMITTED")
      }
      // 3. swap: delete old, rename — healable because df_next is
      // complete (the marker precedes the delete)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/df"), true)
      require(fs.rename(new org.apache.hadoop.fs.Path(s"$path/df_next"),
        new org.apache.hadoop.fs.Path(s"$path/df")),
        s"df rollup swap failed under $path")
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/df_next_COMMITTED"), false)
    }
    // 4. cleanup — marker first, so a crash here leaves only an
    // unreferenced delta dir (GC'd by the next heal). The committed
    // marker may survive a crash after the rename — sweep it too.
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/df_next_COMMITTED"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/pending_$token"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/delta_$token"), true)
  }

  /** Finish a crashed [[append]], whatever instant it died at. Keyed
    * entirely on artifact-owned markers (never the committer's
    * `_SUCCESS`). NON-DESTRUCTIVE — safe from the read path: a
    * pending marker guarantees its delta is complete, so completing
    * the splice can never lose data. Debris sweeping is the WRITER's
    * job ([[sweepOrphans]]): a reader deleting an unmarked delta dir
    * would race the single writer in its window between the delta
    * write and the pending touch, silently discarding an in-flight
    * append (round-20 review). */
  private def healPending(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopFs(spark, root)
    if (!fs.exists(root)) return
    val names = fs.listStatus(root).map(_.getPath.getName)
    val pending = names.filter(_.startsWith("pending_"))
      .map(_.stripPrefix("pending_"))
    pending.foreach { token =>
      // a committed-but-unrenamed df_next may hold the only complete
      // rollup (the crash window between delete and rename): restore it
      // before re-driving the tail
      val committed = new org.apache.hadoop.fs.Path(s"$path/df_next_COMMITTED")
      val df = new org.apache.hadoop.fs.Path(s"$path/df")
      if (fs.exists(committed) && !fs.exists(df)) {
        require(fs.rename(new org.apache.hadoop.fs.Path(s"$path/df_next"), df),
          s"df rollup swap recovery failed under $path")
        fs.delete(committed, false)
      }
      finishAppend(spark, path, token)
    }
  }

  /** Sweep staging dirs whose pending marker never landed (crash
    * before the marker) or is gone (crash mid-cleanup). Run ONLY from
    * [[append]] — single-writer means no sibling append is in its
    * pre-marker window when this runs. */
  private def sweepOrphans(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopFs(spark, root)
    if (!fs.exists(root)) return
    val names = fs.listStatus(root).map(_.getPath.getName)
    val pending = names.filter(_.startsWith("pending_"))
      .map(_.stripPrefix("pending_"))
    names.filter(_.startsWith("delta_"))
      .map(_.stripPrefix("delta_"))
      .filterNot(pending.contains)
      .foreach(t => fs.delete(new org.apache.hadoop.fs.Path(s"$path/delta_$t"), true))
  }

  /** Load `path` when it already holds the artifact, else build from
    * `corpus` and save. Gated on the artifact-owned `_BUILT` marker
    * (see [[save]]), never the committer's `_SUCCESS`. */
  def buildOrLoad(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, k: Int, path: String): (DataFrame, DataFrame) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_BUILT")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
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
  /** The directory every bucketed artifact table lives under —
    * recorded in the LSM manifest so a catalog that lost its entries
    * can be healed from the manifest alone ([[healCatalog]]). */
  private def tableDir(spark: SparkSession): String =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, "graft.db").toString

  /** (Re)create catalog table `graft.$name` bucketed+sorted by `key`,
    * as an EXTERNAL table at the artifact-owned location (round-20:
    * the manifest is the source of truth for WHICH tables exist, so
    * the table DATA must not be coupled to the catalog entry's
    * lifetime — a lost/dropped catalog entry re-registers over the
    * surviving files instead of having deleted them). DROP + an
    * explicit location delete first: the in-memory catalog forgets
    * tables across sessions but the warehouse directory persists (the
    * Ingest.ensureBucketedTables pattern) — and a crashed LSM
    * append's ORPHAN tables get overwritten the same way when the
    * retry re-allocates their names. */
  private def materialize(spark: SparkSession, name: String,
      df: DataFrame, key: String, buckets: Int,
      dir: String = ""): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS graft.$name")
    val at = if (dir.nonEmpty) dir else tableDir(spark)
    val loc = new org.apache.hadoop.fs.Path(at, name)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .option("path", loc.toString)
      .bucketBy(buckets, key).sortBy(key).saveAsTable(s"graft.$name")
  }

  def saveBucketed(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, k: Int, table: String,
      buckets: Int = Buckets): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft")
    val shE = Dedup.wordShingles(Dedup.spreadToCores(corpus), idCol,
        textCol, k)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    materialize(spark, s"${table}_sh", shE, "sh", buckets)
    materialize(spark, s"${table}_doc", shE, "doc", buckets)
    materialize(spark, s"${table}_df",
      shE.groupBy("sh").agg(count(lit(1)).as("ce")), "sh", buckets)
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

  // ------------------- LSM bucketed layout (q41o) -------------------
  //
  // The BUCKETED layout above survives big batches but could only be
  // rebuilt whole — three corpus-sized shuffles per accepted batch.
  // The LSM layout makes the bucketed artifact MAINTAINABLE: the
  // (doc, sh) relation lives as IMMUTABLE SEGMENTS (each a bucketed
  // _sh/_doc table pair — delta-sized after the base), the df rollup
  // as one table REWRITTEN per generation (rollup-sized — one row per
  // distinct shingle, the only sublinear-but-growing term), and a
  // MANIFEST file names the exact tables of a generation. The pointer
  // file `CURRENT` is the single commit point (StagedRefresh
  // .swapPointer — the q46 stage-and-swap pattern): a writer killed
  // any instant before the swap leaves readers on the old generation
  // with df and shingles CONSISTENT — the cross-relation atomicity the
  // flat [[append]] documents away. Orphan tables from a crashed
  // append are invisible (no manifest names them) and are overwritten
  // by the retry / dropped by the next GC, so a crashed append is
  // RETRYABLE — the overlap guard reads the manifest's segments, never
  // the orphans. Probes run per segment (Dedup
  // .incrementalNearDupSegmented): a segment UNION would erase the
  // bucketed partitioning, so each corpus-sized join instead meets its
  // segment pre-bucketed and only batch-sized relations shuffle —
  // the q41m shuffle law, now preserved across appends. Segment count
  // grows per accept; [[compactLsm]] folds all segments into one on
  // the deployment's cadence (one corpus-sized rewrite amortized over
  // many appends — the LSM compaction trade).
  //
  // The manifest/pointer live on the filesystem while the tables live
  // in the session catalog; a production deployment uses a persistent
  // metastore so both survive the JVM (in-repo, entries rebuild per
  // JVM like every buildOrLoadBucketed caller).

  /** One immutable LSM segment: the table prefix (names `<p>_sh` /
    * `<p>_doc`) plus its doc-id SUMMARY — distinct-doc count and id
    * range — carried in the manifest so [[appendLsm]]'s overlap guard
    * can skip whole segments without reading them (round-19 verdict:
    * the guard's column-pruned doc scan was the last
    * corpus-proportional read in the append path; with monotone
    * accept ids — the crawl shape — every segment is range-disjoint
    * from a new batch and the guard reads only the manifest).
    * `docs < 0` marks a summary-less segment (a pre-summary manifest):
    * the guard falls back to scanning it. */
  final case class LsmSegment(prefix: String, docs: Long, minDoc: Long,
      maxDoc: Long) {
    def overlaps(lo: Long, hi: Long): Boolean =
      docs < 0L || (docs > 0L && minDoc <= hi && lo <= maxDoc)
  }

  /** One LSM generation: bucket count, the df rollup table, the
    * immutable segments, and the directory the tables live under
    * (recorded so [[healCatalog]] can re-register a lost catalog from
    * the manifest alone; empty in pre-round-20 manifests — the
    * current warehouse derives it). */
  final case class LsmManifest(gen: Long, buckets: Int, dfTable: String,
      segments: Seq[LsmSegment], tablesAt: String = "")

  private val LsmPointer = "CURRENT"

  /** The directory an existing generation's tables live under — the
    * manifest's record when present (the artifact-owned location that
    * survives warehouse reconfiguration), else the current session's
    * warehouse (pre-round-20 manifests). New tables of a maintained
    * artifact MUST land here, not at the session warehouse: a
    * maintenance session with a different `spark.sql.warehouse.dir`
    * would otherwise split one generation across two directories and
    * strand the inherited tables (round-20 review). */
  private def artifactDir(spark: SparkSession, m: LsmManifest): String =
    if (m.tablesAt.nonEmpty) m.tablesAt else tableDir(spark)

  private def hadoopFs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeManifest(spark: SparkSession, root: String,
      m: LsmManifest): Unit = {
    val dir = new org.apache.hadoop.fs.Path(root, s"gen-${m.gen}")
    val fs = hadoopFs(spark, dir)
    fs.delete(dir, true) // clear a crashed prior attempt at this gen
    fs.mkdirs(dir)
    val text = (s"buckets=${m.buckets}" +: s"df=${m.dfTable}" +:
      s"tabledir=${m.tablesAt}" +:
      m.segments.map(s =>
        s"seg=${s.prefix}:${s.docs}:${s.minDoc}:${s.maxDoc}")).mkString("\n")
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "MANIFEST"), true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readManifest(spark: SparkSession, root: String,
      gen: String): LsmManifest = {
    val p = new org.apache.hadoop.fs.Path(root, s"$gen/MANIFEST")
    val in = hadoopFs(spark, p).open(p)
    val lines = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
    finally in.close()
    def one(k: String) = lines.collectFirst {
      case l if l.startsWith(k + "=") => l.stripPrefix(k + "=") }.get
    LsmManifest(gen.stripPrefix("gen-").toLong, one("buckets").toInt,
      one("df"), lines.collect { case l if l.startsWith("seg=") =>
        l.stripPrefix("seg=").split(':') match {
          case Array(p, d, lo, hi) =>
            LsmSegment(p, d.toLong, lo.toLong, hi.toLong)
          // pre-summary manifest line: no stats — guard scans it
          case Array(p) => LsmSegment(p, -1L, Long.MinValue, Long.MaxValue)
        } },
      lines.collectFirst { case l if l.startsWith("tabledir=") =>
        l.stripPrefix("tabledir=") }.getOrElse(""))
  }

  /** Distinct-doc count + id range of a staged (doc, sh) relation —
    * the summary [[appendLsm]] records per segment. One delta-sized
    * aggregate. */
  private def docSummary(sh: DataFrame): (Long, Long, Long) = {
    val r = sh.agg(count_distinct(col("doc")), min("doc"), max("doc")).head()
    if (r.isNullAt(1)) (0L, 0L, -1L) // empty relation: range below any id
    else (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** The live generation's manifest, if a build ever committed. */
  def currentManifest(spark: SparkSession, root: String): Option[LsmManifest] =
    StagedRefresh.readPointer(spark,
        new org.apache.hadoop.fs.Path(root), LsmPointer)
      .map(readManifest(spark, root, _))

  /** Readers over the live generation: the per-segment (sh-bucketed,
    * doc-bucketed) pairs — feed them to
    * [[Dedup.incrementalNearDupSegmented]] — plus the merged df. */
  def loadLsm(spark: SparkSession, root: String)
      : (Seq[(DataFrame, DataFrame)], DataFrame) = {
    val m = currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed LSM generation under $root (pointer absent)"))
    healCatalog(spark, m, root)
    (m.segments.map(sg =>
        (spark.table(s"graft.${sg.prefix}_sh"),
          spark.table(s"graft.${sg.prefix}_doc"))),
      spark.table(s"graft.${m.dfTable}"))
  }

  /** [[loadLsm]] with MERGE hints on every corpus relation — the
    * too-big-to-broadcast planner state the q41o/q41p/q101 entries
    * model (one shared helper so the three LSM entries cannot
    * silently diverge in join strategy). */
  def loadLsmHinted(spark: SparkSession, root: String)
      : (Seq[(DataFrame, DataFrame)], DataFrame) = {
    val (segs, dfE) = loadLsm(spark, root)
    (segs.map { case (sh, doc) => (sh.hint("merge"), doc.hint("merge")) },
      dfE.hint("merge"))
  }

  /** Build generation 1 from `corpus`: one base segment + its df. */
  def saveLsm(spark: SparkSession, corpus: DataFrame, idCol: String,
      textCol: String, k: Int, root: String, base: String,
      buckets: Int = Buckets): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft")
    val shE = Dedup.wordShingles(Dedup.spreadToCores(corpus), idCol,
        textCol, k)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    val prefix = s"${base}_s1"
    materialize(spark, s"${prefix}_sh", shE, "sh", buckets)
    materialize(spark, s"${prefix}_doc", shE, "doc", buckets)
    materialize(spark, s"${base}_g1_df",
      shE.groupBy("sh").agg(count(lit(1)).as("ce")), "sh", buckets)
    val (nDocs, lo, hi) = docSummary(shE)
    graft.CheckpointJanitor.dropNow(shE)
    val m = LsmManifest(1L, buckets, s"${base}_g1_df",
      Seq(LsmSegment(prefix, nDocs, lo, hi)), tableDir(spark))
    writeManifest(spark, root, m)
    StagedRefresh.swapPointer(spark,
      new org.apache.hadoop.fs.Path(root), LsmPointer, "gen-1")
  }

  /** Fold `newDocs` into the live generation as a NEW immutable
    * segment: one shingling pass over the DELTA (two delta-sized
    * bucketed writes — the next appends' probes meet the delta
    * pre-bucketed too), a rollup-sized df merge into the next
    * generation's df table, then the atomic pointer swap. The corpus
    * text is never re-read and no existing table is touched, so the
    * per-accept cost is delta-sized + the df merge. `hook` is the
    * crash-injection seam ("staged" = everything written, pointer not
    * swapped; "swapped" = committed, GC pending); a crash at either
    * point leaves a consistent artifact — old XOR new — and the append
    * is safely retryable (orphans are overwritten, the dup guard reads
    * only manifest segments). */
  def appendLsm(spark: SparkSession, newDocs: DataFrame, idCol: String,
      textCol: String, k: Int, root: String, base: String,
      hook: String => Unit = _ => ()): Unit = {
    val m = currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(
        s"appendLsm needs a committed generation under $root"))
    healCatalog(spark, m, root)
    val shA = Dedup.wordShingles(Dedup.spreadToCores(newDocs), idCol,
        textCol, k)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    // fail fast on re-appended ids (they would double df counts and
    // corrupt Jaccard verdicts). The guard consults the manifest's
    // per-segment doc-id summaries FIRST: segments whose id range is
    // disjoint from the batch's cannot hold a duplicate and are
    // skipped without a read — with monotone accept ids (the crawl
    // shape) that is EVERY segment, so the guard costs one manifest
    // read + a delta-sized aggregate (round-19 verdict item 4: the
    // column-pruned doc scan of every live segment was the append's
    // last corpus-proportional term). Range-overlapping segments keep
    // the column-pruned scan as the exact fallback. Runs over LIVE
    // segments only, so a crashed self-append's orphan rows can never
    // make the retry look like a double-append.
    val (nDocs, bLo, bHi) = docSummary(shA)
    if (nDocs == 0L) { // empty delta — nothing to fold in
      graft.CheckpointJanitor.dropNow(shA)
      return
    }
    val suspect = m.segments.filter(_.overlaps(bLo, bHi))
    if (suspect.nonEmpty) {
      val dup = suspect.map(sg =>
          spark.table(s"graft.${sg.prefix}_doc").select("doc"))
        .reduce(_ unionByName _)
        .join(shA.select("doc").distinct(), Seq("doc"), "left_semi")
        .limit(1).count()
      require(dup == 0L,
        s"appendLsm would double-count: newDocs contains doc ids already live under $root")
    }
    val segId = m.segments.map(_.prefix.stripPrefix(s"${base}_s").toLong).max + 1
    val prefix = s"${base}_s$segId"
    val dir = artifactDir(spark, m) // one generation, ONE directory
    materialize(spark, s"${prefix}_sh", shA, "sh", m.buckets, dir)
    materialize(spark, s"${prefix}_doc", shA, "doc", m.buckets, dir)
    val gen = m.gen + 1
    val dfTable = s"${base}_g${gen}_df"
    val merged = spark.table(s"graft.${m.dfTable}")
      .join(shA.groupBy("sh").agg(count(lit(1)).as("ca")),
        Seq("sh"), "full_outer")
      .select(col("sh"),
        (coalesce(col("ce"), lit(0L)) + coalesce(col("ca"), lit(0L))).as("ce"))
    materialize(spark, dfTable, merged, "sh", m.buckets, dir)
    graft.CheckpointJanitor.dropNow(shA)
    val m2 = LsmManifest(gen, m.buckets, dfTable,
      m.segments :+ LsmSegment(prefix, nDocs, bLo, bHi), dir)
    writeManifest(spark, root, m2)
    hook("staged")
    StagedRefresh.swapPointer(spark,
      new org.apache.hadoop.fs.Path(root), LsmPointer, s"gen-$gen")
    hook("swapped")
    gcLsm(spark, root, base, dir,
      keepTables = lsmTables(m2) ++ lsmTables(m),
      keepGens = Set(s"gen-$gen", s"gen-${m.gen}"))
  }

  /** DERIVED compaction trigger (round-19 verdict item 2 — the
    * `Pq.nprobeFor`/`Pq.LloydIters` discipline applied to the last
    * prose dial in the dedup lifecycle). For a compact-at-S policy
    * with one probe per accepted batch (the probe→accept→append
    * lifecycle's floor), the amortized per-append maintenance cost is
    * R/(S−1) + τ·S/2 — one corpus-sized rewrite R per S−1 appends,
    * plus the probe tax that accumulates as segments do (the probe at
    * s segments pays (s−1)·τ; averaged over the cycle that is
    * ~τ·S/2). Minimizing gives the standard LSM amortization optimum
    * (S−1)² = 2R/τ → **S* = 1 + √(2R/τ)**. Measured operating point
    * (ShingleBucketProbe, both corpus scales, round-20 clean epoch —
    * SCALING.md): R ∈ [4.2, 4.9] s (compaction wall), τ ∈
    * [0.68, 1.08] s per extra segment (probe wall deltas between the
    * 1-, 2- and 5-segment states) → S* ∈ [3.8, 4.7] → the integer
    * threshold **S* = 4**. At 100 TB the fixed per-segment plan
    * machinery that dominates toy-scale τ shrinks relative to W while
    * delta scans stay delta-sized, so real τ/R is SMALLER and the toy
    * S* is a floor — compacting at 4 is the aggressive end of
    * correct. [[compactLsm]] stays directly callable for deployments
    * that batch maintenance on a coarser schedule; `shouldCompact` is
    * the measured rule, and q41p compacts exactly when it fires. */
  val CompactAtSegments = 4

  /** True when the live generation's probe tax has reached the point
    * where one corpus-sized rewrite amortizes within a single probe —
    * see [[CompactAtSegments]] for the measured derivation. */
  def shouldCompact(m: LsmManifest): Boolean =
    m.segments.size >= CompactAtSegments

  /** Fold ALL live segments into one (the LSM compaction step, run
    * when [[shouldCompact]] fires — or on a coarser schedule for
    * deployments that batch maintenance): one corpus-sized rewrite
    * buys back single-segment probe plans after many appends. The df
    * rollup is already generation-merged, so the new manifest reuses
    * it unchanged; commit is the same old-XOR-new pointer swap. */
  def compactLsm(spark: SparkSession, root: String, base: String,
      hook: String => Unit = _ => ()): Unit = {
    val m = currentManifest(spark, root).getOrElse(
      throw new IllegalStateException(
        s"compactLsm needs a committed generation under $root"))
    healCatalog(spark, m, root)
    val all = m.segments.map(sg => spark.table(s"graft.${sg.prefix}_sh"))
      .reduce(_ unionByName _)
    val segId = m.segments.map(_.prefix.stripPrefix(s"${base}_s").toLong).max + 1
    val prefix = s"${base}_s$segId"
    val dir = artifactDir(spark, m) // one generation, ONE directory
    materialize(spark, s"${prefix}_sh", all, "sh", m.buckets, dir)
    materialize(spark, s"${prefix}_doc",
      spark.table(s"graft.${prefix}_sh"), "doc", m.buckets, dir)
    // folded summary: segments hold disjoint doc sets, so the merge is
    // exact arithmetic when every input carries stats; a pre-summary
    // segment forces one recount over the folded table
    val folded =
      if (m.segments.forall(_.docs >= 0L))
        (m.segments.map(_.docs).sum,
          m.segments.filter(_.docs > 0L).map(_.minDoc).minOption.getOrElse(0L),
          m.segments.filter(_.docs > 0L).map(_.maxDoc).maxOption.getOrElse(-1L))
      else docSummary(spark.table(s"graft.${prefix}_doc"))
    val gen = m.gen + 1
    val m2 = LsmManifest(gen, m.buckets, m.dfTable,
      Seq(LsmSegment(prefix, folded._1, folded._2, folded._3)), dir)
    writeManifest(spark, root, m2)
    hook("staged")
    StagedRefresh.swapPointer(spark,
      new org.apache.hadoop.fs.Path(root), LsmPointer, s"gen-$gen")
    hook("swapped")
    gcLsm(spark, root, base, dir,
      keepTables = lsmTables(m2) ++ lsmTables(m),
      keepGens = Set(s"gen-$gen", s"gen-${m.gen}"))
  }

  private def lsmTables(m: LsmManifest): Set[String] =
    m.segments.flatMap(sg =>
      Seq(s"${sg.prefix}_sh", s"${sg.prefix}_doc")).toSet + m.dfTable

  /** Re-register manifest-named tables missing from the session
    * catalog over their recorded locations — the metastore-divergence
    * heal (round-19 verdict item 5): the manifest/pointer live on the
    * filesystem while the tables live in the session catalog, so the
    * two stores CAN diverge (a fresh JVM over a persistent warehouse,
    * a dropped database, a metastore restore). The manifest is the
    * source of truth: tables are EXTERNAL at manifest-recorded
    * locations, so a lost catalog entry never deleted data and one
    * CREATE TABLE DDL per missing entry restores it — bucketing spec
    * included, so healed probes keep their exchange-free plans
    * (LsmShingleSpec pins plan + verdict equality after a full
    * catalog drop). An entry that EXISTS is validated against the
    * manifest's bucket spec and location and re-registered on
    * mismatch — a restored-from-backup metastore with a stale spec
    * would otherwise let Spark skip exchanges it needs, silently.
    * Files genuinely gone → a PRECISE error naming the generation and
    * table, instead of a lazy mid-plan failure. Cost: 2·segments+1
    * catalog lookups per call — noise on the in-memory catalog; a
    * deployment on a remote metastore memoizes the healed (root, gen)
    * pair per session to keep RPCs off the per-batch read path. */
  private def healCatalog(spark: SparkSession, m: LsmManifest,
      root: String): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft")
    val dir = artifactDir(spark, m)
    def qualified(p: org.apache.hadoop.fs.Path) =
      hadoopFs(spark, p).makeQualified(p)
    def ensure(name: String, schema: String, key: String): Unit = {
      val loc = new org.apache.hadoop.fs.Path(dir, name)
      if (spark.catalog.tableExists(s"graft.$name")) {
        // the manifest is the source of truth: an EXISTING entry must
        // match its bucket spec and location — a stale spec (e.g. a
        // metastore restored from before a rebuild with different
        // buckets) would make Spark trust wrong bucketing and skip
        // exchanges it needs, silently corrupting verdicts (round-20
        // review). Mismatch → drop the entry and re-register; the
        // data is external, so the drop touches no files.
        val meta = spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(name, Some("graft")))
        val specOk = meta.bucketSpec.exists(b =>
          b.numBuckets == m.buckets && b.bucketColumnNames == Seq(key))
        val locOk = qualified(new org.apache.hadoop.fs.Path(
          meta.location)) == qualified(loc)
        if (specOk && locOk) return
        spark.sql(s"DROP TABLE graft.$name")
      }
      if (!hadoopFs(spark, loc).exists(loc))
        throw new IllegalStateException(
          s"LSM manifest gen-${m.gen} under $root names table " +
            s"graft.$name but neither the catalog nor $loc holds it — " +
            "rebuild the artifact with saveLsm")
      // IF NOT EXISTS: two concurrent readers may heal the same lost
      // catalog — the loser must read the healthy artifact, not die
      // on TableAlreadyExists (the finishAppend rename-race rule)
      spark.sql(s"CREATE TABLE IF NOT EXISTS graft.$name ($schema) " +
        s"USING PARQUET CLUSTERED BY ($key) SORTED BY ($key) " +
        s"INTO ${m.buckets} BUCKETS LOCATION '$loc'")
    }
    m.segments.foreach { sg =>
      ensure(s"${sg.prefix}_sh", "doc BIGINT, sh BIGINT", "sh")
      ensure(s"${sg.prefix}_doc", "doc BIGINT, sh BIGINT", "doc")
    }
    ensure(m.dfTable, "sh BIGINT, ce BIGINT", "sh")
  }

  /** Drop catalog tables under `base` that neither the new nor the
    * previous generation references (the predecessor survives one
    * cycle for readers that resolved the pointer just before the swap
    * — the StagedRefresh GC contract), delete their EXTERNAL data
    * dirs (DROP alone no longer does — see [[materialize]]), and
    * prune old manifest dirs. */
  private def gcLsm(spark: SparkSession, root: String, base: String,
      dataDir: String, keepTables: Set[String],
      keepGens: Set[String]): Unit = {
    // catalog sweep: drop stale entries and delete THEIR recorded
    // locations (which may differ from dataDir if a session ever
    // registered a table elsewhere — never this artifact's doing, but
    // the entry's own location is the only one its drop may reclaim)
    spark.catalog.listTables("graft").collect()
      .map(_.name)
      .filter(n => n.startsWith(base + "_") && !keepTables.contains(n))
      .foreach { n =>
        val loc = new org.apache.hadoop.fs.Path(
          spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(n, Some("graft")))
            .location)
        spark.sql(s"DROP TABLE IF EXISTS graft.$n")
        hadoopFs(spark, loc).delete(loc, true)
      }
    // filesystem sweep under the ARTIFACT's directory: a fresh JVM's
    // catalog only ever healed the live generation, so predecessor
    // tables from before the restart have no catalog entry — keyed on
    // the catalog alone their corpus-sized dirs would strand forever
    // (round-20 review). The manifest names what must survive;
    // everything else under the artifact's base prefix goes.
    val dataPath = new org.apache.hadoop.fs.Path(dataDir)
    val dfs = hadoopFs(spark, dataPath)
    if (dfs.exists(dataPath)) {
      dfs.listStatus(dataPath).map(_.getPath)
        .filter(p => p.getName.startsWith(base + "_") &&
          !keepTables.contains(p.getName))
        .foreach { p =>
          spark.sql(s"DROP TABLE IF EXISTS graft.${p.getName}")
          dfs.delete(p, true)
        }
    }
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = hadoopFs(spark, rootPath)
    fs.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      if ((n.startsWith("gen-") && !keepGens.contains(n)) ||
          n.startsWith(s".$LsmPointer.tmp-"))
        fs.delete(st.getPath, true)
    }
  }
}
