package graft

import graft.ops.{Dedup, ShingleIndex}
import org.apache.spark.sql.functions._

/** The LSM bucketed shingle artifact (q41o): segmented probes must be
  * bit-identical to the inline build, the append must commit BOTH
  * relations atomically (old XOR new across any crash point) and be
  * retryable after a crash, compaction must not change verdicts, and
  * the segment corpus sides must probe without shuffling. */
class LsmShingleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Tables.documents(spark, sf).select("doc_id", "text")

  private def batch = {
    val d = corpus
    d.filter($"doc_id" % 10 === 3)
      .select(($"doc_id" + 2000000L).as("doc_id"),
        concat(lit("copy "), $"text").as("text"))
      .unionByName(d.filter($"doc_id" % 10 === 4)
        .select(($"doc_id" + 3000000L).as("doc_id"),
          translate($"text", "aeiou", "xyzwv").as("text")))
  }

  private def probe(root: String,
      b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val (segs, dfE) = ShingleIndex.loadLsm(spark, root)
    Dedup.incrementalNearDupSegmented(segs, dfE, b,
      "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
  }

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/lsm"

  test("segmented probe over base+delta equals the inline build over the union") {
    val root = freshRoot("graft_lsm_eq")
    ShingleIndex.saveLsm(spark, corpus, "doc_id", "text", 2, root, "lsmspec_eq")
    val delta = batch.filter($"doc_id" >= 3000000L) // novel docs
    ShingleIndex.appendLsm(spark, delta, "doc_id", "text", 2, root, "lsmspec_eq")
    val b2 = delta.select(($"doc_id" + 1000000L).as("doc_id"),
      concat(lit("copy "), $"text").as("text"))
    val segmented = probe(root, b2)
    val inline = Dedup.incrementalNearDup(corpus.unionByName(delta), b2,
      "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
    assert(segmented.exceptAll(inline).isEmpty &&
      inline.exceptAll(segmented).isEmpty,
      "segmented LSM probe diverges from the inline union build")
    // non-trivial: every copy of an appended doc matches via the delta
    assert(segmented.filter($"matched" === 1).count() === b2.count())
  }

  test("a crash between staging and the pointer swap leaves the OLD generation — and the append retries") {
    val root = freshRoot("graft_lsm_crash")
    ShingleIndex.saveLsm(spark, corpus, "doc_id", "text", 2, root, "lsmspec_cr")
    val delta = batch.filter($"doc_id" >= 3000000L)
    val b2 = delta.select(($"doc_id" + 1000000L).as("doc_id"),
      concat(lit("copy "), $"text").as("text"))
    assert(probe(root, b2).filter($"matched" === 1).count() === 0L,
      "pristine artifact must not know the delta")
    // kill the writer AFTER both relations staged, BEFORE the commit
    val boom = intercept[RuntimeException] {
      ShingleIndex.appendLsm(spark, delta, "doc_id", "text", 2, root,
        "lsmspec_cr", hook = stage =>
          if (stage == "staged") throw new RuntimeException("yanked power cord"))
    }
    assert(boom.getMessage.contains("yanked"))
    // readers still see generation 1: shingles AND df consistent —
    // neither relation can be "ahead" of the other (the flat append's
    // documented gap), so the probe result is exactly the pristine one
    val m = ShingleIndex.currentManifest(spark, root).get
    assert(m.gen === 1L && m.segments.size === 1)
    assert(probe(root, b2).filter($"matched" === 1).count() === 0L,
      "a crashed append must be invisible to readers")
    // the RETRY must succeed — the dup guard reads manifest segments,
    // not the crashed attempt's orphan tables
    ShingleIndex.appendLsm(spark, delta, "doc_id", "text", 2, root, "lsmspec_cr")
    val m2 = ShingleIndex.currentManifest(spark, root).get
    assert(m2.gen === 2L && m2.segments.size === 2)
    assert(probe(root, b2).filter($"matched" === 1).count() === b2.count(),
      "the retried append must surface the delta")
  }

  test("appendLsm refuses doc ids already live in the artifact") {
    val root = freshRoot("graft_lsm_dup")
    ShingleIndex.saveLsm(spark, corpus, "doc_id", "text", 2, root, "lsmspec_dup")
    val delta = batch.limit(10)
    ShingleIndex.appendLsm(spark, delta, "doc_id", "text", 2, root, "lsmspec_dup")
    val e = intercept[IllegalArgumentException] {
      ShingleIndex.appendLsm(spark, delta, "doc_id", "text", 2, root, "lsmspec_dup")
    }
    assert(e.getMessage.contains("double-count"))
  }

  test("manifest doc-id summaries: recorded on save/append, exact, and the overlap fallback still catches dups") {
    val root = freshRoot("graft_lsm_sum")
    // base = even ids only, so odd ids INSIDE the base range are new
    val even = corpus.filter($"doc_id" % 2 === 0)
    ShingleIndex.saveLsm(spark, even, "doc_id", "text", 2, root, "lsmspec_sm")
    val m1 = ShingleIndex.currentManifest(spark, root).get
    val evStats = even.agg(count(lit(1)), min("doc_id"), max("doc_id")).head()
    assert(m1.segments.head.docs === evStats.getLong(0) &&
      m1.segments.head.minDoc === evStats.getLong(1) &&
      m1.segments.head.maxDoc === evStats.getLong(2),
      s"base segment summary wrong: ${m1.segments.head}")
    // a batch whose id range OVERLAPS the base but whose ids are all
    // new must pass through the fallback scan — the summary can only
    // SKIP segments, never produce a false reject
    val odd = corpus.filter($"doc_id" % 2 === 1)
    ShingleIndex.appendLsm(spark, odd, "doc_id", "text", 2, root, "lsmspec_sm")
    val m2 = ShingleIndex.currentManifest(spark, root).get
    assert(m2.segments.size === 2)
    // and a REAL duplicate inside the overlapping range still throws
    val e = intercept[IllegalArgumentException] {
      ShingleIndex.appendLsm(spark, odd.limit(3), "doc_id", "text", 2,
        root, "lsmspec_sm")
    }
    assert(e.getMessage.contains("double-count"))
    // a range-DISJOINT batch appends fine (the fast path every
    // monotone-id deployment takes; read-volume law in
    // ShingleBucketProbe/SCALING.md)
    val far = batch.filter($"doc_id" >= 3000000L)
    ShingleIndex.appendLsm(spark, far, "doc_id", "text", 2, root, "lsmspec_sm")
    val m3 = ShingleIndex.currentManifest(spark, root).get
    assert(m3.segments.size === 3)
    assert(m3.segments.last.minDoc >= 3000000L,
      "delta segment summary must carry the batch's id range")
    // compaction folds the summaries exactly (disjoint doc sets)
    ShingleIndex.compactLsm(spark, root, "lsmspec_sm")
    val mc = ShingleIndex.currentManifest(spark, root).get
    assert(mc.segments.size === 1)
    assert(mc.segments.head.docs === m3.segments.map(_.docs).sum &&
      mc.segments.head.minDoc === m3.segments.map(_.minDoc).min &&
      mc.segments.head.maxDoc === m3.segments.map(_.maxDoc).max,
      s"compacted summary must be the exact fold: ${mc.segments.head}")
  }

  test("shouldCompact fires exactly at the derived 4-segment threshold") {
    val root = freshRoot("graft_lsm_trig")
    ShingleIndex.saveLsm(spark, corpus, "doc_id", "text", 2, root, "lsmspec_tg")
    def m = ShingleIndex.currentManifest(spark, root).get
    assert(!ShingleIndex.shouldCompact(m), "1 segment must not trigger")
    val novel = batch.filter($"doc_id" >= 3000000L)
    val third = pmod(floor($"doc_id" / 10), lit(3))
    ShingleIndex.appendLsm(spark, novel.filter(third === 0),
      "doc_id", "text", 2, root, "lsmspec_tg")
    assert(!ShingleIndex.shouldCompact(m), "2 segments sit below S*")
    ShingleIndex.appendLsm(spark, novel.filter(third === 1),
      "doc_id", "text", 2, root, "lsmspec_tg")
    assert(!ShingleIndex.shouldCompact(m),
      "3 segments still sit below the amortization optimum S* = 1 + sqrt(2R/tau) = 4")
    ShingleIndex.appendLsm(spark, novel.filter(third === 2),
      "doc_id", "text", 2, root, "lsmspec_tg")
    assert(ShingleIndex.shouldCompact(m),
      "4 segments must fire the derived trigger")
    ShingleIndex.compactLsm(spark, root, "lsmspec_tg")
    assert(!ShingleIndex.shouldCompact(m), "compaction resets the trigger")
  }

  test("compaction folds segments into one without changing verdicts") {
    val root = freshRoot("graft_lsm_cp")
    ShingleIndex.saveLsm(spark, corpus, "doc_id", "text", 2, root, "lsmspec_cp")
    val delta = batch.filter($"doc_id" >= 3000000L)
    ShingleIndex.appendLsm(spark, delta, "doc_id", "text", 2, root, "lsmspec_cp")
    val b2 = delta.select(($"doc_id" + 1000000L).as("doc_id"),
      concat(lit("copy "), $"text").as("text"))
    val before = probe(root, b2)
    val beforeRows = before.collect().toSeq
    ShingleIndex.compactLsm(spark, root, "lsmspec_cp")
    val m = ShingleIndex.currentManifest(spark, root).get
    assert(m.segments.size === 1, "compaction must leave one segment")
    val after = probe(root, b2)
    assert(after.collect().toSeq.sortBy(_.getLong(0)) ===
      beforeRows.sortBy(_.getLong(0)),
      "compaction changed probe verdicts")
  }

  test("a crash during compaction leaves the multi-segment generation intact — and the retry lands") {
    val root = freshRoot("graft_lsm_cpcr")
    ShingleIndex.saveLsm(spark, corpus, "doc_id", "text", 2, root, "lsmspec_cc")
    val delta = batch.filter($"doc_id" >= 3000000L)
    ShingleIndex.appendLsm(spark, delta, "doc_id", "text", 2, root, "lsmspec_cc")
    val b2 = delta.select(($"doc_id" + 1000000L).as("doc_id"),
      concat(lit("copy "), $"text").as("text"))
    val before = probe(root, b2).collect().toSeq.sortBy(_.getLong(0))
    val boom = intercept[RuntimeException] {
      ShingleIndex.compactLsm(spark, root, "lsmspec_cc", hook = stage =>
        if (stage == "staged") throw new RuntimeException("tripped breaker"))
    }
    assert(boom.getMessage.contains("tripped"))
    val m = ShingleIndex.currentManifest(spark, root).get
    assert(m.gen === 2L && m.segments.size === 2,
      "a crashed compaction must leave the live multi-segment generation")
    assert(probe(root, b2).collect().toSeq.sortBy(_.getLong(0)) === before)
    ShingleIndex.compactLsm(spark, root, "lsmspec_cc")
    val m2 = ShingleIndex.currentManifest(spark, root).get
    assert(m2.segments.size === 1, "the retried compaction must land")
    assert(probe(root, b2).collect().toSeq.sortBy(_.getLong(0)) === before,
      "retried compaction changed verdicts")
  }

  test("a lost session catalog heals from the manifest alone (metastore divergence)") {
    // the manifest/pointer live on the filesystem, tables in the
    // session catalog — the round-19 verdict's divergence scenario: a
    // fresh JVM / dropped database over a surviving warehouse. Tables
    // are EXTERNAL, so dropping every catalog entry deletes no data,
    // and loadLsm must re-register them from the manifest with the
    // bucket spec intact.
    val root = freshRoot("graft_lsm_heal")
    ShingleIndex.saveLsm(spark, corpus, "doc_id", "text", 2, root, "lsmspec_hc")
    val delta = batch.filter($"doc_id" >= 3000000L)
    ShingleIndex.appendLsm(spark, delta, "doc_id", "text", 2, root, "lsmspec_hc")
    val b2 = delta.select(($"doc_id" + 1000000L).as("doc_id"),
      concat(lit("copy "), $"text").as("text"))
    val before = probe(root, b2).collect().toSeq.sortBy(_.getLong(0))
    // simulate the catalog loss
    val m = ShingleIndex.currentManifest(spark, root).get
    val names = m.segments.flatMap(sg =>
      Seq(s"${sg.prefix}_sh", s"${sg.prefix}_doc")) :+ m.dfTable
    names.foreach(n => spark.sql(s"DROP TABLE graft.$n"))
    names.foreach(n => assert(!spark.catalog.tableExists(s"graft.$n")))
    // loadLsm heals: identical verdicts, and the healed tables keep
    // their bucketed layout (the exchange-free probe law survives)
    assert(probe(root, b2).collect().toSeq.sortBy(_.getLong(0)) === before,
      "healed catalog must reproduce the pre-loss verdicts")
    val (segs, _) = ShingleIndex.loadLsm(spark, root)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (segSh, _) = segs.head
      val someSh = segSh.limit(5).collect().map(_.getLong(1)).toSeq.toDF("sh")
      val j = segSh.hint("merge").join(someSh, "sh")
      j.collect()
      val plan = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      assert(plan.contains("Bucketed: true"),
        s"healed table lost its bucket spec:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // files genuinely gone → a precise error naming generation + table
    spark.sql(s"DROP TABLE graft.${names.head}")
    val loc = new org.apache.hadoop.fs.Path(m.tablesAt, names.head)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    val e = intercept[IllegalStateException] {
      ShingleIndex.loadLsm(spark, root)
    }
    assert(e.getMessage.contains(names.head) &&
      e.getMessage.contains(s"gen-${m.gen}"),
      s"divergence error must name the table and generation: ${e.getMessage}")
  }

  test("healCatalog re-registers a catalog entry whose bucket spec diverges from the manifest") {
    // the silent-corruption variant of metastore divergence: a
    // restored/stale catalog entry with the WRONG bucket count over
    // the right files would let Spark skip exchanges it needs — the
    // manifest's spec must win
    val root = freshRoot("graft_lsm_spec")
    ShingleIndex.saveLsm(spark, corpus, "doc_id", "text", 2, root, "lsmspec_bs")
    val delta = batch.filter($"doc_id" >= 3000000L)
    val b2 = delta.select(($"doc_id" + 1000000L).as("doc_id"),
      concat(lit("copy "), $"text").as("text"))
    val before = probe(root, b2).collect().toSeq.sortBy(_.getLong(0))
    val m = ShingleIndex.currentManifest(spark, root).get
    val name = s"${m.segments.head.prefix}_sh"
    val loc = new org.apache.hadoop.fs.Path(m.tablesAt, name)
    spark.sql(s"DROP TABLE graft.$name")
    spark.sql(s"CREATE TABLE graft.$name (doc BIGINT, sh BIGINT) " +
      s"USING PARQUET CLUSTERED BY (sh) SORTED BY (sh) INTO 7 BUCKETS " +
      s"LOCATION '$loc'")
    ShingleIndex.loadLsm(spark, root) // must detect + re-register
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name, Some("graft")))
    assert(meta.bucketSpec.exists(_.numBuckets == m.buckets),
      s"stale bucket spec survived the heal: ${meta.bucketSpec}")
    assert(probe(root, b2).collect().toSeq.sortBy(_.getLong(0)) === before,
      "verdicts diverged after the spec re-registration")
  }

  test("every LSM segment's corpus sides probe without a corpus-side exchange") {
    val root = freshRoot("graft_lsm_plan")
    ShingleIndex.saveLsm(spark, corpus, "doc_id", "text", 2, root, "lsmspec_pl")
    ShingleIndex.appendLsm(spark, batch.filter($"doc_id" >= 3000000L),
      "doc_id", "text", 2, root, "lsmspec_pl")
    val (segs, _) = ShingleIndex.loadLsm(spark, root)
    assert(segs.size === 2)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try segs.foreach { case (segSh, segDoc) =>
      def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
        df.collect()
        df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan.toString
          case other => other.toString
        }
      }
      // sh-keyed probe: segment side must contribute buckets in place
      val someSh = segSh.limit(20).collect().map(_.getLong(1)).toSeq.toDF("sh")
      val p1 = finalPlan(segSh.hint("merge").join(someSh, "sh"))
      assert(p1.contains("Bucketed: true"), s"sh copy not bucketed:\n$p1")
      assert("Exchange hashpartitioning".r.findAllIn(p1).size == 1,
        s"segment sh side must not shuffle:\n$p1")
      // doc-keyed candidate fetch: same law on the second copy
      val someDocs = segDoc.limit(20).collect().map(_.getLong(0)).toSeq.toDF("doc")
      val p2 = finalPlan(segDoc.hint("merge").join(someDocs, Seq("doc"), "left_semi"))
      assert(p2.contains("Bucketed: true"), s"doc copy not bucketed:\n$p2")
      assert("Exchange hashpartitioning".r.findAllIn(p2).size == 1,
        s"segment doc side must not shuffle:\n$p2")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
