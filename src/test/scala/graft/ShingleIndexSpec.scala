package graft

import graft.ops.{Dedup, ShingleIndex}
import org.apache.spark.sql.functions._

/** The persisted corpus shingle artifact must reproduce the inline
  * cross-corpus near-dup build bit-for-bit, and loading must actually
  * skip the corpus pass (build-once semantics). */
class ShingleIndexSpec extends SparkSpec {
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

  test("indexed cross-corpus near-dup is bit-identical to the inline build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shix").toString
    val (shE, dfE) = ShingleIndex.buildOrLoad(spark, corpus,
      "doc_id", "text", k = 2, s"$dir/index")
    val indexed = Dedup.incrementalNearDupWith(shE, dfE, batch,
      "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
    val inline = Dedup.incrementalNearDup(corpus, batch,
      "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
    assert(indexed.exceptAll(inline).isEmpty && inline.exceptAll(indexed).isEmpty,
      "indexed path diverges from the inline build")
    // verdicts are non-trivial on this batch: the prefix copies match
    assert(indexed.filter($"matched" === 1).count() > 0)
  }

  test("buildOrLoad loads without touching the corpus on the second call") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shix2").toString
    ShingleIndex.buildOrLoad(spark, corpus, "doc_id", "text", k = 2,
      s"$dir/index")
    // second call must resolve from the artifact alone — a corpus that
    // would EXPLODE if scanned proves shingling never ran
    val poison = corpus.withColumn("text",
      raise_error(lit("corpus pass ran on the load path")).cast("string"))
    val (shE, dfE) = ShingleIndex.buildOrLoad(spark, poison,
      "doc_id", "text", k = 2, s"$dir/index")
    assert(shE.count() > 0 && dfE.count() > 0)
    // the df rollup must agree with re-aggregating the shingle relation
    val re = shE.groupBy("sh").agg(count(lit(1)).as("ce"))
    assert(dfE.exceptAll(re).isEmpty && re.exceptAll(dfE).isEmpty)
  }

  test("append folds accepted docs in: artifact equals a rebuild from the union") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shap").toString
    ShingleIndex.save(corpus, "doc_id", "text", 2, s"$dir/grown")
    val delta = batch.limit(40)
    ShingleIndex.append(spark, delta, "doc_id", "text", 2, s"$dir/grown")
    ShingleIndex.save(corpus.unionByName(delta), "doc_id", "text", 2,
      s"$dir/rebuilt")
    val (shG, dfG) = ShingleIndex.load(spark, s"$dir/grown")
    val (shR, dfR) = ShingleIndex.load(spark, s"$dir/rebuilt")
    assert(shG.exceptAll(shR).isEmpty && shR.exceptAll(shG).isEmpty,
      "appended shingle relation diverges from a rebuild")
    assert(dfG.exceptAll(dfR).isEmpty && dfR.exceptAll(dfG).isEmpty,
      "merged df rollup diverges from a rebuild")
  }

  test("append: a retried accept of the same batch is a no-op; an overlapping batch is refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shdup").toString
    ShingleIndex.save(corpus, "doc_id", "text", 2, s"$dir/index")
    val delta = batch.limit(10)
    ShingleIndex.append(spark, delta, "doc_id", "text", 2, s"$dir/index")
    val expect = ShingleIndex.load(spark, s"$dir/index")._2.collect().toSet
    // a blind retry of the same accept must return as a no-op (the
    // caller cannot observe whether the first attempt landed) — the
    // round-19 advice contract, keyed on the _APPLIED sentinel plus
    // an all-docs-present cross-check
    ShingleIndex.append(spark, delta, "doc_id", "text", 2, s"$dir/index")
    assert(ShingleIndex.load(spark, s"$dir/index")._2.collect().toSet === expect,
      "a retried append must leave the artifact unchanged")
    // a DIFFERENT batch that overlaps the artifact is real corruption
    val overlapping = delta.unionByName(delta
      .select(($"doc_id" + 7000000L).as("doc_id"), $"text"))
    val e = intercept[IllegalArgumentException] {
      ShingleIndex.append(spark, overlapping, "doc_id", "text", 2, s"$dir/index")
    }
    assert(e.getMessage.contains("double-count"))
  }

  test("a stale _APPLIED sentinel from a colliding token cannot swallow a new batch") {
    // the 2^-64 silent-loss window (round-19 advice): if a NEW batch's
    // token equals a sentinel surviving inside df, the old code
    // skipped the splice and deleted the staged delta. The fix
    // cross-checks doc presence: absent docs → stale sentinel, the
    // append proceeds. Simulated by planting the new batch's sentinel.
    val dir = java.nio.file.Files.createTempDirectory("graft_shcol").toString
    ShingleIndex.save(corpus, "doc_id", "text", 2, s"$dir/index")
    val delta = batch.limit(10)
    val token = java.lang.Long.toHexString(
      delta.select(xxhash64(col("doc_id")).as("h"))
        .agg(bit_xor(col("h"))).head().getLong(0))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/index/df/_APPLIED_$token"), true).close()
    ShingleIndex.append(spark, delta, "doc_id", "text", 2, s"$dir/index")
    ShingleIndex.save(corpus.unionByName(delta), "doc_id", "text", 2,
      s"$dir/rebuilt")
    val (shG, dfG) = ShingleIndex.load(spark, s"$dir/index")
    val (shR, dfR) = ShingleIndex.load(spark, s"$dir/rebuilt")
    assert(shG.exceptAll(shR).isEmpty && shR.exceptAll(shG).isEmpty,
      "the batch behind a stale sentinel must still land (silent-loss window)")
    assert(dfG.select("sh", "ce").exceptAll(dfR).isEmpty &&
      dfR.exceptAll(dfG.select("sh", "ce")).isEmpty)
  }

  test("a colliding token never reuses an earlier append's file prefix (df stays exact)") {
    // the 2^-64 case, fully simulated: an EARLIER append's spliced
    // files AND sentinel carry exactly the token the NEW batch
    // derives. The pre-fix protocol deleted the sentinel and
    // proceeded under the same token — and the df merge's
    // `<token>-*.parquet` glob then re-counted the OLD batch's files
    // (silent corruption). The token walk must skip to a remixed
    // token and leave both relations exactly equal to a rebuild.
    val dir = java.nio.file.Files.createTempDirectory("graft_shcol2").toString
    ShingleIndex.save(corpus, "doc_id", "text", 2, s"$dir/index")
    val d1 = batch.filter($"doc_id" >= 3000000L && $"doc_id" % 20 < 10)
    val d2 = batch.filter($"doc_id" >= 3000000L && $"doc_id" % 20 >= 10)
    ShingleIndex.append(spark, d1, "doc_id", "text", 2, s"$dir/index")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t1 = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/index/df"))
      .map(_.getPath.getName).find(_.startsWith("_APPLIED_")).get
      .stripPrefix("_APPLIED_")
    val t2 = java.lang.Long.toHexString(
      d2.select(xxhash64(col("doc_id")).as("h"))
        .agg(bit_xor(col("h"))).head().getLong(0))
    // rebrand d1's spliced files + sentinel with d2's base token
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/index/shingles"))
      .map(_.getPath).filter(_.getName.startsWith(s"$t1-"))
      .foreach { p =>
        assert(fs.rename(p, new org.apache.hadoop.fs.Path(p.getParent,
          s"$t2-${p.getName.stripPrefix(s"$t1-")}")))
      }
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/index/df/_APPLIED_$t1"),
      new org.apache.hadoop.fs.Path(s"$dir/index/df/_APPLIED_$t2")))
    ShingleIndex.append(spark, d2, "doc_id", "text", 2, s"$dir/index")
    ShingleIndex.save(corpus.unionByName(d1).unionByName(d2),
      "doc_id", "text", 2, s"$dir/rebuilt")
    val (shG, dfG) = ShingleIndex.load(spark, s"$dir/index")
    val (shR, dfR) = ShingleIndex.load(spark, s"$dir/rebuilt")
    assert(shG.exceptAll(shR).isEmpty && shR.exceptAll(shG).isEmpty,
      "collision walk lost or duplicated shingle rows")
    assert(dfG.select("sh", "ce").exceptAll(dfR).isEmpty &&
      dfR.exceptAll(dfG.select("sh", "ce")).isEmpty,
      "collision walk double-counted the earlier batch in df")
  }

  test("load heals an append crashed right after staging (delta + pending only)") {
    // the EARLIEST resumable crash point: delta_<T> committed,
    // pending_<T> marker down, nothing spliced or merged yet — load
    // must finish the whole append from the staged delta alone
    val dir = java.nio.file.Files.createTempDirectory("graft_shheal").toString
    ShingleIndex.save(corpus, "doc_id", "text", 2, s"$dir/index")
    val delta = batch.limit(40)
    // stage exactly what append() stages, then "crash"
    val shA = graft.ops.Dedup.wordShingles(delta, "doc_id", "text", 2)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
    val token = java.lang.Long.toHexString(
      shA.select("doc").distinct()
        .agg(bit_xor(xxhash64(col("doc")))).head().getLong(0))
    shA.write.mode("overwrite").parquet(s"$dir/index/delta_$token")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/index/pending_$token"), true).close()
    // load heals: shingles spliced, df merged + swapped, markers gone
    val (shH, dfH) = ShingleIndex.load(spark, s"$dir/index")
    ShingleIndex.save(corpus.unionByName(delta), "doc_id", "text", 2,
      s"$dir/rebuilt")
    val (shR, dfR) = ShingleIndex.load(spark, s"$dir/rebuilt")
    assert(shH.exceptAll(shR).isEmpty && shR.exceptAll(shH).isEmpty,
      "healed shingle relation diverges from a rebuild")
    assert(dfH.select("sh", "ce").exceptAll(dfR).isEmpty &&
      dfR.exceptAll(dfH.select("sh", "ce")).isEmpty,
      "healed df rollup diverges from a rebuild")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/index/pending_$token")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$dir/index/delta_$token")),
      "heal must clear the append markers")
  }

  test("a crashed swap window heals, and a healed append never double-applies") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shheal2").toString
    ShingleIndex.save(corpus, "doc_id", "text", 2, s"$dir/index")
    val delta = batch.limit(40)
    ShingleIndex.append(spark, delta, "doc_id", "text", 2, s"$dir/index")
    val expect = ShingleIndex.load(spark, s"$dir/index")._2.collect().toSet
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash BEFORE the cleanup step: re-create the pending
    // marker + a stale staged delta for the same token — the heal must
    // see the _APPLIED sentinel in df and only clean up, NOT re-merge
    val token = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/index/df"))
      .map(_.getPath.getName).find(_.startsWith("_APPLIED_")).get
      .stripPrefix("_APPLIED_")
    spark.read.parquet(s"$dir/index/shingles/$token-*.parquet")
      .write.mode("overwrite").parquet(s"$dir/index/delta_$token")
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/index/pending_$token"), true).close()
    val (_, dfHealed) = ShingleIndex.load(spark, s"$dir/index")
    assert(dfHealed.collect().toSet === expect,
      "a healed already-applied append must not merge the delta twice")
    // and the RETRY path through append() itself: heal finishes the
    // pending no-op, then the sentinel + all-docs-present cross-check
    // recognizes the retried accept and returns without re-merging
    fs.create(new org.apache.hadoop.fs.Path(s"$dir/index/pending_$token"), true).close()
    ShingleIndex.append(spark, delta, "doc_id", "text", 2, s"$dir/index")
    assert(ShingleIndex.load(spark, s"$dir/index")._2.collect().toSet === expect)
  }

  test("lifecycle: a copy of an ACCEPTED doc matches only after the append") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shlc").toString
    ShingleIndex.save(corpus, "doc_id", "text", 2, s"$dir/index")
    val (shE, dfE) = ShingleIndex.load(spark, s"$dir/index")
    // batch1's translate-variants are novel vs the corpus → accepted
    val b1 = batch.filter($"doc_id" >= 3000000L)
    val v1 = Dedup.incrementalNearDupWith(shE, dfE, b1,
      "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
    val accepted = b1.join(v1.filter($"matched" === 0)
      .select($"batch_id".as("doc_id")), Seq("doc_id"), "left_semi")
    assert(accepted.count() > 0, "fixture must accept some batch1 docs")
    // batch2 = copies of the accepted docs, at fresh ids
    val b2 = accepted.select(($"doc_id" + 1000000L).as("doc_id"),
      concat(lit("copy "), $"text").as("text"))
    def matchedCount(sh: org.apache.spark.sql.DataFrame,
        df: org.apache.spark.sql.DataFrame): Long =
      Dedup.incrementalNearDupWith(sh, df, b2, "doc_id", "text",
        k = 2, maxDf = 20, threshold = 0.2)
        .filter($"matched" === 1).count()
    assert(matchedCount(shE, dfE) === 0L,
      "pristine artifact must not know batch1's accepted docs")
    ShingleIndex.append(spark, accepted, "doc_id", "text", 2, s"$dir/index")
    val (shE2, dfE2) = ShingleIndex.load(spark, s"$dir/index")
    assert(matchedCount(shE2, dfE2) === b2.count(),
      "every copy of an accepted doc must match through the delta")
  }

  test("bucketed artifact + merge hints reproduce the inline build (q41m)") {
    val (shESh, shEDoc, dfE) = ShingleIndex.buildOrLoadBucketed(spark,
      corpus, "doc_id", "text", k = 2, table = "shingle_spec_eq")
    val bucketed = Dedup.incrementalNearDupWith(shESh.hint("merge"),
      shEDoc.hint("merge"), dfE.hint("merge"), batch, "doc_id", "text",
      k = 2, maxDf = 20, threshold = 0.2)
    val inline = Dedup.incrementalNearDup(corpus, batch,
      "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
    assert(bucketed.exceptAll(inline).isEmpty &&
      inline.exceptAll(bucketed).isEmpty,
      "bucketed path diverges from the inline build")
    assert(bucketed.filter($"matched" === 1).count() > 0)
  }

  test("bucketed corpus side probes without a shuffle exchange") {
    // model the big-batch regime: the rare-shingle relation too large
    // to broadcast (threshold off), so the probe is a shuffle join —
    // the bucketed corpus side must contribute its buckets IN PLACE
    // while only the probe side moves (the q50 plan discipline)
    val (shE, shEDoc, _) = ShingleIndex.buildOrLoadBucketed(spark, corpus,
      "doc_id", "text", k = 2, table = "shingle_spec_plan")
    val someSh = shE.limit(50).collect().map(_.getLong(1))
    val rare = someSh.toSeq.toDF("sh")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probed = shE.hint("merge").join(rare, "sh")
      probed.collect() // force the final AQE plan
      val plan = probed.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"),
        s"corpus scan must be bucketed:\n$plan")
      assert(exchanges == 1,
        s"only the probe side may shuffle (found $exchanges exchanges):\n$plan")

      // the DOC-keyed candidate fetch rides the second copy: corpus
      // side again in place, only the candidate-doc list shuffles
      val someDocs = shEDoc.limit(20).collect().map(_.getLong(0))
        .toSeq.toDF("doc")
      val fetched = shEDoc.hint("merge")
        .join(someDocs, Seq("doc"), "left_semi")
      fetched.collect()
      val dplan = fetched.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case other => other.toString
      }
      val dexchanges = "Exchange hashpartitioning".r.findAllIn(dplan).size
      assert(dplan.contains("Bucketed: true"),
        s"doc-copy scan must be bucketed:\n$dplan")
      assert(dexchanges == 1,
        s"only the candidate list may shuffle (found $dexchanges):\n$dplan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
