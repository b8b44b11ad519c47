package graft

import graft.ops.{IvfIndex, Similarity}

/** IVF index lifecycle: the persisted coarse quantizer must reproduce
  * the inline build bit-exactly, and the probe path over a LOADED
  * index must return byte-identical answers to the rebuild-per-query
  * form — the split that makes IVF an actual index at 100 TB. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  test("save/load round-trips centroids bit-exactly; loaded probe == inline build") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.ivfCentroids(emb, cells = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/index"
    IvfIndex.save(spark, cents, dir)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.map(_._1) == cents.map(_._1), "cell ids diverged")
    cents.zip(loaded).foreach { case ((c0, v0, n0), (c1, v1, n1)) =>
      assert(c0 == c1)
      assert(java.util.Arrays.equals(v0, v1), s"cell $c0 centroid not bit-exact")
      assert(n0 == n1, s"cell $c0 stored norm diverged")
    }
    val q = emb.filter($"vec_id" % 100 === 0)
    val inline = Similarity.ivfTopK(emb, q, k = 5, cells = 16, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    val probed = Similarity.ivfTopKWith(loaded, emb, q, k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(probed == inline, "loaded-index probe diverges from inline build")
  }

  test("buildOrLoad builds once, then loads without rebuilding") {
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf2").toString + "/index"
    val built = IvfIndex.buildOrLoad(spark, emb, cells = 8, path = dir)
    // capture the data file's mtime; a second call must LOAD, not rewrite
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty, "no parquet written")
    val mtimes = files.map(f => f.getName -> f.lastModified()).toMap
    val again = IvfIndex.buildOrLoad(spark, emb, cells = 8, path = dir)
    val filesAfter = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(filesAfter.map(f => f.getName -> f.lastModified()).toMap == mtimes,
      "second buildOrLoad rewrote the index instead of loading it")
    assert(again.map(_._1) == built.map(_._1))
    built.zip(again).foreach { case ((_, v0, n0), (_, v1, n1)) =>
      assert(java.util.Arrays.equals(v0, v1) && n0 == n1)
    }
  }

  test("probed path over the cell-partitioned assignment reads ONLY probed cells") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf3").toString + "/index"
    val (cents, assigned) =
      IvfIndex.buildOrLoadWithAssignments(spark, emb, cells = 16, dir)
    val nCells = cents.length
    // one query probes exactly nprobe=4 of the 16 cells — the pruning
    // is only visible when probed < total
    val q = emb.filter($"vec_id" === 0)
    val probed = Similarity.ivfTopKProbed(cents, assigned, q, k = 5, nprobe = 4)
    // answers must match the inline (full-corpus-assignment) plan
    val inline = Similarity.ivfTopKWith(cents, emb, q, k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(probed.as[(Long, Long, Int, Double)].collect().toSet == inline,
      "probed-partition answers diverge from the inline assignment")
    // plan: the assignment scan carries a STATIC partition filter on
    // cell, and the pruned listing touches at most nprobe partitions
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val assignScans = scans(probed.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.endsWith(".assign")))
    assert(assignScans.nonEmpty, "no scan over the assignment parquet in the plan")
    assignScans.foreach { sc =>
      // keep only the STATIC filters (the literal IN over probed cells);
      // Spark also attaches a DynamicPruning subquery from the cell
      // join, which cannot be evaluated before execution
      val static = sc.partitionFilters.filterNot(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
      assert(static.nonEmpty,
        "assignment scan has no static partition filter — probe reads every cell")
      val parts = sc.relation.location.listFiles(static, sc.dataFilters)
      assert(parts.length <= 4 && parts.length < nCells,
        s"probe listed ${parts.length} of $nCells cell partitions (expected <= 4)")
    }
  }

  test("appendAssignments: appended state == a from-scratch union assignment") {
    val emb = Tables.embeddings(spark, sf)
    val corpus0 = emb.filter($"vec_id" % 10 =!= 7)
    val delta = emb.filter($"vec_id" % 10 === 7)
    val cents = Similarity.ivfCentroids(corpus0, cells = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfap").toString
    IvfIndex.saveAssignments(spark, corpus0, cents, s"$dir/grown")
    IvfIndex.appendAssignments(spark, delta, cents, s"$dir/grown")
    IvfIndex.saveAssignments(spark, emb, cents, s"$dir/rebuilt")
    val g = IvfIndex.loadAssignments(spark, s"$dir/grown")
      .select("vid", "cell")
    val r = IvfIndex.loadAssignments(spark, s"$dir/rebuilt")
      .select("vid", "cell")
    assert(g.exceptAll(r).isEmpty && r.exceptAll(g).isEmpty,
      "appended assignment diverges from a from-scratch union assignment")
  }

  test("lifecycle: delta vectors are probe-visible only after the append") {
    val emb = Tables.embeddings(spark, sf)
    val corpus0 = emb.filter($"vec_id" % 10 =!= 7)
    val delta = emb.filter($"vec_id" % 10 === 7)
    val cents = Similarity.ivfCentroids(corpus0, cells = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivflc").toString
    IvfIndex.saveAssignments(spark, corpus0, cents, s"$dir/idx")
    val q = emb.filter($"vec_id" % 100 === 0)
    def vids(path: String): Set[Long] =
      Similarity.ivfTopKProbed(cents, IvfIndex.loadAssignments(spark, path),
        q, k = 5, nprobe = 4)
        .select("vid").as[Long].collect().toSet
    val before = vids(s"$dir/idx")
    assert(!before.exists(_ % 10 == 7),
      "pristine index must not surface unappended vectors")
    IvfIndex.appendAssignments(spark, delta, cents, s"$dir/idx")
    val after = Similarity.ivfTopKProbed(cents,
      IvfIndex.loadAssignments(spark, s"$dir/idx"), q, k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    // bit-identity to a from-scratch union index under the same cents
    IvfIndex.saveAssignments(spark, emb, cents, s"$dir/union")
    val union = Similarity.ivfTopKProbed(cents,
      IvfIndex.loadAssignments(spark, s"$dir/union"), q, k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(after == union, "maintained index diverges from union rebuild")
    assert(after.exists(_._2 % 10 == 7),
      "fixture must surface at least one delta vector post-append")
  }

  test("appendAssignments: a retried append is a no-op; a genuinely overlapping batch is refused") {
    val emb = Tables.embeddings(spark, sf)
    val corpus0 = emb.filter($"vec_id" % 10 =!= 7)
    val delta = emb.filter($"vec_id" % 10 === 7)
    val cents = Similarity.ivfCentroids(corpus0, cells = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfdg").toString
    IvfIndex.saveAssignments(spark, corpus0, cents, s"$dir/idx")
    IvfIndex.appendAssignments(spark, delta, cents, s"$dir/idx")
    val expect = IvfIndex.loadAssignments(spark, s"$dir/idx")
      .select("vid", "cell").as[(Long, Int)].collect().sorted.toSeq
    // a blind retry of the SAME accept (the caller could not observe
    // whether the first attempt landed) must be a no-op, not an error
    IvfIndex.appendAssignments(spark, delta, cents, s"$dir/idx")
    assert(IvfIndex.loadAssignments(spark, s"$dir/idx")
      .select("vid", "cell").as[(Long, Int)].collect().sorted.toSeq == expect,
      "a retried append must leave the assignment unchanged")
    // a DIFFERENT batch that overlaps the artifact is real corruption
    // (some vids already assigned, some genuinely new)
    val slice = emb.filter($"vec_id" % 100 === 7)
    val overlapping = slice.unionByName(
      slice.select(($"vec_id" + 9000000L).as("vec_id"), $"embedding", $"label"))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.appendAssignments(spark, overlapping, cents, s"$dir/idx")
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("appendAssignments crash protocol: a torn append heals on load; the retry is a no-op") {
    val emb = Tables.embeddings(spark, sf)
    val corpus0 = emb.filter($"vec_id" % 10 =!= 7)
    val delta = emb.filter($"vec_id" % 10 === 7)
    val cents = Similarity.ivfCentroids(corpus0, cells = 16)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfcr").toString
    IvfIndex.saveAssignments(spark, corpus0, cents, s"$dir/idx")
    val before = IvfIndex.loadAssignments(spark, s"$dir/idx")
      .select("vid", "cell").as[(Long, Int)].collect().sorted.toSeq
    // crash BEFORE the pending marker: the staged delta must stay
    // invisible (old state serves), and the retry lands cleanly
    val boom1 = intercept[RuntimeException] {
      IvfIndex.appendAssignments(spark, delta, cents, s"$dir/idx",
        hook = s => if (s == "staged") throw new RuntimeException("power cut"))
    }
    assert(boom1.getMessage.contains("power cut"))
    assert(IvfIndex.loadAssignments(spark, s"$dir/idx")
      .select("vid", "cell").as[(Long, Int)].collect().sorted.toSeq == before,
      "a pre-marker crash must leave the staged delta invisible")
    // crash AFTER the pending marker, before the splice: the next
    // load must heal the append to completion — never serve a torn
    // subset of the delta
    val boom2 = intercept[RuntimeException] {
      IvfIndex.appendAssignments(spark, delta, cents, s"$dir/idx",
        hook = s => if (s == "pending") throw new RuntimeException("power cut 2"))
    }
    assert(boom2.getMessage.contains("power cut 2"))
    val healed = IvfIndex.loadAssignments(spark, s"$dir/idx")
      .select("vid", "cell").as[(Long, Int)].collect().sorted.toSeq
    IvfIndex.saveAssignments(spark, emb, cents, s"$dir/union")
    val union = IvfIndex.loadAssignments(spark, s"$dir/union")
      .select("vid", "cell").as[(Long, Int)].collect().sorted.toSeq
    assert(healed == union,
      "healing a crashed append must complete it to the union state")
    // and a blind retry after the heal is a no-op (the round-19
    // wedge: the old guard made the retry fail permanently)
    IvfIndex.appendAssignments(spark, delta, cents, s"$dir/idx")
    assert(IvfIndex.loadAssignments(spark, s"$dir/idx")
      .select("vid", "cell").as[(Long, Int)].collect().sorted.toSeq == union)
    // no staging debris or pending markers survive
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("idx.delta_"))
    assert(leftovers.isEmpty, s"staging debris survived: ${leftovers.toSeq}")
    assert(!new java.io.File(s"$dir/idx").listFiles().map(_.getName)
      .exists(_.startsWith("_PENDING_")), "pending marker survived the heal")
  }

  test("appendAssignments keeps exactly one applied sentinel (the latest append's)") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Similarity.ivfCentroids(emb.filter($"vec_id" % 10 < 6), cells = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfsen").toString
    IvfIndex.saveAssignments(spark, emb.filter($"vec_id" % 10 < 6), cents,
      s"$dir/idx")
    IvfIndex.appendAssignments(spark, emb.filter($"vec_id" % 10 === 7),
      cents, s"$dir/idx")
    IvfIndex.appendAssignments(spark, emb.filter($"vec_id" % 10 === 8),
      cents, s"$dir/idx")
    val sentinels = new java.io.File(s"$dir/idx").listFiles()
      .map(_.getName).filter(_.startsWith("_APPLIED_")).toSeq
    assert(sentinels.size == 1,
      s"sentinels must not accumulate across appends: $sentinels")
    // the retry window follows the sentinel: the LAST append still
    // no-ops, an OLDER one now fails loudly at the dup guard
    IvfIndex.appendAssignments(spark, emb.filter($"vec_id" % 10 === 8),
      cents, s"$dir/idx") // no-op
    val e = intercept[IllegalArgumentException] {
      IvfIndex.appendAssignments(spark, emb.filter($"vec_id" % 10 === 7),
        cents, s"$dir/idx")
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("needsRetrain: quiet under a natural append, fires under drift, quiesces after the retrain") {
    import org.apache.spark.sql.functions.{lit, pmod, transform => arrTransform, when}
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    // natural fixture: 90/10 undrifted split (IvfRetrainProbe's null
    // result — retraining buys nothing, so the trigger must stay quiet)
    val natRoot = java.nio.file.Files
      .createTempDirectory("graft_ivftr_nat").toString + "/lifecycle"
    val nCorpus = emb.filter($"vec_id" % 10 =!= 7)
    val cN = Similarity.ivfCentroids(nCorpus, cells = 16)
    IvfIndex.commitGeneration(spark, nCorpus, cN, natRoot)
    IvfIndex.appendAssignments(spark, emb.filter($"vec_id" % 10 === 7), cN,
      IvfIndex.currentGenDir(spark, natRoot).get + "/assign")
    assert(!IvfIndex.needsRetrain(spark, natRoot),
      "an undrifted append must not fire the retrain trigger")
    // drifted fixture: 70/30 split, the delta shifted by a constant
    // direction the frozen quantizer never saw (the probe's production
    // failure) — the crowding signal must fire
    val drRoot = java.nio.file.Files
      .createTempDirectory("graft_ivftr_dr").toString + "/lifecycle"
    val corpus0 = emb.filter($"vec_id" % 10 < 7)
    val delta = emb.filter($"vec_id" % 10 >= 7).select($"vec_id",
      arrTransform($"embedding",
        (x, i) => when(i === pmod($"vec_id", lit(3)).cast("int"),
          x + lit(3.0f)).otherwise(x)).as("embedding"))
    val c0 = Similarity.ivfCentroids(corpus0, cells = 16)
    IvfIndex.commitGeneration(spark, corpus0, c0, drRoot)
    IvfIndex.appendAssignments(spark, delta, c0,
      IvfIndex.currentGenDir(spark, drRoot).get + "/assign")
    assert(IvfIndex.needsRetrain(spark, drRoot),
      "the drifted append must fire the derived occupancy trigger")
    // the retrain re-partitions the grown distribution and commits its
    // own occupancy baseline — the trigger must quiesce even though
    // the retrained data is genuinely lumpier than gen-1's
    IvfIndex.retrain(spark, corpus0.unionByName(delta), cells = 16,
      iters = 3, drRoot)
    assert(!IvfIndex.needsRetrain(spark, drRoot),
      "a fresh retrain must quiesce the trigger")
  }

  test("retrain: atomic pair swap — a crash before the pointer swap leaves the old generation; the retry lands") {
    val emb = Tables.embeddings(spark, sf)
    val corpus0 = emb.filter($"vec_id" % 10 =!= 7)
    val root = java.nio.file.Files.createTempDirectory("graft_ivfrt").toString + "/lifecycle"
    // gen-1: frozen-quantizer grow (q42g's shape)
    val c0 = Similarity.ivfCentroids(corpus0, cells = 16)
    IvfIndex.commitGeneration(spark, corpus0, c0, root)
    IvfIndex.appendAssignments(spark, emb.filter($"vec_id" % 10 === 7), c0,
      IvfIndex.currentGenDir(spark, root).get + "/assign")
    val q = emb.filter($"vec_id" % 100 === 0)
    def probeNow(): Set[(Long, Long, Int, Double)] = {
      val (ce, as) = IvfIndex.loadCurrent(spark, root)
      Similarity.ivfTopKProbed(ce, as, q, k = 5, nprobe = 4)
        .as[(Long, Long, Int, Double)].collect().toSet
    }
    val frozenAnswers = probeNow()
    // kill the retrain after BOTH artifacts staged, before the commit
    val boom = intercept[RuntimeException] {
      IvfIndex.retrain(spark, emb, cells = 16, iters = 3, root,
        hook = s => if (s == "staged") throw new RuntimeException("power cut"))
    }
    assert(boom.getMessage.contains("power cut"))
    // readers still resolve gen-1: quantizer and assignment CONSISTENT
    // (a torn pair — new centroids over the old cell layout — must be
    // unreachable at every crash instant)
    assert(IvfIndex.currentGenDir(spark, root).get.endsWith("gen-1"))
    assert(probeNow() == frozenAnswers,
      "a crashed retrain must be invisible to probes")
    // the retry commits — numbering allocates PAST the crashed
    // attempt's orphan dir (gen-2), so the retry lands as gen-3 and GC
    // removes the orphan (keeping the orphan by number instead would
    // risk GC'ing the live predecessor — the StagedRefresh discipline)
    IvfIndex.retrain(spark, emb, cells = 16, iters = 3, root)
    assert(IvfIndex.currentGenDir(spark, root).get.endsWith("gen-3"))
    val retrained = probeNow()
    val inline = Similarity.ivfTopKWith(
      Similarity.ivfCentroidsIter(emb, cells = 16, iters = 3), emb, q,
      k = 5, nprobe = 4)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(retrained == inline,
      "retrained generation diverges from a from-scratch union build")
    // GC keeps exactly the live generation and its predecessor — the
    // crashed attempt's orphan is gone
    val gens = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("gen-")).toSet
    assert(gens == Set("gen-1", "gen-3"),
      s"GC must keep live + predecessor and drop the orphan, found $gens")
  }
}
