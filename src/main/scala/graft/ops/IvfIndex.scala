package graft.ops

import org.apache.spark.sql.{Row, SparkSession}

/** Persistence for the IVF coarse quantizer (round-12 verdict item 6):
  * at 100 TB the index is BUILT ONCE — one corpus pass for the strided
  * sample + Lloyd step, a (cell, dim, partial-sum) shuffle, cells×dim
  * rows — and then PROBED by every query session; rebuilding the
  * quantizer per query (what a bare `ivfTopK` call does) is the
  * anti-pattern this object removes.
  *
  * The at-rest format is a tiny parquet of (cell INT, centroid
  * ARRAY<DOUBLE>, norm_sq DOUBLE) — a few KB for any realistic cell
  * count, trivially readable by any engine. Doubles round-trip parquet
  * bit-exactly, and the norm is STORED rather than recomputed on load,
  * so a loaded index reproduces `ivfCentroids`' output to the bit and
  * `ivfTopKWith(load(...))` returns byte-identical answers to the
  * inline build (IvfIndexSpec pins both).
  */
object IvfIndex {

  /** Write centroids (the [[Similarity.ivfCentroids]] result shape) as
    * one small parquet file. Overwrites `path`. Completion is recorded
    * by an artifact-owned `_BUILT` marker (the ShingleIndex discipline,
    * round-18 advice): the committer's `_SUCCESS` files are OPTIONAL —
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` is common
    * on object stores, and a load gate keyed on them would rebuild the
    * index on every call there. */
  def save(spark: SparkSession, cents: Seq[(Int, Array[Double], Double)],
      path: String): Unit = {
    import spark.implicits._
    // coalesce(1): the index is KBs — one file, one footer to read back
    cents.map { case (cell, v, n) => (cell, v.toSeq, n) }
      .toDF("cell", "centroid", "norm_sq")
      .coalesce(1).write.mode("overwrite").parquet(path)
    touch(spark, s"$path/_BUILT")
  }

  private def touch(spark: SparkSession, p: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(hp, true).close()
  }

  private def marked(spark: SparkSession, p: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Load a saved index. Bounded driver collect — `cells` rows, the
    * same size class as the build's own centroid collect. */
  def load(spark: SparkSession, path: String): Seq[(Int, Array[Double], Double)] =
    spark.read.parquet(path).select("cell", "centroid", "norm_sq")
      .orderBy("cell").collect().toSeq.map {
        case Row(cell: Int, v: scala.collection.Seq[_], n: Double) =>
          (cell, v.map(_.asInstanceOf[Double]).toArray, n)
      }

  /** Build-if-absent convenience: load `path` when it already holds an
    * index, else build from `corpus` and save. The check reads only the
    * path listing, not the data. */
  def buildOrLoad(spark: SparkSession, corpus: org.apache.spark.sql.DataFrame,
      cells: Int, path: String): Seq[(Int, Array[Double], Double)] = {
    // gate on the artifact-owned marker ([[save]] writes it AFTER the
    // parquet job returns, so it is completion evidence even where the
    // committer's _SUCCESS files are disabled); a torn/partial write
    // never carries the marker and rebuilds (mode=overwrite clears it)
    if (marked(spark, s"$path/_BUILT"))
      load(spark, path)
    else {
      val cents = Similarity.ivfCentroids(corpus, cells)
      save(spark, cents, path)
      cents
    }
  }

  /** Persist the (vid, embedding, norm, cell) assignment of `corpus`
    * under `cents`, PARTITIONED BY CELL (round-12 verdict item 2): the
    * assignment is one full corpus pass at BUILD time — the same pass
    * a bare probe would spend per query batch — and partitioning by
    * cell turns every later probe into a partition-pruned read of only
    * the probed cells' directories (∝ nprobe/cells of the bytes).
    * The embedding and its decimal-exact norm ride along so the verify
    * stage never joins back to the unpartitioned corpus (floats and
    * doubles round-trip parquet bit-exactly, so probed answers stay
    * byte-identical to the inline build — IvfIndexSpec). */
  def saveAssignments(spark: SparkSession,
      corpus: org.apache.spark.sql.DataFrame,
      cents: Seq[(Int, Array[Double], Double)], path: String): Unit = {
    Similarity.assignedCorpus(corpus, cents)
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    // artifact-owned completion marker, written after the job returns:
    // a crash mid-commit leaves a SUBSET of cell partitions (the
    // round-13 torn-write hazard) with NO marker, so the load gate
    // rebuilds — and unlike _SUCCESS the marker appears even under
    // marksuccessfuljobs=false
    touch(spark, s"$path/_BUILT")
  }

  /** Read a persisted assignment back — lazy; filters on `cell` prune
    * to the matching partition directories. Heals a crashed
    * [[appendAssignments]] first, so a reader never serves a partial
    * delta as complete (round-19 advice — the append-mode write under
    * the pre-existing `_BUILT` marker reopened the torn-write hazard
    * the marker closed for saves). */
  def loadAssignments(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    healAppends(spark, path)
    spark.read.parquet(path)
  }

  /** The staged delta's sibling dir for one append token — OUTSIDE
    * `path`, so a reader of the assignment never lists it. */
  private def deltaDir(path: String, token: String): String =
    s"$path.delta_$token"

  /** Delta maintenance (the Faiss `add` semantic): assign `delta`
    * under the FROZEN quantizer `cents` — per-vector argmax over the
    * centroid literals, a pure map over the delta — and fold its rows
    * into the cell-partitioned assignment. Per-arrival cost is
    * delta-sized (one assignment map + a partitioned staged write +
    * file moves); the corpus is never re-read and the quantizer never
    * retrained, so recall drifts only as the data distribution does —
    * [[needsRetrain]] watches the drift signal and the deployment
    * runs [[retrain]] when it fires (q42g exercises the
    * grow-then-probe lifecycle; IvfIndexSpec pins appended state ≡ a
    * from-scratch assignment of the union under the same centroids).
    *
    * Crash protocol (round-19 advice closed — the old direct
    * append-mode write landed under the save's pre-existing `_BUILT`
    * marker, so a crash mid-commit left a torn delta that
    * [[loadAssignments]] served as complete, and the vid guard then
    * made every retry fail permanently). The ShingleIndex.append
    * discipline, adapted to the cell-partitioned layout: the delta
    * commits to a SIBLING dir first (token = XOR fold of the delta's
    * vid set, so a retry derives the same token), an underscore-hidden
    * `_PENDING_<token>` marker makes the append resumable, and
    * [[finishAppend]] splices by idempotent token-prefixed FILE MOVES
    * into the matching `cell=` dirs, ending with an
    * `_APPLIED_<token>` marker. A crash at any instant either leaves
    * the delta invisible (pre-marker — the retry re-stages) or heals
    * deterministically on the next load/append. A retried append of a
    * batch that already landed returns as a NO-OP (sentinel +
    * all-vids-present cross-check, which also closes the 2^-64
    * token-collision loss window); a genuinely overlapping batch
    * still fails fast. Mid-splice states are visible to CONCURRENT
    * readers (single-writer, non-snapshot — the flat ShingleIndex
    * contract); generational readers get old-XOR-new isolation from
    * [[commitGeneration]]'s pointer swap. `hook` is the
    * crash-injection seam ("staged" = delta written, pending marker
    * not yet down; "pending" = resumable, splice not yet run). */
  def appendAssignments(spark: SparkSession,
      delta: org.apache.spark.sql.DataFrame,
      cents: Seq[(Int, Array[Double], Double)], path: String,
      hook: String => Unit = _ => ()): Unit = {
    import org.apache.spark.sql.functions.{bit_xor, col, xxhash64}
    healAppends(spark, path) // finish any crashed append first
    sweepOrphans(spark, path) // writer-side only — see healAppends doc
    val a = Similarity.assignedCorpus(delta, cents)
      .transform(graft.Staging.stage) // guard + write share one pass
    val vids = a.select("vid").distinct()
    val idFold = vids.agg(bit_xor(xxhash64(col("vid")))).head()
    if (idFold.isNullAt(0)) { // empty delta
      graft.CheckpointJanitor.dropNow(a)
      return
    }
    val token = java.lang.Long.toHexString(idFold.getLong(0))
    val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(path))
    val applied = new org.apache.hadoop.fs.Path(s"$path/_APPLIED_$token")
    if (fs.exists(applied)) {
      // trust the sentinel only if every delta vid actually landed —
      // a colliding token from an OLDER batch has absent vids
      val missing = vids.join(
          spark.read.parquet(path).select("vid"), Seq("vid"), "left_anti")
        .limit(1).count()
      if (missing == 0L) { // retried append — already landed, no-op
        graft.CheckpointJanitor.dropNow(a)
        return
      }
      fs.delete(applied, false) // token collision: stale sentinel, clear
    }
    // fail fast on re-appended vids (a retried q42g-style build step
    // would otherwise silently duplicate them, and duplicated vids then
    // occupy multiple ranks in ivfTopKProbed results, displacing
    // genuine neighbors — round-18 advice). The check is delta-sized:
    // a column-pruned vid read of only the cells the delta lands in.
    if (marked(spark, s"$path/_BUILT")) {
      val hitCells = a.select("cell").distinct().collect().map(_.getInt(0))
      val dup = spark.read.parquet(path)
        .filter(col("cell").isin(hitCells.map(Int.box): _*))
        .select("vid")
        .join(vids, Seq("vid"), "left_semi")
        .limit(1).count()
      require(dup == 0L,
        s"appendAssignments would duplicate vids already assigned under $path")
    }
    a.write.mode("overwrite").partitionBy("cell")
      .parquet(deltaDir(path, token))
    graft.CheckpointJanitor.dropNow(a)
    hook("staged")
    touch(spark, s"$path/_PENDING_$token")
    hook("pending")
    finishAppend(spark, path, token)
  }

  /** The resumable tail of [[appendAssignments]] — idempotent, driven
    * from the committed delta dir alone: each staged `cell=` file
    * MOVES under a token-prefixed name (re-runs skip files already
    * moved), then the applied sentinel lands and the staging debris
    * goes. */
  private def finishAppend(spark: SparkSession, path: String,
      token: String): Unit = {
    val fs = hadoopFs(spark, new org.apache.hadoop.fs.Path(path))
    val staged = new org.apache.hadoop.fs.Path(deltaDir(path, token))
    if (fs.exists(staged)) {
      fs.listStatus(staged)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
        .foreach { cd =>
          val dstDir = new org.apache.hadoop.fs.Path(path, cd.getPath.getName)
          fs.mkdirs(dstDir)
          fs.listStatus(cd.getPath)
            .filter(_.getPath.getName.endsWith(".parquet"))
            .foreach { st =>
              val dst = new org.apache.hadoop.fs.Path(dstDir,
                s"$token-${st.getPath.getName}")
              // tolerate a concurrent healer winning the same move (a
              // reader healing the pending append we are finishing)
              if (!fs.exists(dst) && !fs.rename(st.getPath, dst))
                require(fs.exists(dst),
                  s"assignment delta splice failed: ${st.getPath} -> $dst")
            }
        }
    }
    // keep ONLY this append's sentinel: the no-op retry window is
    // "until the next append lands" (the ShingleIndex df-swap
    // semantics) — unbounded sentinel accumulation would grow the
    // root listing forever and multiply 2^-64 collision targets
    // (round-20 review); a later retry of an older accept hits the
    // dup guard instead, loudly
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath)
      .filter(p => p.getName.startsWith("_APPLIED_") &&
        p.getName != s"_APPLIED_$token")
      .foreach(p => fs.delete(p, false))
    touch(spark, s"$path/_APPLIED_$token")
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_PENDING_$token"), false)
    fs.delete(staged, true)
  }

  /** Finish a crashed [[appendAssignments]], whatever instant it died
    * at. Keyed entirely on the artifact-owned `_PENDING_*` markers.
    * NON-DESTRUCTIVE — safe from the read path: a pending marker
    * guarantees its delta is complete, so completing the splice can
    * never lose data. Debris sweeping is the WRITER's job
    * ([[sweepOrphans]]): a reader deleting an unmarked delta dir
    * would race the single writer in its window between the delta
    * write and the pending touch, silently discarding an in-flight
    * append (round-20 review). */
  private def healAppends(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopFs(spark, root)
    if (!fs.exists(root)) return
    fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("_PENDING_")).map(_.stripPrefix("_PENDING_"))
      .foreach(token => finishAppend(spark, path, token))
  }

  /** Sweep staged delta dirs whose pending marker never landed (crash
    * before the marker) or is gone (crash mid-cleanup). Run ONLY from
    * [[appendAssignments]] — single-writer means no sibling append is
    * in its pre-marker window when this runs. */
  private def sweepOrphans(spark: SparkSession, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopFs(spark, root)
    if (!fs.exists(root)) return
    val pending = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("_PENDING_")).map(_.stripPrefix("_PENDING_"))
    val parent = root.getParent
    if (parent != null && fs.exists(parent)) {
      val prefix = s"${root.getName}.delta_"
      fs.listStatus(parent).map(_.getPath)
        .filter(_.getName.startsWith(prefix))
        .filterNot(p => pending.contains(p.getName.stripPrefix(prefix)))
        .foreach(p => fs.delete(p, true))
    }
  }

  private def hadoopFs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Build-if-absent for the full index pair (centroids + cell-
    * partitioned assignment): one corpus pass for the quantizer, one
    * for the assignment, then every probe session loads KBs of
    * centroids and prunes the assignment by cell. */
  def buildOrLoadWithAssignments(spark: SparkSession,
      corpus: org.apache.spark.sql.DataFrame, cells: Int, path: String)
      : (Seq[(Int, Array[Double], Double)], org.apache.spark.sql.DataFrame) = {
    val assignPath = s"$path.assign"
    val cents = buildOrLoad(spark, corpus, cells, path)
    // the load gate is a COMPLETION marker, not "some cell= dir exists"
    // (round-13 review): a crash mid-commit leaves a SUBSET of cell
    // partitions that would load as a complete index forever — the
    // artifact-owned _BUILT marker only appears after saveAssignments'
    // job returned, so a partial write rebuilds (mode=overwrite clears
    // the debris)
    if (!marked(spark, s"$assignPath/_BUILT"))
      saveAssignments(spark, corpus, cents, assignPath)
    (cents, loadAssignments(spark, assignPath))
  }

  // ------------- generational lifecycle (q42h retrain) -------------
  //
  // The delta-append lifecycle above ([[appendAssignments]]) keeps the
  // quantizer FROZEN — the Faiss `add` semantic — and recall drifts as
  // the data distribution moves away from what the quantizer was
  // trained on. The documented remedy is the RETRAIN CADENCE: on the
  // deployment's rebuild schedule, re-train the quantizer over the
  // grown corpus, re-assign everything under it, and swap BOTH
  // artifacts (centroids + cell-partitioned assignment) atomically so
  // probes never see a new quantizer over an old assignment (cell ids
  // mean different regions under different centroids — a torn pair
  // would probe the wrong vectors, silently). The commit point is the
  // same pointer-swap pattern as the LSM shingle artifact
  // (StagedRefresh.swapPointer): generations stage completely under
  // `root/gen-N/{quantizer,assign}`, readers resolve `root/CURRENT`,
  // old XOR new across any crash instant, predecessor retained one
  // cycle for in-flight readers.

  private val Pointer = "CURRENT"
  private val GenPrefix = "gen-"

  /** The live generation dir, if a commit ever completed. */
  def currentGenDir(spark: SparkSession, root: String): Option[String] =
    StagedRefresh.readPointer(spark,
        new org.apache.hadoop.fs.Path(root), Pointer)
      .map(g => s"$root/$g")

  /** Readers over the live generation's (quantizer, assignment) pair. */
  def loadCurrent(spark: SparkSession, root: String)
      : (Seq[(Int, Array[Double], Double)], org.apache.spark.sql.DataFrame) = {
    val dir = currentGenDir(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed IVF generation under $root (pointer absent)"))
    (load(spark, s"$dir/quantizer"), loadAssignments(spark, s"$dir/assign"))
  }

  /** Stage `cents` + the assignment of `corpus` under them as the next
    * generation and atomically swap the pointer. `hook` is the
    * crash-injection seam ("staged" = both artifacts written, pointer
    * not swapped; "swapped" = committed, GC pending). Returns the new
    * generation dir name. The generation records its TRAINED cell
    * occupancy (max-cell count / total) at commit — the baseline
    * [[needsRetrain]]'s drift signal is measured against. */
  def commitGeneration(spark: SparkSession,
      corpus: org.apache.spark.sql.DataFrame,
      cents: Seq[(Int, Array[Double], Double)], root: String,
      hook: String => Unit = _ => ()): String = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(rootPath)
    val existing = fs.listStatus(rootPath).toSeq
      .map(_.getPath.getName).filter(_.startsWith(GenPrefix))
      .flatMap(n => n.stripPrefix(GenPrefix).toLongOption)
    val gen = GenPrefix + (existing.maxOption.getOrElse(0L) + 1L)
    // the generation the POINTER names is the one in-flight readers may
    // hold — that is what GC must spare (a crashed commit's orphan dir
    // may outnumber it; the StagedRefresh discipline)
    val prevLive = StagedRefresh.readPointer(spark, rootPath, Pointer)
    save(spark, cents, s"$root/$gen/quantizer")
    saveAssignments(spark, corpus, cents, s"$root/$gen/assign")
    val (oMax, oTotal) = occupancy(spark, s"$root/$gen/assign")
    writeText(spark, s"$root/$gen/OCCUPANCY", s"max=$oMax\ntotal=$oTotal")
    hook("staged")
    StagedRefresh.swapPointer(spark, rootPath, Pointer, gen)
    hook("swapped")
    val keep = Set(gen) ++ prevLive
    fs.listStatus(rootPath).foreach { st =>
      val n = st.getPath.getName
      if ((n.startsWith(GenPrefix) && !keep.contains(n)) ||
          n.startsWith(s".$Pointer.tmp-"))
        fs.delete(st.getPath, true)
    }
    gen
  }

  /** (max cell row count, total rows) of a cell-partitioned
    * assignment — ONE aggregate over the column-pruned `cell` column
    * (partition-value metadata; no embedding bytes move), the cheap
    * live read behind [[needsRetrain]]. Heals a crashed append first
    * (the [[loadAssignments]] invariant — a half-spliced delta would
    * otherwise skew the occupancy signal, round-20 review). */
  def occupancy(spark: SparkSession, assignPath: String): (Long, Long) = {
    import org.apache.spark.sql.functions.{count, lit, max, sum}
    healAppends(spark, assignPath)
    val r = spark.read.parquet(assignPath)
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(max("n"), sum("n")).head()
    if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
  }

  private def writeText(spark: SparkSession, p: String, text: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val out = hadoopFs(spark, hp).create(hp, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readOccupancy(spark: SparkSession,
      genDir: String): Option[(Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(s"$genDir/OCCUPANCY")
    val fs = hadoopFs(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val lines = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).linesIterator.toSeq
      finally in.close()
      def one(k: String) = lines.collectFirst {
        case l if l.startsWith(k + "=") => l.stripPrefix(k + "=").toLong }
      for (m <- one("max"); t <- one("total")) yield (m, t)
    }
  }

  /** DERIVED retrain trigger (round-19 verdict item 3 — the
    * `Pq.nprobeFor` discipline applied to the retrain cadence). The
    * drift signal IvfRetrainProbe measured is max-cell OCCUPANCY: a
    * frozen quantizer's cells crowd as drifted arrivals pile into the
    * few cells facing the new modes, and worst-case probe cost erodes
    * proportionally — candPerQ inflated +67% at the measured
    * maxCellFrac 0.186 vs the retrained 0.133 (SCALING.md round 19).
    * The trigger compares the LIVE occupancy fraction against the one
    * the generation COMMITTED with ([[driftRatio]]). Measured across
    * the SF decade (IvfRetrainProbe, round 20 — SCALING.md): natural
    * appends keep the ratio within [0.975, 1.08]; the drift fixture's
    * signatures read 1.40 / 1.57 / 1.69 at sf0.01 / 0.001 / 0.1; a
    * fresh retrain reads exactly 1.0 by construction. **1.25** sits
    * ≥3× the worst natural excursion above parity and ≤0.9× the
    * WEAKEST drift signature — the midpoint of the measured
    * separation gap. Being RELATIVE to the committed baseline the
    * trigger quiesces after a retrain even when the grown
    * distribution is genuinely lumpy (an absolute cap like 2/cells
    * would re-fire forever on multi-modal data the quantizer already
    * partitions as well as k-means can). */
  val RetrainOccupancyFactor = 1.25

  /** The live generation's drift signal: live max-cell occupancy
    * fraction ÷ the fraction the generation COMMITTED with. 1.0 = no
    * drift; the measured drift signatures land well above
    * [[RetrainOccupancyFactor]] while natural appends stay near 1
    * (IvfRetrainProbe prints this number per fixture — SCALING.md).
    * One column-pruned aggregate; no embedding reads, no probes. A
    * generation without a recorded baseline (pre-trigger artifact)
    * falls back to the 1/cells ideal — conservative: the ratio can
    * only read HIGHER. */
  def driftRatio(spark: SparkSession, root: String): Double = {
    val dir = currentGenDir(spark, root).getOrElse(
      throw new IllegalStateException(
        s"no committed IVF generation under $root (pointer absent)"))
    val (liveMax, liveTotal) = occupancy(spark, s"$dir/assign")
    if (liveTotal == 0L) return 1.0
    val baseline = readOccupancy(spark, dir) match {
      case Some((m, t)) if t > 0L && m > 0L => m.toDouble / t
      case _ => 1.0 / load(spark, s"$dir/quantizer").length
    }
    (liveMax.toDouble / liveTotal) / baseline
  }

  /** True when [[driftRatio]] has crossed
    * [[RetrainOccupancyFactor]] — the cheap, assignment-only signal
    * that the frozen quantizer no longer partitions the grown corpus
    * (see the factor's doc for the measured derivation). */
  def needsRetrain(spark: SparkSession, root: String): Boolean =
    driftRatio(spark, root) >= RetrainOccupancyFactor

  /** The RETRAIN CADENCE step: deterministic k-means
    * ([[Similarity.ivfCentroidsIter]] — strided seeds + `iters` exact-
    * decimal Lloyd rounds, fully oracle-replayable) over the GROWN
    * corpus (original ∪ every appended delta), a full re-assignment
    * under the new quantizer, and an atomic generation swap. Cost is
    * the build cost — iters× corpus passes + one assignment pass —
    * paid on the rebuild cadence, not per arrival; probes in flight
    * keep the old generation, the next probe sees the new one. */
  def retrain(spark: SparkSession, union: org.apache.spark.sql.DataFrame,
      cells: Int, iters: Int, root: String,
      hook: String => Unit = _ => ()): String =
    commitGeneration(spark, union,
      Similarity.ivfCentroidsIter(union, cells, iters), root, hook)
}
