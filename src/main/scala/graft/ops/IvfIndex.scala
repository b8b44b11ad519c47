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
    * to the matching partition directories. */
  def loadAssignments(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    spark.read.parquet(path)

  /** Delta maintenance (the Faiss `add` semantic): assign `delta`
    * under the FROZEN quantizer `cents` — per-vector argmax over the
    * centroid literals, a pure map over the delta — and APPEND its
    * rows to the cell-partitioned assignment. Per-arrival cost is
    * delta-sized (one assignment map + a partitioned append); the
    * corpus is never re-read and the quantizer never retrained, so
    * recall drifts only as the data distribution does — a production
    * deployment re-trains on its rebuild cadence and re-checks the
    * recall SLA then (q42g exercises the grow-then-probe lifecycle;
    * IvfIndexSpec pins appended state ≡ a from-scratch assignment of
    * the union under the same centroids). */
  def appendAssignments(spark: SparkSession,
      delta: org.apache.spark.sql.DataFrame,
      cents: Seq[(Int, Array[Double], Double)], path: String): Unit = {
    import org.apache.spark.sql.functions.col
    val a = Similarity.assignedCorpus(delta, cents)
      .transform(graft.Staging.stage) // guard + write share one pass
    // fail fast on re-appended vids (a retried q42g-style build step
    // would otherwise silently duplicate them, and duplicated vids then
    // occupy multiple ranks in ivfTopKProbed results, displacing
    // genuine neighbors — round-18 advice). The check is delta-sized:
    // a column-pruned vid read of only the cells the delta lands in.
    if (marked(spark, s"$path/_BUILT")) {
      val hitCells = a.select("cell").distinct().collect().map(_.getInt(0))
      val dup = loadAssignments(spark, path)
        .filter(col("cell").isin(hitCells.map(Int.box): _*))
        .select("vid")
        .join(a.select("vid").distinct(), Seq("vid"), "left_semi")
        .limit(1).count()
      require(dup == 0L,
        s"appendAssignments would duplicate vids already assigned under $path")
    }
    a.write.mode("append").partitionBy("cell").parquet(path)
    graft.CheckpointJanitor.dropNow(a)
  }

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
    * generation dir name. */
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
