package graft.ops

import graft.functions.{DecimalDot, LshBuckets}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md Q42 + north-star
  * ops): brute-force cosine top-k as the exact baseline, LSH-bucketed
  * ANN / near-dup as the scale path.
  *
  * Numeric discipline: dot products and norms accumulate per-term
  * decimal(23,14) values (exact, order-independent — `DecimalDot`) and
  * only the final cosine is IEEE double, so results are deterministic
  * across partitionings and bit-match the DuckDB oracle.
  *
  * The LSH hyperplanes are ±1 Rademacher directions: component j of
  * plane p takes the sign bit of splitmix64((p << 32) | j) — a full
  * avalanche mixer, so planes are pairwise independent (the previous
  * LCG-parity derivation produced bit-identical planes 17 and 24 and
  * 72 highly-agreeing pairs, silently degrading OR-amplification
  * recall). Pure integer arithmetic evaluated at PLAN BUILD TIME into
  * literal sign arrays, so the oracle reproduces the exact bucket ids
  * and every LSH query is hash-checkable (no engine-private hash
  * functions in the data path). OR-amplification: `tables` independent
  * hash tables of `planesPerTable` planes each; candidates = pairs
  * sharing any table's bucket.
  *
  * Scale knob: candidate volume per table is ~ Σ_buckets occ²/2. With a
  * FIXED planesPerTable the bucket count is constant and volume is
  * Θ(n²/2^planes) — quadratic in corpus size. `planesForCorpus` grows
  * the plane count with log₂(n) so expected occupancy stays constant
  * and candidate volume stays ~linear; `cosineNearDupsScaled` applies
  * it from the actual corpus count (see SCALING.md).
  */
object Similarity {

  val dim = 64 // embeddings fixture dimensionality (TESTDATA.md)

  /** Exact decimal dot product (see DecimalDot for the contract). */
  def dotDecimal(a: Column, b: Column): Column = DecimalDot(a, b)

  /** Exact decimal squared norm. */
  def normSqDecimal(a: Column): Column = DecimalDot(a, a)

  /** ±1 components of deterministic pseudo-random hyperplane `plane`:
    * sign bit of a splitmix64 mix over ((plane << 32) | j). Same
    * integers on both engines by construction; full avalanche makes
    * distinct planes statistically independent. */
  def planeSigns(plane: Int, d: Int = dim): IndexedSeq[Int] =
    (0 until d).map { j =>
      var z = ((plane.toLong << 32) | j.toLong) + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      if (z >= 0) 1 else -1
    }

  /** Plane-major sign matrix for tables×planesPerTable planes. */
  private def signMatrix(planesPerTable: Int, tables: Int): Array[Array[Int]] =
    Array.tabulate(tables * planesPerTable)(p => planeSigns(p).toArray)

  /** Bucket ids of `emb` in ALL hash tables, one array element per
    * table — a single one-pass codegen kernel (LshBuckets) instead of
    * tables×planesPerTable independent dot expressions. */
  def lshBucketsAll(emb: Column, planesPerTable: Int, tables: Int): Column =
    LshBuckets(emb, signMatrix(planesPerTable, tables), planesPerTable)

  /** Bucket id of `emb` in hash table `table` (single-table view of
    * the same kernel; kept for API symmetry with `bucketSql`). */
  def lshBucket(emb: Column, planesPerTable: Int, table: Int): Column =
    LshBuckets(emb, Array.tabulate(planesPerTable)(p =>
      planeSigns(table * planesPerTable + p).toArray), planesPerTable)
      .getItem(0)

  /** (id, tbl, bucket) rows — `tables` entries per vector. Only ids and
    * bucket longs flow into the candidate join; embeddings stay home. */
  private def bucketed(df: DataFrame, idCol: String,
      planesPerTable: Int, tables: Int): DataFrame =
    df.select(col(idCol),
      posexplode(lshBucketsAll(col("embedding"), planesPerTable, tables))
        .as(Seq("tbl", "bucket")))

  /** planes/table sized for constant expected bucket occupancy:
    * `ceil(log2(n / targetOccupancy))`, floored at 4. Per-table
    * candidate volume then stays ~ n·occupancy/2 — linear in n —
    * instead of Θ(n²/2^planes) at any fixed plane count. */
  def planesForCorpus(n: Long, targetOccupancy: Int = 64): Int =
    math.max(4, math.ceil(
      math.log(math.max(n, 1).toDouble / targetOccupancy) / math.log(2.0)).toInt)

  /** OR-amplification table count sized to HOLD recall as
    * [[planesForCorpus]] grows the plane count (round-12 verdict item
    * 1: a FIXED table count halves ANN recall at every corpus decade).
    * A true neighbor collides with the query on one plane with
    * probability p, on a whole table with p^planes, and overall recall
    * is 1-(1-p^planes)^tables — so each plane the corpus adds divides
    * the per-table hit rate by 1/p, and tables must grow ~(1/p)^Δ to
    * keep recall flat. Measured on the Gaussian fixture (SCALING.md
    * round-12/13 tables): (planes=5, tables=8) → 0.52 recall and
    * (planes=9, tables=32) → 0.43/0.47 — i.e. tables doubling every
    * ~2 planes holds the band, hence 2^((planes+3)/2).
    *
    * The +3 (not +1) anchor is the round-15 recall raise (round-14
    * verdict item 6: the 0.4x band is a teaching-baseline number, not
    * a production target): doubling the amplification at every scale
    * lifts the measured band to (planes=5, tables=16) → 0.77 and
    * (planes=9, tables=64) → 0.73 — ≥ 0.6 at 10× with the SAME
    * geometric growth law, at ~1.4× candidate-verify wall (AnnProbe
    * sweep, SCALING.md round 15; tables=128 reads 0.92 at flat wall
    * at this scale for callers who want more).
    *
    * COST CLASS, stated honestly: tables ≈ √(n/occupancy) — GEOMETRIC
    * in the corpus (~3.2× per decade), so candidate volume
    * ∝ tables·n·occupancy is Θ(n^1.5·√occupancy). That is the real
    * price of recall-stable random-hyperplane LSH (the fixed-plane
    * alternative is Θ(n²) at collapsing recall; fixed tables is
    * ~linear at collapsing recall — this dial buys flat recall at
    * n^1.5). When n^1.5 is too steep, the sub-quadratic scale path is
    * IVF cell probing ([[ivfTopKProbed]]: build Θ(n), probe
    * ∝ nprobe/cells with recall that HELD 0.60 → 0.67 at 10×). */
  def tablesForCorpus(n: Long, targetOccupancy: Int = 64, floor: Int = 8): Int =
    math.max(floor, 1 << ((planesForCorpus(n, targetOccupancy) + 3) / 2))

  /** Brute-force cosine top-k: broadcast the (small) query set against
    * the corpus — one pass over the corpus, no shuffle of the corpus
    * itself; per-query top-k via window. At 100 TB the corpus side
    * stays partition-local; only (query, k) results shuffle. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("vid"), col("embedding").as("ce"))
      .withColumn("cnorm", normSqDecimal(col("ce")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", normSqDecimal(col("qe")))
    val scored = c.join(broadcast(q), col("qid") =!= col("vid"))
      .withColumn("cosine",
        dotDecimal(col("qe"), col("ce")) / sqrt(col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vid"), col("rk"), round(col("cosine"), 6).as("cosine"))
  }

  /** HARD-NEGATIVE mining (q100): for each query vector, the `k`
    * nearest corpus vectors carrying a DIFFERENT label — the mining
    * step contrastive/retrieval training data needs (DPR/SBERT-style
    * triplets: the best negatives are the most-similar wrong-label
    * examples, random negatives teach nothing). Same deterministic
    * scoring discipline as [[cosineTopK]] (decimal-exact dot, total
    * tie-break on vid), with the label-mismatch predicate INSIDE the
    * join condition so same-label pairs never reach the ranker, and
    * the top-k is a per-query WindowGroupLimit — no full sort of the
    * candidate relation. Scale: the query side is the broadcast
    * (mining batches are bounded); the corpus side streams — at
    * 100 TB the exact pass becomes the IVF/PQ-pruned variant (q88b's
    * machinery) with this op's label predicate applied at the probe
    * join, unchanged output contract. */
  def hardNegatives(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = emb.select(col("vec_id").as("vid"), col("embedding").as("ce"),
        col("label").as("neg_label"))
      .withColumn("cnorm", normSqDecimal(col("ce")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("label").as("q_label"))
      .withColumn("qnorm", normSqDecimal(col("qe")))
    val scored = c.join(broadcast(q),
        col("qid") =!= col("vid") && col("neg_label") =!= col("q_label"))
      .withColumn("cosine",
        dotDecimal(col("qe"), col("ce")) / sqrt(col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("q_label"), col("vid"), col("neg_label"),
        col("rk"), round(col("cosine"), 6).as("cosine"))
  }

  /** [[hardNegatives]] riding the IVF probe (q100b) — the composed
    * scale path q100 documents, made real: the coarse quantizer prunes
    * each query's candidates to its `nprobe` best cells BEFORE the
    * label predicate and exact scoring run, so a mining batch touches
    * ∝ nprobe/cells of the corpus instead of all of it. Same
    * deterministic contract (decimal dots, vid tie-break); recall vs
    * the exact q100 is bounded by the coarse probe exactly as q88b's
    * is — a near-miss negative in an unprobed cell is unreachable, the
    * spec-pinned trade. Centroids/assignment are the q42d/e build
    * artifacts (shared oracle CTE prefix). */
  def hardNegativesIvf(emb: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, nprobe: Int = 8): DataFrame = {
    val cents = ivfCentroids(emb, cells)
    hardNegativesIvfProbed(cents, assignedCorpus(emb, cents), emb, queries,
      k, nprobe)
  }

  /** [[hardNegativesIvf]] against a PREBUILT index (round-17 verdict
    * item 3): `cents`/`assigned` come from `IvfIndex
    * .buildOrLoadWithAssignments`, so the quantizer build and the
    * corpus assignment pass move off the per-call path — the same
    * build-once discipline as q42e's `ivfTopKProbed`, and the same
    * index artifact (mining negatives and serving ANN share one
    * quantizer). The assignment relation carries no labels (the at-rest
    * schema is query-agnostic); labels join back here on vid — at 100
    * TB that join prunes to the probed cells' partitions first. */
  def hardNegativesIvfProbed(cents: Seq[(Int, Array[Double], Double)],
      assigned: DataFrame, emb: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    val q = probeCells(cents, queries, nprobe)
      .join(queries.select(col("vec_id").as("qid"), col("label").as("q_label")),
        Seq("qid"))
      .transform(graft.Staging.stage)
    val probed = q.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val a = assigned.filter(col("cell").isin(probed.map(Int.box): _*))
      .join(emb.select(col("vec_id").as("vid"), col("label").as("neg_label")),
        Seq("vid"))
    val scored = a.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("vid") && col("neg_label") =!= col("q_label"))
      .withColumn("cosine",
        dotDecimal(col("qe"), col("ce")) / sqrt(col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("q_label"), col("vid"), col("neg_label"),
        col("rk"), round(col("cosine"), 6).as("cosine"))
  }

  /** DuckDB restatement of [[hardNegativesIvf]] — the q42d quantizer/
    * assign/probe CTE prefix with the label-mismatch predicate in the
    * verify stage. */
  def hardNegativesIvfSql(cells: Int, nprobe: Int, k: Int,
      src: String = "embeddings",
      queryPred: String = "vec_id % 100 = 0"): String = {
    ivfQuantizerCte(cells, src) +
      ivfAssignProbeCte(nprobe, src, queryPred) + s""",
       |scored AS (
       |  SELECT p.qid, CAST(eq.label AS INTEGER) AS q_label,
       |    a.vid, CAST(ec.label AS INTEGER) AS neg_label,
       |    ${cosSql("eq.embedding", "ec.embedding", "nq.nrm", "nc.nrm")} AS cosine
       |  FROM probe p JOIN assign a ON a.cell = p.cell
       |  JOIN $src eq ON eq.vec_id = p.qid
       |  JOIN $src ec ON ec.vec_id = a.vid
       |  JOIN norms nq ON nq.vec_id = p.qid
       |  JOIN norms nc ON nc.vec_id = a.vid
       |  WHERE a.vid <> p.qid AND ec.label <> eq.label)
       |SELECT qid, q_label, vid, neg_label, CAST(rk AS INTEGER) AS rk,
       |  ROUND(cosine, 6) AS cosine FROM (
       |  SELECT qid, q_label, vid, neg_label, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
       |  FROM scored) WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin
  }

  /** ANN top-k: candidates = corpus vectors sharing any of the query's
    * `tables` LSH buckets (equi-join on (tbl, bucket) — never a cross
    * product), then exact cosine within the candidate set. The bucket
    * join carries only (id, tbl, bucket); embeddings are re-attached to
    * the DEDUPLICATED pair set, so each candidate is scored once however
    * many tables it collided in. Recall floor asserted in SimilaritySpec. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planesPerTable: Int = 4, tables: Int = 8): DataFrame = {
    val cb = bucketed(corpus.select(col("vec_id").as("vid"), col("embedding")),
      "vid", planesPerTable, tables)
    val qb = bucketed(queries.select(col("vec_id").as("qid"), col("embedding")),
      "qid", planesPerTable, tables)
    val cand = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("vid"))
      .select("qid", "vid").distinct()
    val c = corpus.select(col("vec_id").as("vid"), col("embedding").as("ce"))
      .withColumn("cnorm", normSqDecimal(col("ce")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", normSqDecimal(col("qe")))
    val scored = cand.join(c, "vid").join(broadcast(q), "qid")
      .withColumn("cosine",
        dotDecimal(col("qe"), col("ce")) / sqrt(col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vid"), col("rk"), round(col("cosine"), 6).as("cosine"))
  }

  /** [[annTopK]] with BOTH dials derived from the ACTUAL corpus size:
    * [[planesForCorpus]] keeps PER-TABLE candidate volume ~linear,
    * [[tablesForCorpus]] keeps recall flat as the plane count grows —
    * total candidate volume is then Θ(n^1.5) (see the cost-class note
    * on [[tablesForCorpus]]; IVF is the sub-quadratic path when that
    * is too steep). `tables > 0` overrides the derived table count
    * (probes and sweeps); the DEFAULT is the recall-stable
    * derivation. */
  def annTopKScaled(corpus: DataFrame, queries: DataFrame, k: Int,
      tables: Int = 0, targetOccupancy: Int = 64): DataFrame = {
    val n = corpus.count()
    val t = if (tables > 0) tables else tablesForCorpus(n, targetOccupancy)
    annTopK(corpus, queries, k, planesForCorpus(n, targetOccupancy), t)
  }

  /** Exact-decimal squared norm of a driver-side double array — the
    * norm literal attached to each centroid (same arithmetic as the
    * column-side [[normSqDecimal]]). */
  private def arrNormSq(v: Array[Double]): Double = {
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(v)
    graft.functions.DecimalDot.compute(ad, ad, false, false).doubleValue()
  }

  /** Per-row best `m` cells for a literal centroid list: array_max /
    * slice over (cosine, -cell) structs — a PURE MAP, no shuffle, no
    * window. Ties resolve to the smallest cell on both engines
    * (struct comparison on (cos DESC, cell ASC)). */
  private def bestCells(cents: Seq[(Int, Array[Double], Double)])(
      emb: Column, nrm: Column, m: Int): Column =
    slice(reverse(array_sort(array(cents.map { case (cell, v, vn) =>
      struct((dotDecimal(emb, array(v.map(lit(_)): _*)) /
        sqrt(nrm * lit(vn))).as("c"), lit(-cell).as("nc"))
    }: _*))), 1, m)

  /** IVF coarse quantizer: deterministic strided sample + ONE Lloyd
    * step, all oracle-reproducible.
    *
    *  1. SEED: the `cells` vectors at ids {0, stride, …, (cells-1)·
    *     stride}, stride = ⌊n/cells⌋ — a deterministic sample spread
    *     across the id range (the previous lowest-id block assumed
    *     id⊥geometry; a clustered head re-created quadratic verify in
    *     hot cells). Bounded driver collect: `cells` rows.
    *  2. LLOYD STEP: assign every corpus vector to its best seed
    *     (map-side argmax against seed literals), then refine each
    *     cell's centroid to the per-dimension EXACT DECIMAL SUM of its
    *     members' components. The sum is the UNNORMALIZED mean —
    *     cosine is scale-invariant, so dividing by the member count
    *     would change nothing downstream, and skipping the division
    *     keeps both engines bit-identical (decimal sums are exact and
    *     order-independent; a double division is neither necessary nor
    *     free of representation hazards). The shuffle carries
    *     (cell, dim, partial-decimal-sum) with map-side combine —
    *     cells×dim final rows, a bounded driver collect (16×64 here).
    *
    * Every cell is non-empty: each seed assigns to itself (self-cosine
    * 1 wins, ties to the smallest cell), so all `cells` sums exist.
    * Returns (cell, centroid, normSq(centroid)) literals. */
  def ivfCentroids(corpus: DataFrame, cells: Int): Seq[(Int, Array[Double], Double)] = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.DecimalType
    val n = corpus.count()
    if (n == 0) return Seq.empty // no corpus → no cells (stride/max math below assumes n > 0)
    val stride = math.max(1L, n / cells)
    val seedRows = corpus
      .filter(col("vec_id") % stride === 0 && col("vec_id") < stride * cells)
      .select((col("vec_id") / stride).cast("int").as("cell"), col("embedding"))
      .orderBy("cell").collect()
    val seeds: Seq[(Int, Array[Double], Double)] = seedRows.map {
      case Row(cell: Int, emb: scala.collection.Seq[_]) =>
        val v = emb.map(_.asInstanceOf[Float].toDouble).toArray
        (cell, v, arrNormSq(v))
    }.toSeq
    val assigned0 = corpus.select(col("embedding").as("ce"))
      .withColumn("cnorm", normSqDecimal(col("ce")))
      .withColumn("cell",
        -element_at(bestCells(seeds)(col("ce"), col("cnorm"), 1), 1).getField("nc"))
    // exact decimal per-dimension sums (posexplode → two-phase agg);
    // cast to DECIMAL(23,14) per term mirrors the oracle's CAST
    val sumRows = assigned0
      .select(col("cell"), posexplode(col("ce")).as(Seq("j", "x")))
      .groupBy("cell", "j")
      .agg(sum(col("x").cast("double").cast(DecimalType(23, 14))).as("s"))
      .collect()
    val dims = sumRows.map(_.getInt(1)).max + 1
    val byCell = sumRows.groupBy(_.getInt(0))
    // a cell with no members (possible only when duplicate seed vectors
    // tie and the smaller cell absorbs both) simply has no centroid —
    // dropped HERE exactly as the oracle's `sums` CTE drops it, so the
    // two engines keep identical cell sets
    (0 until cells).filter(byCell.contains).map { cell =>
      val arr = new Array[Double](dims)
      byCell(cell).foreach(r => arr(r.getInt(1)) = r.getDecimal(2).doubleValue())
      (cell, arr, arrNormSq(arr))
    }
  }

  /** One exact-decimal Lloyd step: assign every corpus vector to its
    * best centroid literal (pure-map cosine argmax), then refine each
    * cell's centroid to the per-dimension EXACT DECIMAL SUM of its
    * members' components (unnormalized — cosine is scale-invariant,
    * see [[ivfCentroids]]). Cells that lose all members are dropped,
    * exactly as the oracle's per-round `sums` CTE drops them. */
  private def lloydStep(prep: DataFrame,
      cents: Seq[(Int, Array[Double], Double)]): Seq[(Int, Array[Double], Double)] = {
    import org.apache.spark.sql.types.DecimalType
    // `prep` is the staged (ce, cnorm) relation — see ivfCentroidsIter:
    // the loop re-reads it every round, so the norm computation and the
    // source scan run once per TRAINING, not once per iteration
    val assigned = prep
      .withColumn("cell",
        -element_at(bestCells(cents)(col("ce"), col("cnorm"), 1), 1).getField("nc"))
    val sumRows = assigned
      .select(col("cell"), posexplode(col("ce")).as(Seq("j", "x")))
      .groupBy("cell", "j")
      .agg(sum(col("x").cast("double").cast(DecimalType(23, 14))).as("s"))
      .collect()
    val dims = sumRows.map(_.getInt(1)).max + 1
    val byCell = sumRows.groupBy(_.getInt(0))
    cents.map(_._1).filter(byCell.contains).map { cell =>
      val arr = new Array[Double](dims)
      byCell(cell).foreach(r => arr(r.getInt(1)) = r.getDecimal(2).doubleValue())
      (cell, arr, arrNormSq(arr))
    }
  }

  /** Deterministic k-means IVF quantizer (round-16 verdict item 2):
    * the strided seeds of [[ivfCentroids]] refined by `iters`
    * FIXED-iteration Lloyd steps in exact decimal arithmetic — no
    * convergence test, no randomness, so the whole training loop is
    * oracle-replayable ([[ivfQuantizerCteIter]] unrolls the identical
    * rounds as CTEs). Each iteration costs one corpus pass + a
    * (cell, dim, partial-sum) shuffle with map-side combine —
    * `iters`× the build cost of the one-step quantizer, zero change
    * to probe cost — and buys tighter cells: measured recall at
    * equal nprobe in SCALING.md round 16. `iters = 1` is bit-identical
    * to [[ivfCentroids]] (same seeds, same single step). */
  def ivfCentroidsIter(corpus: DataFrame, cells: Int,
      iters: Int): Seq[(Int, Array[Double], Double)] = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    import org.apache.spark.sql.Row
    val n = corpus.count()
    if (n == 0) return Seq.empty
    val stride = math.max(1L, n / cells)
    val seedRows = corpus
      .filter(col("vec_id") % stride === 0 && col("vec_id") < stride * cells)
      .select((col("vec_id") / stride).cast("int").as("cell"), col("embedding"))
      .orderBy("cell").collect()
    val seeds: Seq[(Int, Array[Double], Double)] = seedRows.map {
      case Row(cell: Int, emb: scala.collection.Seq[_]) =>
        val v = emb.map(_.asInstanceOf[Float].toDouble).toArray
        (cell, v, arrNormSq(v))
    }.toSeq
    // Stage the loop's input ONCE (round-22, guide §5 "cache what
    // loops read" — the MLlib KMeans discipline): every Lloyd round
    // re-reads the same (embedding, normSq) relation, and without a
    // barrier each of the `iters` rounds re-ran the source scan plus
    // the decimal norm computation. Each round still collects its
    // (cell, dim, sum) rows eagerly, so after the fold no consumer
    // remains and the blocks drop immediately.
    val prep = graft.Staging.stage(Dedup.spreadToCores(corpus)
      .select(col("embedding").as("ce"))
      .withColumn("cnorm", normSqDecimal(col("ce"))))
    val out = (1 to iters).foldLeft(seeds)((c, _) => lloydStep(prep, c))
    graft.CheckpointJanitor.dropNow(prep)
    out
  }

  /** (vid, cell) assignment of `corpus` under literal centroids — the
    * map-side argmax, exposed so specs can measure cell occupancy. */
  def ivfAssign(corpus: DataFrame,
      cents: Seq[(Int, Array[Double], Double)]): DataFrame =
    corpus.select(col("vec_id").as("vid"), col("embedding").as("ce"))
      .withColumn("cnorm", normSqDecimal(col("ce")))
      .withColumn("cell",
        -element_at(bestCells(cents)(col("ce"), col("cnorm"), 1), 1).getField("nc"))
      .select("vid", "cell")

  /** IVF (inverted-file) ANN top-k — the cell-probing alternative to
    * LSH OR-amplification:
    *
    *  1. COARSE QUANTIZER (index build): [[ivfCentroids]] — strided
    *     deterministic sample + one exact-decimal Lloyd step. The
    *     centroids materialize to the driver ONCE (a few KB — the same
    *     bounded driver-side step a KMeans `fit` performs) and become
    *     literal arrays, so cell assignment is a PURE MAP over the
    *     corpus: per row, an `array_max` over struct(cosine-to-
    *     centroid, -cell) — no shuffle, no window.
    *  2. PROBE: each query scores the same literal centroids and keeps
    *     its `nprobe` best cells.
    *  3. VERIFY: exact decimal cosine within probed cells only —
    *     corpus touched ∝ nprobe/cells.
    *
    * Deterministic end-to-end (decimal-exact dots and sums, total
    * tie-breaks), so the WHOLE pipeline — seeding, Lloyd sums,
    * assignments, probes, ranks — is DuckDB-hash-checkable (the oracle
    * recomputes identical centroids from the table; see [[ivfSql]]). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, nprobe: Int = 4): DataFrame =
    ivfTopKWith(ivfCentroids(corpus, cells), corpus, queries, k, nprobe)

  /** Probe-only IVF top-k against PREBUILT centroids — the production
    * split: [[ivfCentroids]] (or [[IvfIndex.buildOrLoad]]) runs once
    * per corpus version, this runs per query batch. At 100 TB the
    * rebuild-per-query a bare [[ivfTopK]] performs (a full corpus pass
    * + a cells×dim shuffle) is the anti-pattern; the loaded index is a
    * few KB of literals and the probe touches ∝ nprobe/cells of the
    * corpus. Bit-identical to the inline build for the same centroids
    * (IvfIndexSpec). */
  def ivfTopKWith(cents: Seq[(Int, Array[Double], Double)],
      corpus: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 4): DataFrame =
    ivfVerify(assignedCorpus(corpus, cents),
      probeCells(cents, queries, nprobe), k)

  /** (vid, ce, cnorm, cell) relation of `corpus` under literal
    * centroids — [[ivfAssign]] plus the embedding/norm columns the
    * verify stage needs. This is the relation [[IvfIndex
    * .saveAssignments]] persists partitioned by cell. */
  private[graft] def assignedCorpus(corpus: DataFrame,
      cents: Seq[(Int, Array[Double], Double)]): DataFrame =
    // spreadToCores (round-22): the per-row decimal argmax against
    // `cells` centroid literals is CPU-dense, and a compact corpus
    // arrives as ONE input split — the assignment ran serially
    // (measured: ~0.4 s single-task stages in q42f). Never shrinks an
    // already-wide scan.
    Dedup.spreadToCores(corpus)
      .select(col("vec_id").as("vid"), col("embedding").as("ce"))
      .withColumn("cnorm", normSqDecimal(col("ce")))
      .withColumn("cell", -element_at(bestCells(cents)(col("ce"), col("cnorm"), 1), 1)
        .getField("nc"))

  /** Cluster-balanced diverse subset selection (q74, the SemDeDup /
    * DiverseEvol curation shape): quantize the corpus with the IVF
    * coarse quantizer ([[ivfCentroids]] — strided seeds + one
    * exact-decimal Lloyd step, centroids become literals), score every
    * vector's REPRESENTATIVENESS as the cosine to its own cell's
    * centroid, and keep the top `m` most-representative vectors PER
    * CELL — a diversity-preserving subsample: every region of
    * embedding space keeps members, however dense or sparse, instead
    * of a global score cut that drains sparse regions. Plan shape:
    * assignment is the same pure map over the corpus as [[ivfTopK]]'s
    * (argmax over centroid literals, no shuffle); the only exchange is
    * the per-CELL ranking window — `cells` partitions whose combined
    * input is the corpus, frames bounded per cell. Output carries the
    * full verdict (cell, representativeness, rank, kept) so the
    * curation pipeline joins the drop back onto the corpus. */
  def clusterBalancedSelect(corpus: DataFrame, cells: Int,
      m: Int): DataFrame = {
    val cents = ivfCentroids(corpus, cells)
    val scored = corpus.select(col("vec_id").as("vid"), col("embedding").as("ce"))
      .withColumn("cnorm", normSqDecimal(col("ce")))
      .withColumn("best", element_at(bestCells(cents)(col("ce"), col("cnorm"), 1), 1))
      .select(col("vid"), (-col("best.nc")).as("cell"), col("best.c").as("cs"))
    val w = Window.partitionBy("cell").orderBy(col("cs").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .select(col("vid"), col("cell"), round(col("cs"), 6).as("rep"), col("rk"),
        when(col("rk") <= m, 1L).otherwise(0L).as("kept"))
  }

  /** Probe-only IVF top-k over a PRE-ASSIGNED corpus relation
    * (round-12 verdict item 2): a bare [[ivfTopKWith]] still recomputes
    * the cell argmax over 100% of the corpus on EVERY query batch —
    * the assignment is a build-time artifact exactly like the
    * centroids, so persist it once ([[IvfIndex.saveAssignments]],
    * partitioned by cell) and make each probe read ONLY the probed
    * cells' partitions. The probed cell ids are collected first — a
    * driver list bounded by the CELL COUNT (≤ cells ints, the same
    * size class as the centroid literals themselves) — and applied as
    * a LITERAL IN-filter on the partition column, so Catalyst prunes
    * the non-probed directories at plan time: the scan touches
    * ∝ nprobe/cells of the corpus bytes, not all of them
    * (IvfIndexSpec pins the pruned file count). */
  def ivfTopKProbed(cents: Seq[(Int, Array[Double], Double)],
      assigned: DataFrame, queries: DataFrame, k: Int,
      nprobe: Int = 4): DataFrame = {
    // materialize the probe relation ONCE: the cell-id collect and the
    // verify join share it, so the queries×cells decimal-dot argmax
    // doesn't run twice per probe call
    val q = probeCells(cents, queries, nprobe).transform(graft.Staging.stage)
    val probed = q.select("cell").distinct().collect().map(_.getInt(0)).sorted
    ivfVerify(assigned.filter(col("cell").isin(probed.map(Int.box): _*)), q, k)
  }

  /** (qid, qe, qnorm, cell) — each query row exploded to its `nprobe`
    * best cells under the literal centroids. */
  private[graft] def probeCells(cents: Seq[(Int, Array[Double], Double)],
      queries: DataFrame, nprobe: Int): DataFrame =
    queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", normSqDecimal(col("qe")))
      .withColumn("cell",
        explode(transform(bestCells(cents)(col("qe"), col("qnorm"), nprobe),
          s => -s.getField("nc"))))

  /** Shared verify stage: exact decimal cosine of every (query, corpus)
    * pair sharing a probed cell, per-query top-k. `q` is a
    * [[probeCells]] relation. */
  private def ivfVerify(assigned: DataFrame, q: DataFrame,
      k: Int): DataFrame = {
    val scored = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("vid"))
      .withColumn("cosine",
        dotDecimal(col("qe"), col("ce")) / sqrt(col("qnorm") * col("cnorm")))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vid"), col("rk"), round(col("cosine"), 6).as("cosine"))
  }

  /** LSH-blocked candidate pairs (vec_a < vec_b), deduplicated across
    * tables — the shared blocking stage of the near-dup paths, exposed
    * so specs can measure candidate volume growth directly. */
  def nearDupCandidates(emb: DataFrame, planesPerTable: Int,
      tables: Int): DataFrame = {
    val eb = bucketed(emb.select(col("vec_id"), col("embedding")),
      "vec_id", planesPerTable, tables)
    eb.as("a").join(eb.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs: multi-table LSH self-join
    * on (tbl, bucket), candidate pairs deduplicated, then exact-decimal
    * cosine verify against `threshold`. */
  def cosineNearDups(emb: DataFrame, planesPerTable: Int = 4,
      tables: Int = 4, threshold: Double = 0.35): DataFrame = {
    // The verify stage is CPU-dense (a 64-term exact-decimal dot per
    // candidate), not byte-dense: AQE would coalesce the few-MB pair
    // relation to 1-2 partitions and serialize it. Spread pairs over
    // the cluster's cores explicitly — partition count from compute,
    // not bytes.
    val cores = emb.sparkSession.sparkContext.defaultParallelism
    val cand = nearDupCandidates(emb, planesPerTable, tables)
      .repartition(cores, col("vec_a"), col("vec_b"))
    val e = emb.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", normSqDecimal(col("embedding")))
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
        col("nrm").as("na")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
        col("nrm").as("nb")), "vec_b")
      .withColumn("cosine", dotDecimal(col("ea"), col("eb")) / sqrt(col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** `cosineNearDups` with the plane count derived from the ACTUAL
    * corpus size (one narrow count, then `planesForCorpus`) — the
    * 100 TB entry point: bucket count grows with n, so candidate
    * volume stays ~linear instead of Θ(n²/2^planes). */
  def cosineNearDupsScaled(emb: DataFrame, tables: Int = 4,
      threshold: Double = 0.35, targetOccupancy: Int = 64): DataFrame =
    cosineNearDups(emb, planesForCorpus(emb.count(), targetOccupancy),
      tables, threshold)

  /** Occupancy-guarded near-dup (q42c's entry; round-12 verdict scale
    * sweep — the q41e auto-guard pattern applied to the OTHER measured
    * quadratic hazard, SCALING.md's 23-34x fixed-plane wall). Fixed
    * `planesPerTable` keeps the bucket ids oracle-checkable literals,
    * but candidate volume under fixed planes is Θ(n²/2^planes); the
    * guard runs the fixed-plane plan only while EXPECTED bucket
    * occupancy n/2^planes stays ≤ `maxOccupancy`, and switches to
    * [[cosineNearDupsScaled]] (planesForCorpus) above it. Oracle
    * scales sit far below the threshold (sf0.1: 5000/16 = 312), the
    * 10x derivation far above (3125), so the declared query stays
    * hash-checked at every oracle scale and never pays the
    * fixed-plane wall. The branches return the documented LSH
    * recall trade: more planes above the threshold means a
    * differently-blocked (still threshold-verified-exact) pair set. */
  def cosineNearDupsAuto(emb: DataFrame, planesPerTable: Int = 4,
      tables: Int = 4, threshold: Double = 0.35,
      maxOccupancy: Long = 1024): DataFrame =
    cosineNearDupsAutoWithPath(emb, planesPerTable, tables, threshold,
      maxOccupancy)._1

  /** [[cosineNearDupsAuto]] plus which branch ran (true = scaled) —
    * exposed so SimilaritySpec can pin the guard. */
  private[graft] def cosineNearDupsAutoWithPath(emb: DataFrame,
      planesPerTable: Int = 4, tables: Int = 4, threshold: Double = 0.35,
      maxOccupancy: Long = 1024): (DataFrame, Boolean) = {
    val n = emb.count()
    val useScaled = n > maxOccupancy * (1L << planesPerTable)
    graft.GuardLog.record("cosineNearDupsAuto", useScaled)
    val out =
      if (useScaled) cosineNearDupsScaled(emb, tables, threshold)
      else cosineNearDups(emb, planesPerTable, tables, threshold)
    (out, useScaled)
  }

  // ───────────────────────── oracle SQL emission ──────────────────────
  // The DuckDB twins of the expressions above, generated from the SAME
  // planeSigns constants so both engines see identical literal arrays.

  /** DuckDB literal list of the plane's ±1 signs. */
  private def signsSql(plane: Int): String =
    planeSigns(plane).mkString("[", ", ", "]")

  /** DuckDB decimal-exact dot of `ec` with plane `plane`'s signs. */
  private def planeDotSql(ec: String, plane: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $dim), " +
      s"j -> CAST(CAST($ec[j] AS DOUBLE) * (${signsSql(plane)})[j] AS DECIMAL(23,14)))) AS DOUBLE)"

  /** DuckDB bucket id of `ec` in hash table `table`. */
  def bucketSql(ec: String, planesPerTable: Int, table: Int): String =
    (0 until planesPerTable).map { p =>
      s"(CASE WHEN ${planeDotSql(ec, table * planesPerTable + p)} > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** DuckDB (vec_id, tbl, bucket) relation over `src` — the oracle twin
    * of `bucketed`, one UNION ALL branch per hash table. */
  def bucketedSql(src: String, planesPerTable: Int, tables: Int): String =
    (0 until tables).map { t =>
      s"SELECT vec_id, $t AS tbl, ${bucketSql("embedding", planesPerTable, t)} AS bucket FROM $src"
    }.mkString("\n      UNION ALL ")

  /** DuckDB decimal-exact dot between two embedding columns. */
  def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, $dim), " +
      s"j -> CAST(CAST($a[j] AS DOUBLE) * CAST($b[j] AS DOUBLE) AS DECIMAL(23,14)))) AS DOUBLE)"

  /** DuckDB twin of the ENTIRE [[ivfTopK]] pipeline — strided seeds,
    * one exact-decimal Lloyd step (unnormalized sums; cosine is
    * scale-invariant), assignment, probe, verify — recomputed from the
    * table so the full IVF answer hash-checks. `queryPred` selects the
    * query subset of `src`. */
  private def cosSql(e: String, c: String, ne: String, nc: String) =
    s"${dotSql(e, c)} / sqrt($ne * $nc)"

  /** The quantizer-build prefix shared by [[ivfSql]] and
    * [[clusterSelectSql]]: strided seeds, one exact-decimal Lloyd
    * step, refined centroids + norms (CTEs `st` … `cnorms`). Extracted
    * verbatim so both oracles recompute the IDENTICAL quantizer. */
  private[graft] def ivfQuantizerCte(cells: Int, src: String): String =
    s"""WITH st AS (SELECT CAST(GREATEST(COUNT(*) // $cells, 1) AS BIGINT) AS stride FROM $src),
       |seeds0 AS (SELECT CAST(vec_id // (SELECT stride FROM st) AS INTEGER) AS cell,
       |                  embedding AS se
       |           FROM $src
       |           WHERE vec_id % (SELECT stride FROM st) = 0
       |             AND vec_id < (SELECT stride FROM st) * $cells),
       |norms AS (SELECT vec_id, ${dotSql("embedding", "embedding")} AS nrm FROM $src),
       |snorms AS (SELECT cell, ${dotSql("se", "se")} AS sn FROM seeds0),
       |assign0 AS (
       |  SELECT vid, cell FROM (
       |    SELECT e.vec_id AS vid, s.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosSql("e.embedding", "s.se", "ne.nrm", "ns.sn")} DESC, s.cell ASC) AS rn
       |    FROM $src e CROSS JOIN seeds0 s
       |    JOIN norms ne ON ne.vec_id = e.vec_id
       |    JOIN snorms ns ON ns.cell = s.cell)
       |  WHERE rn = 1),
       |sums AS (
       |  SELECT a.cell, t.j,
       |    CAST(SUM(CAST(CAST(e.embedding[t.j] AS DOUBLE) AS DECIMAL(23,14))) AS DOUBLE) AS s
       |  FROM assign0 a JOIN $src e ON e.vec_id = a.vid,
       |       generate_series(1, $dim) AS t(j)
       |  GROUP BY a.cell, t.j),
       |cents AS (SELECT cell, list(s ORDER BY j) AS ce FROM sums GROUP BY cell),
       |cnorms AS (SELECT cell, ${dotSql("ce", "ce")} AS cn FROM cents)""".stripMargin

  /** DuckDB twin of the [[ivfCentroidsIter]] TRAINING LOOP: the
    * seeds/norms prefix of [[ivfQuantizerCte]], then `iters` UNROLLED
    * Lloyd rounds (assign_r → sums_r → cents_r → cnorms_r — fixed
    * iteration count, so no recursion is needed and every round's
    * assignment and decimal sums are restated bit-exactly). The final
    * round is aliased to `cents`/`cnorms`, so the same
    * [[ivfAssignProbeCte]] / verify tail as [[ivfSql]] composes
    * unchanged. */
  private[graft] def ivfQuantizerCteIter(cells: Int, src: String,
      iters: Int): String = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val head =
      s"""WITH st AS (SELECT CAST(GREATEST(COUNT(*) // $cells, 1) AS BIGINT) AS stride FROM $src),
         |seeds0 AS (SELECT CAST(vec_id // (SELECT stride FROM st) AS INTEGER) AS cell,
         |                  embedding AS se
         |           FROM $src
         |           WHERE vec_id % (SELECT stride FROM st) = 0
         |             AND vec_id < (SELECT stride FROM st) * $cells),
         |norms AS (SELECT vec_id, ${dotSql("embedding", "embedding")} AS nrm FROM $src),
         |snorms AS (SELECT cell, ${dotSql("se", "se")} AS sn FROM seeds0)""".stripMargin
    val rounds = (1 to iters).map { r =>
      val (srcCents, srcVec, srcNorms, srcNorm) =
        if (r == 1) ("seeds0", "se", "snorms", "sn")
        else (s"cents_${r - 1}", "ce", s"cnorms_${r - 1}", "cn")
      s""",
         |assign_$r AS (
         |  SELECT vid, cell FROM (
         |    SELECT e.vec_id AS vid, s.cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |        ${cosSql("e.embedding", s"s.$srcVec", "ne.nrm", s"ns.$srcNorm")} DESC, s.cell ASC) AS rn
         |    FROM $src e CROSS JOIN $srcCents s
         |    JOIN norms ne ON ne.vec_id = e.vec_id
         |    JOIN $srcNorms ns ON ns.cell = s.cell)
         |  WHERE rn = 1),
         |sums_$r AS (
         |  SELECT a.cell, t.j,
         |    CAST(SUM(CAST(CAST(e.embedding[t.j] AS DOUBLE) AS DECIMAL(23,14))) AS DOUBLE) AS s
         |  FROM assign_$r a JOIN $src e ON e.vec_id = a.vid,
         |       generate_series(1, $dim) AS t(j)
         |  GROUP BY a.cell, t.j),
         |cents_$r AS (SELECT cell, list(s ORDER BY j) AS ce FROM sums_$r GROUP BY cell),
         |cnorms_$r AS (SELECT cell, ${dotSql("ce", "ce")} AS cn FROM cents_$r)""".stripMargin
    }.mkString
    head + rounds +
      s""",
         |cents AS (SELECT cell, ce FROM cents_$iters),
         |cnorms AS (SELECT cell, cn FROM cnorms_$iters)""".stripMargin
  }

  /** DuckDB twin of the ENTIRE k-means-quantized IVF pipeline
    * (q42f): [[ivfQuantizerCteIter]] + the SAME assign/probe/verify
    * tail as [[ivfSql]]. */
  def ivfIterSql(cells: Int, nprobe: Int, k: Int, iters: Int,
      src: String = "embeddings",
      queryPred: String = "vec_id % 100 = 0"): String = {
    ivfQuantizerCteIter(cells, src, iters) +
      ivfAssignProbeCte(nprobe, src, queryPred) + s""",
       |scored AS (
       |  SELECT p.qid, a.vid,
       |    ${cosSql("eq.embedding", "ec.embedding", "nq.nrm", "nc.nrm")} AS cosine
       |  FROM probe p JOIN assign a ON a.cell = p.cell
       |  JOIN $src eq ON eq.vec_id = p.qid
       |  JOIN $src ec ON ec.vec_id = a.vid
       |  JOIN norms nq ON nq.vec_id = p.qid
       |  JOIN norms nc ON nc.vec_id = a.vid
       |  WHERE a.vid <> p.qid)
       |SELECT qid, vid, CAST(rk AS INTEGER) AS rk, ROUND(cosine, 6) AS cosine FROM (
       |  SELECT qid, vid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
       |  FROM scored) WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin
  }

  /** DuckDB twin of [[clusterBalancedSelect]]: the shared quantizer
    * CTEs, then per-vector best (cell, representativeness-cosine) and
    * a per-cell rank — identical tie-breaks to the Spark side. */
  def clusterSelectSql(cells: Int, m: Int,
      src: String = "embeddings"): String =
    ivfQuantizerCte(cells, src) + s""",
       |rep0 AS (
       |  SELECT vid, cell, cs FROM (
       |    SELECT e.vec_id AS vid, c.cell,
       |      ${cosSql("e.embedding", "c.ce", "ne.nrm", "cn.cn")} AS cs,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosSql("e.embedding", "c.ce", "ne.nrm", "cn.cn")} DESC, c.cell ASC) AS rn
       |    FROM $src e CROSS JOIN cents c
       |    JOIN norms ne ON ne.vec_id = e.vec_id
       |    JOIN cnorms cn ON cn.cell = c.cell)
       |  WHERE rn = 1),
       |r AS (SELECT vid, cell, cs,
       |        ROW_NUMBER() OVER (PARTITION BY cell ORDER BY cs DESC, vid) AS rk
       |      FROM rep0)
       |SELECT vid, cell, ROUND(cs, 6) AS rep, CAST(rk AS BIGINT) AS rk,
       |  CAST(CASE WHEN rk <= $m THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM r ORDER BY cell, rk""".stripMargin

  /** The assign + query-slice + probe CTEs shared by [[ivfSql]] and
    * [[Pq.ivfpqSql]] (extracted verbatim so both oracles recompute the
    * IDENTICAL assignment and probe sets). Appends to a
    * [[ivfQuantizerCte]] prefix — references its `cents`, `norms`,
    * `cnorms`. */
  private[graft] def ivfAssignProbeCte(nprobe: Int, src: String,
      queryPred: String): String =
    s""",
       |assign AS (
       |  SELECT vid, cell FROM (
       |    SELECT e.vec_id AS vid, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosSql("e.embedding", "c.ce", "ne.nrm", "cn.cn")} DESC, c.cell ASC) AS rn
       |    FROM $src e CROSS JOIN cents c
       |    JOIN norms ne ON ne.vec_id = e.vec_id
       |    JOIN cnorms cn ON cn.cell = c.cell)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id, embedding FROM $src WHERE $queryPred),
       |probe AS (
       |  SELECT qid, cell FROM (
       |    SELECT q.vec_id AS qid, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${cosSql("q.embedding", "c.ce", "nq.nrm", "cn.cn")} DESC, c.cell ASC) AS rn
       |    FROM q CROSS JOIN cents c
       |    JOIN norms nq ON nq.vec_id = q.vec_id
       |    JOIN cnorms cn ON cn.cell = c.cell)
       |  WHERE rn <= $nprobe)""".stripMargin

  /** DuckDB twin of the MAINTAINED-index probe (q42g): the quantizer
    * is trained on — and FROZEN at — the original corpus slice
    * (`corpusPred`), while assignment and verify run over the full
    * table (original ∪ delta): exactly the state
    * [[IvfIndex.appendAssignments]] leaves on disk after the delta is
    * assigned under the frozen centroids and appended. The fragments
    * mirror [[ivfAssignProbeCte]]/[[ivfSql]] with the norm relation
    * widened to the union (`normsu`) — the quantizer prefix's `norms`
    * covers only the training slice. */
  def ivfDeltaSql(cells: Int, nprobe: Int, k: Int,
      corpusPred: String = "vec_id % 10 <> 7",
      queryPred: String = "vec_id % 100 = 0"): String = {
    val head = ivfQuantizerCte(cells, "corpus0").replaceFirst(
      "^WITH ",
      java.util.regex.Matcher.quoteReplacement( // corpusPred may carry $ or \
        s"WITH corpus0 AS (SELECT vec_id, embedding FROM embeddings WHERE $corpusPred),\n"))
    head + s""",
       |normsu AS (SELECT vec_id, ${dotSql("embedding", "embedding")} AS nrm FROM embeddings),
       |assignu AS (
       |  SELECT vid, cell FROM (
       |    SELECT e.vec_id AS vid, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ${cosSql("e.embedding", "c.ce", "ne.nrm", "cn.cn")} DESC, c.cell ASC) AS rn
       |    FROM embeddings e CROSS JOIN cents c
       |    JOIN normsu ne ON ne.vec_id = e.vec_id
       |    JOIN cnorms cn ON cn.cell = c.cell)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id, embedding FROM embeddings WHERE $queryPred),
       |probe AS (
       |  SELECT qid, cell FROM (
       |    SELECT q.vec_id AS qid, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        ${cosSql("q.embedding", "c.ce", "nq.nrm", "cn.cn")} DESC, c.cell ASC) AS rn
       |    FROM q CROSS JOIN cents c
       |    JOIN normsu nq ON nq.vec_id = q.vec_id
       |    JOIN cnorms cn ON cn.cell = c.cell)
       |  WHERE rn <= $nprobe),
       |scored AS (
       |  SELECT p.qid, a.vid,
       |    ${cosSql("eq.embedding", "ec.embedding", "nq.nrm", "nc.nrm")} AS cosine
       |  FROM probe p JOIN assignu a ON a.cell = p.cell
       |  JOIN embeddings eq ON eq.vec_id = p.qid
       |  JOIN embeddings ec ON ec.vec_id = a.vid
       |  JOIN normsu nq ON nq.vec_id = p.qid
       |  JOIN normsu nc ON nc.vec_id = a.vid
       |  WHERE a.vid <> p.qid)
       |SELECT qid, vid, CAST(rk AS INTEGER) AS rk, ROUND(cosine, 6) AS cosine FROM (
       |  SELECT qid, vid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
       |  FROM scored) WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin
  }

  def ivfSql(cells: Int, nprobe: Int, k: Int,
      src: String = "embeddings",
      queryPred: String = "vec_id % 100 = 0"): String = {
    ivfQuantizerCte(cells, src) +
      ivfAssignProbeCte(nprobe, src, queryPred) + s""",
       |scored AS (
       |  SELECT p.qid, a.vid,
       |    ${cosSql("eq.embedding", "ec.embedding", "nq.nrm", "nc.nrm")} AS cosine
       |  FROM probe p JOIN assign a ON a.cell = p.cell
       |  JOIN $src eq ON eq.vec_id = p.qid
       |  JOIN $src ec ON ec.vec_id = a.vid
       |  JOIN norms nq ON nq.vec_id = p.qid
       |  JOIN norms nc ON nc.vec_id = a.vid
       |  WHERE a.vid <> p.qid)
       |SELECT qid, vid, CAST(rk AS INTEGER) AS rk, ROUND(cosine, 6) AS cosine FROM (
       |  SELECT qid, vid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
       |  FROM scored) WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin
  }
}
