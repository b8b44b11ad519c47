package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product quantization (PQ) with asymmetric-distance (ADC) search —
  * the EMBEDDING-COMPRESSION rung of the ANN ladder (q42 brute →
  * q42b LSH → q42d/e IVF → here): at 100 TB of `float[64]` vectors
  * the raw corpus is the storage/IO bottleneck, and PQ is the
  * standard answer (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 — the Faiss IVFPQ layout). The corpus
  * is kept as M=16 one-byte codes per vector — 16× smaller than the
  * floats — and queries scan codes, not vectors.
  *
  *  - CODEBOOKS (index build): the embedding splits into M=16
  *    4-dim subvectors; each subspace's K=16 centroids are the
  *    subvector slices of a deterministic strided sample (the
  *    [[Similarity.ivfCentroids]] seeding discipline — one shared
  *    stride so the oracle restates the sample as a WHERE clause).
  *    Bounded driver collect: K full vectors.
  *  - ENCODE (one corpus pass, PURE MAP): per subspace, the code is
  *    the argmin of the exact squared L2 distance to the 16 centroid
  *    literals — `array_sort` over (d², code) structs, ties to the
  *    smallest code. No shuffle: the codes relation (vid, c0..c15)
  *    is the persistable 100 TB artifact.
  *  - ADC SHORTLIST: each query precomputes a 16-entry distance
  *    table per subspace against the same centroid literals
  *    (broadcast); every corpus vector's approximate d² is 16 table
  *    LOOKUPS — no float multiply touches the corpus at query time.
  *    Each table entry is cast to DECIMAL(23,14) at the boundary, so
  *    the 16-term ADC sum is EXACT and association-free (no IEEE
  *    tree to pin) — the shortlist cut (top `shortlist` by adc, vid)
  *    is engine- and partitioning-independent.
  *  - RERANK: exact full-dim L2 over the shortlist only — the
  *    two-stage deployment every PQ system runs. Work ∝ shortlist,
  *    not corpus.
  *
  * Determinism: subspace d² = `((‖x‖² − (2·⟨x,c⟩)) + ‖c‖²)` with
  * decimal-exact norm/dot terms ([[graft.functions.DecimalDot]] /
  * per-term DECIMAL(23,14) casts in [[pqSql]]) combined in one fixed
  * IEEE tree; the ADC sum is decimal-exact; rerank d² uses the fixed
  * tree `((‖c‖² + ‖q‖²) − (2·⟨q,c⟩))`; every rank breaks ties by
  * vid. The whole codebook→encode→ADC→rerank pipeline hash-checks.
  * Recall vs the exact L2 top-k is asserted in GraphAnalyticsSpec
  * and measured at 10× in SCALING.md. Composes with q42e: IVF prunes
  * cells, PQ compresses the vectors inside them.
  */
object Pq {

  val M = 16
  val K = 16
  val subDim: Int = Similarity.dim / M

  private def arrNormSq(v: Array[Double]): Double = {
    val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(v)
    graft.functions.DecimalDot.compute(ad, ad, false, false).doubleValue()
  }

  /** (m, code, centroid-subvector, ‖c‖²) literals — K strided sample
    * vectors sliced into M subspaces. */
  def codebooks(corpus: DataFrame): Seq[(Int, Int, Array[Double], Double)] = {
    import org.apache.spark.sql.Row
    val n = corpus.count()
    if (n == 0) return Seq.empty
    val stride = math.max(1L, n / K)
    val rows = corpus
      .filter(col("vec_id") % stride === 0 && col("vec_id") < stride * K)
      .select((col("vec_id") / stride).cast("int").as("code"), col("embedding"))
      .orderBy("code").collect()
    for {
      r <- rows.toSeq
      m <- 0 until M
    } yield {
      val full = r match {
        case Row(_: Int, emb: scala.collection.Seq[_]) =>
          emb.map(_.asInstanceOf[Float].toDouble).toArray
      }
      val sub = full.slice(m * subDim, (m + 1) * subDim)
      (m, r.getInt(0), sub, arrNormSq(sub))
    }
  }

  /** Exact-decimal squared L2 of `sub` (whose decimal ‖·‖² is
    * `subNorm`) to a centroid literal — the fixed IEEE tree the
    * oracle mirrors. */
  private def d2(sub: Column, subNorm: Column, cent: Array[Double],
      cn: Double): Column =
    (subNorm - (lit(2.0) * Similarity.dotDecimal(
      sub, array(cent.map(lit(_)): _*)))) + lit(cn)

  private def subCol(emb: Column, m: Int): Column =
    slice(emb, m * subDim + 1, subDim)

  /** Argmin code of subspace `m` under `cb` — array_sort over
    * (d², code) structs, ties to the smallest code. */
  private def bestCode(cb: Seq[(Int, Int, Array[Double], Double)], m: Int)(
      sub: Column, subNorm: Column): Column =
    element_at(array_sort(array(cb.collect {
      case (`m`, code, v, vn) =>
        struct(d2(sub, subNorm, v, vn).as("d"), lit(code).as("c"))
    }: _*)), 1).getField("c")

  /** PQ codebooks refined by `iters` FIXED exact-arithmetic Lloyd
    * steps per subspace (round-17 verdict item 7 — q42f's
    * deterministic-k-means discipline extended to the strided
    * codebooks): encode the corpus under the current books, then each
    * (m, code)'s centroid becomes the per-dim MEAN of its members'
    * subvectors. Per-dim sums are exact DECIMAL(23,14) with map-side
    * combine (M×K×subDim collected rows — literals, not data); the
    * mean is ONE double division per dim, exactly-rounded IEEE on
    * both engines, so the trained books are oracle-replayable
    * ([[pqKmeansSql]] unrolls the identical rounds as CTEs). Unlike
    * the IVF quantizer, the L2 metric is NOT scale-invariant, so the
    * division is load-bearing — sum-centroids would mis-scale every
    * distance. Codes that lose all members drop, exactly as empty IVF
    * cells do. `iters = 0` is the raw strided sample. */
  def codebooksIter(corpus: DataFrame,
      iters: Int): Seq[(Int, Int, Array[Double], Double)] = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    (1 to iters).foldLeft(codebooks(corpus))((c, _) => pqLloydStep(corpus, c))
  }

  /** Default Lloyd depth for [[codebooksIter]] — the `nprobeFor`/
    * `depth()` discipline applied to the TRAINING dial (round-18
    * verdict item 5: the old pinned iters=1 left measured recall on
    * the table). Derivation is the PqKmeansProbe sweep (SCALING.md
    * round 18): recall@5 at equal M is 0.920/0.800 across the
    * 1×/10× decade at iters=1 and 0.960/0.850 at iters=2, so 2 is the
    * smallest depth whose recall clears the ≥0.85 band at BOTH ends —
    * and the qerr descent is already inside the diminishing-returns
    * knee there (0.454 → 0.375 → 0.356: −17.4% then −5.1%; a third
    * step buys <5% error and no measured recall). Training cost is
    * linear in iters and BUILD-time only; callers with a measured
    * recall target pass `iters` explicitly, exactly like `shortlist`
    * and `nprobe`. */
  val LloydIters = 2

  private def pqLloydStep(corpus: DataFrame,
      cb: Seq[(Int, Int, Array[Double], Double)])
      : Seq[(Int, Int, Array[Double], Double)] = {
    val coded = withCodeCols(corpus.select(col("vec_id").as("vid"),
      col("embedding").as("e")), "e", cb)
    val parts = (0 until M).map { m =>
      coded.select(lit(m).as("m"), col(s"c$m").as("code"),
        posexplode(subCol(col("e"), m)).as(Seq("j", "x")))
    }
    val sumRows = parts.reduce(_.unionByName(_))
      .groupBy("m", "code", "j")
      .agg(sum(col("x").cast("double").cast(DecimalType(23, 14))).as("s"),
        count(lit(1)).as("n"))
      .collect()
    sumRows.groupBy(r => (r.getInt(0), r.getInt(1))).toSeq
      .map { case ((m, code), rs) =>
        val arr = new Array[Double](subDim)
        rs.foreach { r =>
          arr(r.getInt(2)) = r.getDecimal(3).doubleValue() / r.getLong(4)
        }
        (m, code, arr, arrNormSq(arr))
      }
      .sortBy(t => (t._1, t._2))
  }

  /** One-pass PQ encode: (vid, c0..c15) — 16 bytes of codes per
    * 256-byte vector, the persistable artifact. Pure map, no shuffle,
    * ONE fused kernel call per row ([[graft.functions.PqCodes]] —
    * round 16: the composed M×K expression tree exceeded janino's
    * 64 KB method limit and silently dropped the whole corpus pass out
    * of whole-stage codegen; the kernel is bit-identical, spec-pinned
    * against the composed form). */
  def encode(corpus: DataFrame,
      cb: Seq[(Int, Int, Array[Double], Double)]): DataFrame =
    withCodeCols(corpus.select(col("vec_id").as("vid"),
      col("embedding").as("e")), "e", cb).drop("e")

  /** Attach c0..c15 via the fused kernel to any relation carrying an
    * embedding/residual array column. */
  private[graft] def withCodeCols(df: DataFrame, embCol: String,
      cb: Seq[(Int, Int, Array[Double], Double)]): DataFrame = {
    val withCodes = df.withColumn("_codes",
      graft.functions.PqCodes(col(embCol), cb, M, subDim))
    (0 until M).foldLeft(withCodes) { (d, m) =>
      d.withColumn(s"c$m", element_at(col("_codes"), m + 1))
    }.drop("_codes")
  }

  /** The composed (expression-tree) encoder — kept as the semantic
    * reference the kernel is spec-pinned against. */
  private[graft] def encodeComposed(corpus: DataFrame,
      cb: Seq[(Int, Int, Array[Double], Double)]): DataFrame = {
    val base = corpus.select(col("vec_id").as("vid"), col("embedding").as("e"))
    (0 until M).foldLeft(base) { (df, m) =>
      val sub = subCol(col("e"), m)
      df.withColumn(s"c$m",
        bestCode(cb, m)(sub, Similarity.normSqDecimal(sub)))
    }.drop("e")
  }

  /** PQ two-stage top-k: ADC shortlist over the codes relation, exact
    * full-dim L2 rerank of the shortlist.
    *
    * `shortlist ≤ 0` (the default) derives the depth from the ACTUAL
    * corpus size — `max(100, n/50)`, i.e. 2% of the corpus with a
    * 100 floor — the q42e dial discipline: a FIXED depth quietly
    * decays recall as the corpus grows (measured 0.72 → 0.45 across
    * one decade at R=100; the derived rule holds ~0.72 at both ends,
    * SCALING.md). Rerank cost is then 2% of one brute-force pass; the
    * production composition puts IVF in front (prune cells, THEN ADC
    * within them) when even the code scan is too much. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int = 0): DataFrame = {
    val cb = codebooks(corpus)
    val codes = encode(corpus, cb)
    val pairs = codes.join(broadcast(withQdTables(queries, cb)),
      col("qid") =!= col("vid"))
    rerank(adcShortlist(pairs, depth(corpus, shortlist)), corpus, queries, k)
  }

  /** [[pqTopK]] with k-means-trained codebooks ([[codebooksIter]]):
    * same encode/ADC/rerank machinery, tighter subspace cells — the
    * remaining Faiss-parity gap closed. Training cost is iters×
    * (one corpus encode pass + an (m, code, j) decimal shuffle) at
    * BUILD time; query cost is unchanged. Measured recall gain at
    * equal M in SCALING.md (PqKmeansProbe). */
  def pqTopKKmeans(corpus: DataFrame, queries: DataFrame, k: Int,
      iters: Int = LloydIters, shortlist: Int = 0): DataFrame = {
    val cb = codebooksIter(corpus, iters)
    val codes = encode(corpus, cb)
    val pairs = codes.join(broadcast(withQdTables(queries, cb)),
      col("qid") =!= col("vid"))
    rerank(adcShortlist(pairs, depth(corpus, shortlist)), corpus, queries, k)
  }

  /** Default IVFPQ operating point: `max(4, cells/2)` probed cells —
    * the `depth()` discipline applied to the RECALL dial (round-16
    * verdict item 1: the old hard-coded nprobe=4 sat at 0.550/0.496
    * recall across the 1×/10× decade, below the engine's own ≥0.6
    * band). Derivation is the measured IvfpqProbe sweep (SCALING.md
    * round 16): recall tracks the coarse-probe ceiling, and cells/2
    * is the smallest sweep point whose recall clears 0.6 at BOTH ends
    * of the decade (0.670 @ 1×, 0.631 @ 10× vs ceilings 0.850/0.805)
    * — at ≤1× the nprobe=4 wall (the ADC scan stays nprobe/cells-
    * proportional and the rerank is shortlist-bounded). Callers with
    * a measured recall target pass `nprobe` explicitly, exactly like
    * `shortlist`. */
  def nprobeFor(cells: Int): Int = math.max(4, cells / 2)

  /** IVFPQ (the Faiss composition, stated in one declared pipeline):
    * the IVF coarse quantizer prunes the candidate set to the query's
    * `nprobe` best cells (corpus touched ∝ nprobe/cells — q42e's
    * property), and ADC scores only the SURVIVING vectors' codes
    * before the exact rerank. Same deterministic pieces as [[pqTopK]]
    * and [[Similarity.ivfTopK]] — this variant quantizes raw vectors
    * per cell (classic IVF+PQ-on-raw; [[ivfpqResidualTopK]] is the
    * Faiss residual refinement). At 100 TB: the only
    * corpus-proportional terms are the two index builds (each one
    * pass) — a query batch touches nprobe/cells of the CODES, i.e.
    * half of 1/16th of the raw bytes at the derived default.
    * `nprobe ≤ 0` (the default) derives the probe width from the cell
    * geometry ([[nprobeFor]]). */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, nprobe: Int = 0, shortlist: Int = 0): DataFrame = {
    val np = if (nprobe > 0) nprobe else nprobeFor(cells)
    val cents = Similarity.ivfCentroids(corpus, cells)
    val assigned = Similarity.ivfAssign(corpus, cents)
    val probe = Similarity.probeCells(cents, queries, np)
      .select("qid", "cell")
    val cb = codebooks(corpus)
    val codes = encode(corpus, cb)
    val cand = probe.join(assigned, "cell")
      .filter(col("qid") =!= col("vid")).select("qid", "vid")
    val pairs = cand.join(codes, "vid")
      .join(broadcast(withQdTables(queries, cb)), "qid")
    rerank(adcShortlist(pairs, depth(corpus, shortlist)), corpus, queries, k)
  }

  private def depth(corpus: DataFrame, shortlist: Int): Int =
    if (shortlist > 0) shortlist
    else math.max(100L, corpus.count() / 50).toInt

  // ── residual encoding (q88c — the Faiss IVFPQ refinement) ────────
  // Raw-vector PQ wastes its 16 codes per subspace describing the
  // coarse structure the IVF cell id ALREADY encodes; quantizing the
  // RESIDUAL x − μ(cell(x)) spends them on the within-cell detail
  // instead, so the ADC ranking inside probed cells tracks the true
  // distance much more tightly (measured: the ADC→ceiling gap closes
  // in SCALING.md round 16). Determinism discipline: μ is the
  // per-cell per-dim EXACT DECIMAL SUM cast to double divided by the
  // exact member count (ONE IEEE division per dim, identical both
  // engines); residual components are one IEEE subtraction each; all
  // d² terms then flow through the same DECIMAL(23,14) casts as the
  // raw variant, so the whole pipeline stays hash-checkable.

  /** Per-cell mean vectors under the FINAL centroids' assignment —
    * (cell, μ) literals. Bounded driver collect: cells×dim rows. */
  def cellMeans(corpus: DataFrame,
      cents: Seq[(Int, Array[Double], Double)]): Seq[(Int, Array[Double])] = {
    val assigned = Similarity.assignedCorpus(corpus, cents)
    val rows = assigned
      .select(col("cell"), posexplode(col("ce")).as(Seq("j", "x")))
      .groupBy("cell", "j")
      .agg(sum(col("x").cast("double").cast(DecimalType(23, 14))).as("s"),
        count(lit(1)).as("cnt"))
      .collect()
    val dims = rows.map(_.getInt(1)).max + 1
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (cell, rs) =>
      val arr = new Array[Double](dims)
      rs.foreach(r => arr(r.getInt(1)) = r.getDecimal(2).doubleValue() / r.getLong(3))
      (cell, arr)
    }
  }

  /** `array<double>` residual of an embedding column against its
    * row's cell mean (μ looked up in a cell-keyed map literal). */
  private def residualCol(emb: Column, cellCol: Column,
      means: Seq[(Int, Array[Double])]): Column = {
    val muMap = map(means.flatMap { case (cell, mu) =>
      Seq(lit(cell), array(mu.map(lit(_)): _*))
    }: _*)
    zip_with(transform(emb, x => x.cast("double")),
      element_at(muMap, cellCol), (a, b) => a - b)
  }

  /** Residual codebooks: the K strided sample vectors' residuals
    * (w.r.t. their OWN cells' means), sliced into M subspaces — the
    * deterministic analog of Faiss's residual training set. */
  def residualCodebooks(resCorpus: DataFrame,
      n: Long): Seq[(Int, Int, Array[Double], Double)] = {
    import org.apache.spark.sql.Row
    if (n == 0) return Seq.empty
    val stride = math.max(1L, n / K)
    val rows = resCorpus
      .filter(col("vid") % stride === 0 && col("vid") < stride * K)
      .select((col("vid") / stride).cast("int").as("code"), col("re"))
      .orderBy("code").collect()
    for {
      r <- rows.toSeq
      m <- 0 until M
    } yield {
      val full = r match {
        case Row(_: Int, re: scala.collection.Seq[_]) =>
          re.map(_.asInstanceOf[Double]).toArray
      }
      val sub = full.slice(m * subDim, (m + 1) * subDim)
      (m, r.getInt(0), sub, arrNormSq(sub))
    }
  }

  /** IVFPQ with RESIDUAL encoding — the Faiss refinement of
    * [[ivfpqTopK]]: same coarse quantizer, same probe, same exact
    * rerank; the PQ stage encodes/scores x − μ(cell) instead of raw
    * x, and each query's ADC tables are built PER PROBED CELL from
    * the query's own residual q − μ(cell) (nprobe × M small tables —
    * still broadcast-sized). (q − μ_c) − (x − μ_c) = q − x, so ADC
    * values stay comparable ACROSS cells and one global shortlist per
    * query is sound. Cost shape identical to [[ivfpqTopK]] plus one
    * cells×dim mean collect. */
  def ivfpqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cells: Int = 16, nprobe: Int = 0, shortlist: Int = 0): DataFrame = {
    val np = if (nprobe > 0) nprobe else nprobeFor(cells)
    val cents = Similarity.ivfCentroids(corpus, cells)
    val means = cellMeans(corpus, cents)
    val assigned = Similarity.assignedCorpus(corpus, cents)
    val resCorpus = assigned
      .withColumn("re", residualCol(col("ce"), col("cell"), means))
      .select("vid", "cell", "re")
    val cb = residualCodebooks(resCorpus, corpus.count())
    // encode: argmin over residual-codebook literals — the same fused
    // kernel as the raw encode, pure map
    val codes = withCodeCols(resCorpus, "re", cb).drop("re")
    // per-(query, probed-cell) residual ADC tables — same fused kernel
    val probe = Similarity.probeCells(cents, queries, np)
      .select(col("qid"), col("cell"), col("qe"))
      .withColumn("qr", residualCol(col("qe"), col("cell"), means))
    val qTables = withQdCols(probe, "qr", cb).drop("qe", "qr")
    val pairs = codes.join(broadcast(qTables), "cell")
      .filter(col("qid") =!= col("vid"))
    rerank(adcShortlist(pairs, depth(corpus, shortlist)), corpus, queries, k)
  }

  /** DuckDB twin of [[ivfpqResidualTopK]]: the shared IVF quantizer +
    * assign/probe prefix, then per-cell means (decimal sums / exact
    * counts, one IEEE division per dim), residual lists (one IEEE
    * subtraction per component), residual codebooks from the strided
    * sample, per-(query, cell) residual ADC tables, candidate-scoped
    * ADC fold, shortlist, exact rerank — every stage restated with the
    * identical arithmetic trees. */
  def ivfpqResidualSql(k: Int, cells: Int = 16, nprobe: Int = 0,
      src: String = "embeddings",
      queryPred: String = "vec_id % 100 = 0"): String = {
    val dim = Similarity.dim
    val np = if (nprobe > 0) nprobe else nprobeFor(cells)
    val codeBranches = (0 until M).map { m =>
      s"""  SELECT r.vid, r.cell, $m AS m, s.code,
         |    ROW_NUMBER() OVER (PARTITION BY r.vid ORDER BY
         |      ${d2Sql("r.re", "s.re", m * subDim)} ASC, s.code ASC) AS rn
         |  FROM res r CROSS JOIN scb s""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val qdBranches = (0 until M).map { m =>
      s"""  SELECT qr.qid, qr.cell, $m AS m, s.code,
         |    CAST(${d2Sql("qr.qr", "s.re", m * subDim)} AS DECIMAL(23,14)) AS dd
         |  FROM qres qr CROSS JOIN scb s""".stripMargin
    }.mkString("\n  UNION ALL\n")
    Similarity.ivfQuantizerCte(cells, src) +
      Similarity.ivfAssignProbeCte(np, src, queryPred) + s""",
       |msums AS (
       |  SELECT a.cell, t.j,
       |    CAST(SUM(CAST(CAST(e.embedding[t.j] AS DOUBLE) AS DECIMAL(23,14))) AS DOUBLE) AS s,
       |    COUNT(*) AS cnt
       |  FROM assign a JOIN $src e ON e.vec_id = a.vid,
       |       generate_series(1, $dim) AS t(j)
       |  GROUP BY a.cell, t.j),
       |mu AS (SELECT cell, list(s / cnt ORDER BY j) AS mu FROM msums GROUP BY cell),
       |res AS (
       |  SELECT a.vid, a.cell,
       |    list_transform(generate_series(1, $dim),
       |      j -> CAST(e.embedding[j] AS DOUBLE) - m.mu[j]) AS re
       |  FROM assign a JOIN $src e ON e.vec_id = a.vid
       |  JOIN mu m ON m.cell = a.cell),
       |pst AS (SELECT CAST(GREATEST(COUNT(*) // $K, 1) AS BIGINT) AS stride FROM $src),
       |scb AS (SELECT CAST(vid // (SELECT stride FROM pst) AS INTEGER) AS code, re
       |        FROM res
       |        WHERE vid % (SELECT stride FROM pst) = 0
       |          AND vid < (SELECT stride FROM pst) * $K),
       |codes0 AS (
       |$codeBranches),
       |codes AS (SELECT vid, cell, m, code FROM codes0 WHERE rn = 1),
       |qres AS (
       |  SELECT p.qid, p.cell,
       |    list_transform(generate_series(1, $dim),
       |      j -> CAST(q.embedding[j] AS DOUBLE) - m.mu[j]) AS qr
       |  FROM probe p JOIN q ON q.vec_id = p.qid
       |  JOIN mu m ON m.cell = p.cell),
       |qd AS (
       |$qdBranches),
       |cand AS (
       |  SELECT p.qid, a.vid, a.cell FROM probe p JOIN assign a ON a.cell = p.cell
       |  WHERE a.vid <> p.qid),
       |adc AS (
       |  SELECT cd.qid, cd.vid, SUM(qd.dd) AS adc
       |  FROM cand cd JOIN codes c ON c.vid = cd.vid
       |  JOIN qd ON qd.qid = cd.qid AND qd.cell = cd.cell
       |         AND qd.m = c.m AND qd.code = c.code
       |  GROUP BY 1, 2),
       |short AS (SELECT qid, vid FROM (
       |    SELECT qid, vid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc ASC, vid ASC) AS srk
       |    FROM adc) WHERE srk <= GREATEST(100, (SELECT COUNT(*) FROM $src) // 50)),
       |rr AS (
       |  SELECT s.qid, s.vid,
       |    ((nc.nrm + nq.nrm) - (2.0 * ${Similarity.dotSql("eq.embedding", "ec.embedding")})) AS l2
       |  FROM short s
       |  JOIN $src eq ON eq.vec_id = s.qid
       |  JOIN $src ec ON ec.vec_id = s.vid
       |  JOIN norms nq ON nq.vec_id = s.qid
       |  JOIN norms nc ON nc.vec_id = s.vid)
       |SELECT qid, vid, CAST(rk AS INTEGER) AS rk, ROUND(l2, 6) AS l2_d2 FROM (
       |  SELECT qid, vid, l2,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2 ASC, vid ASC) AS rk
       |  FROM rr) WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin
  }

  /** Query rows extended with per-subspace 16-entry ADC tables —
    * each entry cast to DECIMAL(23,14) at the boundary so the ADC sum
    * is exact and association-free. One fused kernel call
    * ([[graft.functions.PqAdcTables]] — same 64 KB-codegen rationale
    * as the encode kernel). */
  private def withQdTables(queries: DataFrame,
      cb: Seq[(Int, Int, Array[Double], Double)]): DataFrame =
    withQdCols(queries.select(col("vec_id").as("qid"),
      col("embedding").as("qe")), "qe", cb).drop("qe")

  /** Attach qd0..qd15 via the fused ADC-table kernel to any relation
    * carrying a query embedding/residual array column. */
  private def withQdCols(df: DataFrame, embCol: String,
      cb: Seq[(Int, Int, Array[Double], Double)]): DataFrame = {
    val withT = df.withColumn("_qd",
      graft.functions.PqAdcTables(col(embCol), cb, M, subDim))
    (0 until M).foldLeft(withT) { (d, m) =>
      d.withColumn(s"qd$m", element_at(col("_qd"), m + 1))
    }.drop("_qd")
  }

  /** Decimal ADC fold over (codes ⋈ qd-tables) pair rows → per-query
    * `depth`-deep shortlist (adc asc, vid tie-break). */
  private def adcShortlist(pairs: DataFrame, depth: Int): DataFrame = {
    val adc = (0 until M)
      .map(m => element_at(col(s"qd$m"), col(s"c$m") + 1))
      .reduce(_ + _)
    val w = Window.partitionBy("qid").orderBy(col("adc").asc, col("vid"))
    pairs.withColumn("adc", adc)
      .withColumn("srk", row_number().over(w)).filter(col("srk") <= depth)
      .select("qid", "vid")
  }

  /** Exact full-dim L2 rerank of a (qid, vid) shortlist. */
  private def rerank(short: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("vid"), col("embedding").as("ce"))
      .withColumn("cnorm", Similarity.normSqDecimal(col("ce")))
    val qv = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .withColumn("qnorm", Similarity.normSqDecimal(col("qe")))
    val exact = ((col("cnorm") + col("qnorm"))
      - (lit(2.0) * Similarity.dotDecimal(col("qe"), col("ce"))))
    val wR = Window.partitionBy("qid").orderBy(col("l2").asc, col("vid"))
    short.join(c, "vid").join(broadcast(qv), "qid")
      .withColumn("l2", exact)
      .withColumn("rk", row_number().over(wR)).filter(col("rk") <= k)
      .select(col("qid"), col("vid"), col("rk"), round(col("l2"), 6).as("l2_d2"))
  }

  // ---------------------------------------------------------------
  // DuckDB oracle — restates codebooks, encode, ADC, rerank bit-exactly.

  private def subNormSql(e: String, off: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $subDim), " +
      s"i -> CAST(CAST($e[$off + i] AS DOUBLE) * CAST($e[$off + i] AS DOUBLE) " +
      s"AS DECIMAL(23,14)))) AS DOUBLE)"

  private def subDotSql2(e: String, eoff: Int, c: String, coff: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $subDim), " +
      s"i -> CAST(CAST($e[$eoff + i] AS DOUBLE) * CAST($c[$coff + i] AS DOUBLE) " +
      s"AS DECIMAL(23,14)))) AS DOUBLE)"

  private def subDotSql(e: String, c: String, off: Int): String =
    subDotSql2(e, off, c, off)

  /** d² with independent offsets: `e` sliced at `eoff`, `c` at `coff`
    * (trained codebooks store bare subvectors — coff 0). */
  private def d2Sql2(e: String, eoff: Int, c: String, coff: Int): String =
    s"((${subNormSql(e, eoff)} - (2.0 * ${subDotSql2(e, eoff, c, coff)})) + " +
      s"${subNormSql(c, coff)})"

  private def d2Sql(e: String, c: String, off: Int): String =
    d2Sql2(e, off, c, off)

  /** DuckDB twin of the whole encode+ADC+rerank pipeline over `src` —
    * including the corpus-derived shortlist depth (a scalar subquery
    * restating `max(100, n/50)`). */
  def pqSql(k: Int, src: String = "embeddings",
      queryPred: String = "vec_id % 100 = 0"): String = {
    val codeBranches = (0 until M).map { m =>
      s"""  SELECT e.vec_id AS vid, $m AS m, s.code,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${d2Sql("e.embedding", "s.se", m * subDim)} ASC, s.code ASC) AS rn
         |  FROM $src e CROSS JOIN cb s""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val qdBranches = (0 until M).map { m =>
      s"""  SELECT q.vec_id AS qid, $m AS m, s.code,
         |    CAST(${d2Sql("q.embedding", "s.se", m * subDim)} AS DECIMAL(23,14)) AS dd
         |  FROM q CROSS JOIN cb s""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH st AS (SELECT CAST(GREATEST(COUNT(*) // $K, 1) AS BIGINT) AS stride FROM $src),
       |cb AS (SELECT CAST(vec_id // (SELECT stride FROM st) AS INTEGER) AS code,
       |              embedding AS se
       |       FROM $src
       |       WHERE vec_id % (SELECT stride FROM st) = 0
       |         AND vec_id < (SELECT stride FROM st) * $K),
       |codes0 AS (
       |$codeBranches),
       |codes AS (SELECT vid, m, code FROM codes0 WHERE rn = 1),
       |q AS (SELECT vec_id, embedding FROM $src WHERE $queryPred),
       |qd AS (
       |$qdBranches),
       |adc AS (
       |  SELECT qd.qid, c.vid, SUM(qd.dd) AS adc
       |  FROM codes c JOIN qd ON qd.m = c.m AND qd.code = c.code
       |  WHERE c.vid <> qd.qid
       |  GROUP BY 1, 2),
       |short AS (SELECT qid, vid FROM (
       |    SELECT qid, vid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc ASC, vid ASC) AS srk
       |    FROM adc) WHERE srk <= GREATEST(100, (SELECT COUNT(*) FROM $src) // 50)),
       |nrm AS (SELECT vec_id, ${Similarity.dotSql("embedding", "embedding")} AS nrm
       |        FROM $src),
       |rr AS (
       |  SELECT s.qid, s.vid,
       |    ((nc.nrm + nq.nrm) - (2.0 * ${Similarity.dotSql("eq.embedding", "ec.embedding")})) AS l2
       |  FROM short s
       |  JOIN $src eq ON eq.vec_id = s.qid
       |  JOIN $src ec ON ec.vec_id = s.vid
       |  JOIN nrm nq ON nq.vec_id = s.qid
       |  JOIN nrm nc ON nc.vec_id = s.vid)
       |SELECT qid, vid, CAST(rk AS INTEGER) AS rk, ROUND(l2, 6) AS l2_d2 FROM (
       |  SELECT qid, vid, l2,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2 ASC, vid ASC) AS rk
       |  FROM rr) WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin
  }

  /** DuckDB twin of [[pqTopKKmeans]] — the [[pqSql]] pipeline with the
    * codebook TRAINING LOOP unrolled as CTEs ([[Similarity
    * .ivfQuantizerCteIter]]'s discipline): per round, encode under the
    * previous books (16 argmin branches), per-(m, code, j) exact
    * decimal sums with member counts, per-dim double-division means,
    * re-assembled as subvector lists. The final round's books feed the
    * same encode/ADC/shortlist/rerank tail as [[pqSql]]. */
  def pqKmeansSql(k: Int, iters: Int = 1, src: String = "embeddings",
      queryPred: String = "vec_id % 100 = 0"): String = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // encode branches under books `tbl`: full-vector seed books slice
    // at m*subDim (round 1); trained books are bare subvectors at 0
    def encBranches(out: String, tbl: String, trained: Boolean): String =
      (0 until M).map { m =>
        val join =
          if (trained) s"JOIN $tbl s ON s.m = $m" else s"CROSS JOIN $tbl s"
        s"""  SELECT e.vec_id AS vid, $m AS m, s.code,
           |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
           |      ${d2Sql2("e.embedding", m * subDim, "s.se",
                if (trained) 0 else m * subDim)} ASC, s.code ASC) AS rn
           |  FROM $src e $join""".stripMargin
      }.mkString("\n  UNION ALL\n")
    val rounds = (1 to iters).map { r =>
      val (prev, trained) = if (r == 1) ("cb", false) else (s"cbt_${r - 1}", true)
      s""",
         |codes_${r}0 AS (
         |${encBranches(s"codes_${r}0", prev, trained)}),
         |codes_$r AS (SELECT vid, m, code FROM codes_${r}0 WHERE rn = 1),
         |csum_$r AS (
         |  SELECT c.m, c.code, t.j,
         |    CAST(SUM(CAST(CAST(e.embedding[c.m * $subDim + t.j] AS DOUBLE)
         |      AS DECIMAL(23,14))) AS DOUBLE) / COUNT(*) AS mu
         |  FROM codes_$r c JOIN $src e ON e.vec_id = c.vid,
         |       generate_series(1, $subDim) AS t(j)
         |  GROUP BY c.m, c.code, t.j),
         |cbt_$r AS MATERIALIZED (SELECT m, code, list(mu ORDER BY j) AS se
         |           FROM csum_$r GROUP BY m, code)""".stripMargin
      // MATERIALIZED is load-bearing, not a hint: every round's encode
      // fans out 16 UNION branches referencing the previous round's
      // books, and DuckDB's default CTE inlining would duplicate the
      // whole prior-round subtree at each site — 16^iters scans of the
      // base table (measured: fd exhaustion at iters=2). Materializing
      // the K×M-row codebook at each round boundary caps the plan at
      // one prior-round evaluation; the relation is literal-sized, so
      // the barrier costs nothing. (DuckDB-only text — the Spark side
      // trains via codebooksIter, never parses this.)
    }.mkString
    val fin = s"cbt_$iters"
    val codeBranches = (0 until M).map { m =>
      s"""  SELECT e.vec_id AS vid, $m AS m, s.code,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${d2Sql2("e.embedding", m * subDim, "s.se", 0)} ASC, s.code ASC) AS rn
         |  FROM $src e JOIN $fin s ON s.m = $m""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val qdBranches = (0 until M).map { m =>
      s"""  SELECT q.vec_id AS qid, $m AS m, s.code,
         |    CAST(${d2Sql2("q.embedding", m * subDim, "s.se", 0)} AS DECIMAL(23,14)) AS dd
         |  FROM q JOIN $fin s ON s.m = $m""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH st AS (SELECT CAST(GREATEST(COUNT(*) // $K, 1) AS BIGINT) AS stride FROM $src),
       |cb AS MATERIALIZED (SELECT CAST(vec_id // (SELECT stride FROM st) AS INTEGER) AS code,
       |              embedding AS se
       |       FROM $src
       |       WHERE vec_id % (SELECT stride FROM st) = 0
       |         AND vec_id < (SELECT stride FROM st) * $K)$rounds,
       |codes0 AS (
       |$codeBranches),
       |codes AS (SELECT vid, m, code FROM codes0 WHERE rn = 1),
       |q AS (SELECT vec_id, embedding FROM $src WHERE $queryPred),
       |qd AS (
       |$qdBranches),
       |adc AS (
       |  SELECT qd.qid, c.vid, SUM(qd.dd) AS adc
       |  FROM codes c JOIN qd ON qd.m = c.m AND qd.code = c.code
       |  WHERE c.vid <> qd.qid
       |  GROUP BY 1, 2),
       |short AS (SELECT qid, vid FROM (
       |    SELECT qid, vid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc ASC, vid ASC) AS srk
       |    FROM adc) WHERE srk <= GREATEST(100, (SELECT COUNT(*) FROM $src) // 50)),
       |nrm AS (SELECT vec_id, ${Similarity.dotSql("embedding", "embedding")} AS nrm
       |        FROM $src),
       |rr AS (
       |  SELECT s.qid, s.vid,
       |    ((nc.nrm + nq.nrm) - (2.0 * ${Similarity.dotSql("eq.embedding", "ec.embedding")})) AS l2
       |  FROM short s
       |  JOIN $src eq ON eq.vec_id = s.qid
       |  JOIN $src ec ON ec.vec_id = s.vid
       |  JOIN nrm nq ON nq.vec_id = s.qid
       |  JOIN nrm nc ON nc.vec_id = s.vid)
       |SELECT qid, vid, CAST(rk AS INTEGER) AS rk, ROUND(l2, 6) AS l2_d2 FROM (
       |  SELECT qid, vid, l2,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2 ASC, vid ASC) AS rk
       |  FROM rr) WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin
  }

  /** DuckDB twin of [[ivfpqTopK]]: the SHARED IVF quantizer +
    * assign/probe CTEs ([[Similarity.ivfQuantizerCte]] /
    * [[Similarity.ivfAssignProbeCte]] — bit-identical to q42d/e's
    * oracle prefix), then the PQ codebook/encode/ADC CTEs restricted
    * to probed candidates, shortlist, exact rerank. The PQ stride CTE
    * is named `pst` (the quantizer prefix already owns `st`).
    * `nprobe ≤ 0` derives via [[nprobeFor]], matching [[ivfpqTopK]]. */
  def ivfpqSql(k: Int, cells: Int = 16, nprobe: Int = 0,
      src: String = "embeddings",
      queryPred: String = "vec_id % 100 = 0"): String = {
    val codeBranches = (0 until M).map { m =>
      s"""  SELECT e.vec_id AS vid, $m AS m, s.code,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      ${d2Sql("e.embedding", "s.se", m * subDim)} ASC, s.code ASC) AS rn
         |  FROM $src e CROSS JOIN cb s""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val qdBranches = (0 until M).map { m =>
      s"""  SELECT q.vec_id AS qid, $m AS m, s.code,
         |    CAST(${d2Sql("q.embedding", "s.se", m * subDim)} AS DECIMAL(23,14)) AS dd
         |  FROM q CROSS JOIN cb s""".stripMargin
    }.mkString("\n  UNION ALL\n")
    Similarity.ivfQuantizerCte(cells, src) +
      Similarity.ivfAssignProbeCte(
        if (nprobe > 0) nprobe else nprobeFor(cells), src, queryPred) + s""",
       |pst AS (SELECT CAST(GREATEST(COUNT(*) // $K, 1) AS BIGINT) AS stride FROM $src),
       |cb AS (SELECT CAST(vec_id // (SELECT stride FROM pst) AS INTEGER) AS code,
       |              embedding AS se
       |       FROM $src
       |       WHERE vec_id % (SELECT stride FROM pst) = 0
       |         AND vec_id < (SELECT stride FROM pst) * $K),
       |codes0 AS (
       |$codeBranches),
       |codes AS (SELECT vid, m, code FROM codes0 WHERE rn = 1),
       |qd AS (
       |$qdBranches),
       |cand AS (
       |  SELECT p.qid, a.vid FROM probe p JOIN assign a ON a.cell = p.cell
       |  WHERE a.vid <> p.qid),
       |adc AS (
       |  SELECT cd.qid, cd.vid, SUM(qd.dd) AS adc
       |  FROM cand cd JOIN codes c ON c.vid = cd.vid
       |  JOIN qd ON qd.qid = cd.qid AND qd.m = c.m AND qd.code = c.code
       |  GROUP BY 1, 2),
       |short AS (SELECT qid, vid FROM (
       |    SELECT qid, vid,
       |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc ASC, vid ASC) AS srk
       |    FROM adc) WHERE srk <= GREATEST(100, (SELECT COUNT(*) FROM $src) // 50)),
       |rr AS (
       |  SELECT s.qid, s.vid,
       |    ((nc.nrm + nq.nrm) - (2.0 * ${Similarity.dotSql("eq.embedding", "ec.embedding")})) AS l2
       |  FROM short s
       |  JOIN $src eq ON eq.vec_id = s.qid
       |  JOIN $src ec ON ec.vec_id = s.vid
       |  JOIN norms nq ON nq.vec_id = s.qid
       |  JOIN norms nc ON nc.vec_id = s.vid)
       |SELECT qid, vid, CAST(rk AS INTEGER) AS rk, ROUND(l2, 6) AS l2_d2 FROM (
       |  SELECT qid, vid, l2,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY l2 ASC, vid ASC) AS rk
       |  FROM rr) WHERE rk <= $k
       |ORDER BY qid, rk""".stripMargin
  }
}
