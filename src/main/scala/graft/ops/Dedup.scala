package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md Q41
  * + the north-star ops): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  * (Beyond the reference, whose only dedup is the full-refresh
  * TRUNCATE+COPY contract, resources/redshift.py:124.)
  *
  * Scale notes (100 TB): every variant is a constant number of
  * shuffles keyed on content-derived values — no driver collects, no
  * quadratic candidate sets. MinHash/LSH shuffles signatures (H longs
  * per doc, not the text); banding bounds bucket sizes; rare-shingle
  * blocking bounds the Jaccard join fan-out.
  */
object Dedup {

  /** Surviving-row ids of an exact dedup: hash locally, aggregate
    * (hash → min id). The ONLY shuffle moves (hash, id) pairs — with
    * map-side partial min — so at 100 TB the text never leaves its
    * partition to decide the dedup. */
  def exactKeeperIds(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(sha2(col(textCol), 256).as("_h"), col(idCol))
      .groupBy("_h").agg(min(col(idCol)).as(idCol))
      .select(idCol)

  /** Exact dedup: keep the smallest-id row per content hash. The
    * dedup DECISION is [[exactKeeperIds]] ((hash, id)-only shuffle);
    * retrieving surviving rows is a left-semi join on id, which costs
    * one row shuffle UNLESS the corpus is already partitioned/bucketed
    * by id (then it is shuffle-free) — strictly no worse than the
    * window-over-hash formulation, which always shuffles full rows. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(exactKeeperIds(df, idCol, textCol), Seq(idCol), "left_semi")

  /** Incremental (cross-ingest) exact dedup — the continuous-crawl
    * shape: a NEW batch is deduped (a) within itself (min-id per
    * content hash) and (b) against the EXISTING corpus's hash set,
    * without ever re-reading the existing TEXT. At 100 TB the
    * existing side is the persisted fingerprint table a production
    * pipeline maintains (hash column only — the projection reaches
    * the parquet scan); here it is derived on the fly. Shuffles:
    * (hash, id) pairs for the batch agg, hash-only for the anti join
    * (or a broadcast when the batch's hash set is small). */
  def incrementalKeepIds(existing: DataFrame, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val seen = existing.select(md5(col(textCol)).as("_h")).distinct()
    batch.select(md5(col(textCol)).as("_h"), col(idCol))
      .groupBy("_h").agg(min(col(idCol)).as(idCol))
      .join(seen, Seq("_h"), "left_anti")
      .select(idCol)
  }

  /** Surviving rows of [[incrementalKeepIds]] — semi join on id, same
    * cost argument as [[exact]]. */
  def incremental(existing: DataFrame, batch: DataFrame,
      idCol: String, textCol: String): DataFrame =
    batch.join(incrementalKeepIds(existing, batch, idCol, textCol),
      Seq(idCol), "left_semi")

  /** Bloom-prefiltered [[incrementalKeepIds]] — identical output, the
    * 100 TB access pattern: ONE aggregation pass folds the existing
    * corpus's fingerprints into a Bloom filter (a KB–MB binary,
    * collected like a broadcast build side), every batch row is tagged
    * `might_contain` MAP-SIDE inside its scan stage (graft_bloom_agg /
    * graft_might_contain are Spark's runtime-filter expressions,
    * SQL-exposed by GraftExtensions), and only the maybe-seen slice —
    * true hits plus the bloom's false positives — reaches the exact
    * anti-join against the fingerprint set. Definite negatives (the
    * bulk of a typical crawl batch) never join anything. The bloom can
    * only ERR TOWARD the exact path, so the result is bit-identical to
    * the unfiltered operator (DedupSpec pins equality; q41i shares
    * q41h's oracle). */
  def incrementalKeepIdsBloom(existing: DataFrame, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // SIZE the bloom from the corpus row count (round-22). The 1-arg
    // aggregate defaults to 1M expected items ≈ a 1.1 MB filter —
    // which then rides the plan as a BINARY LITERAL through every
    // analyzer/optimizer/codegen pass of the downstream query
    // (measured: q41i spent ~2 s of a 2.6 s wall in DRIVER plan
    // processing, jobs only 0.5 s). Sizing to the measured count keeps
    // the literal KB-scale here AND stops the fixed default
    // UNDERSIZING the filter at corpus scale (an under-provisioned
    // bloom degrades toward fpp→1, sending every batch row down the
    // exact anti-join — the opposite of the operator's point). One
    // extra count job over the fingerprint projection, metadata-cheap.
    val nExisting = math.max(existing.count(), 1L)
    val bloom = existing
      .select(call_function("graft_bloom_agg",
        xxhash64(md5(col(textCol))), lit(nExisting)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // bloom_filter_agg over ZERO rows aggregates to NULL, and
    // might_contain(NULL, h) is NULL — both the !_maybe and _maybe
    // filters below would then drop EVERY row, silently discarding the
    // batch instead of within-batch deduping it. An empty corpus has
    // nothing to prefilter against: take the exact path directly.
    if (bloom == null)
      return incrementalKeepIds(existing, batch, idCol, textCol)
    val tagged = batch.select(md5(col(textCol)).as("_h"), col(idCol))
      .withColumn("_maybe",
        call_function("graft_might_contain", lit(bloom), xxhash64(col("_h"))))
      .groupBy("_h")
      .agg(min(col(idCol)).as(idCol), first(col("_maybe")).as("_maybe"))
    val clean = tagged.filter(!col("_maybe")).select(idCol)
    val seen = existing.select(md5(col(textCol)).as("_h")).distinct()
    val maybe = tagged.filter(col("_maybe"))
      .join(seen, Seq("_h"), "left_anti").select(idCol)
    clean.unionByName(maybe)
  }

  /** Word-level shingles (distinct), the unit for MinHash / Jaccard:
    * positions 1..n-k+1 (1-based), k consecutive tokens each. */
  /** Cross-corpus NEAR-dup verdicts (the fuzzy twin of
    * [[incrementalKeepIds]]): each batch doc is tested for n-gram
    * Jaccard similarity against the EXISTING corpus — the crawl-
    * pipeline question "is this newly-fetched page a near-copy of
    * anything we already hold?". Same machinery as the in-corpus q41d
    * path, made two-sided: rare-shingle blocking with the document
    * frequency computed over BOTH relations (a shingle common in the
    * corpus is just as useless a blocking key when it arrives in a
    * batch), candidates only ACROSS the sides (batch×batch dup-ness is
    * [[exactKeeperIds]]/q41d's job), pair-bounded common counts.
    *
    * At 100 TB the asymmetry is the point: the corpus side contributes
    * its (hashed) shingle relation — which a production deployment
    * persists once, like q41h's fingerprint table — and the per-batch
    * cost is bounded by batch shingles × maxDf, never by corpus size.
    *
    * Returns one verdict row PER BATCH DOC: (batch_id, matched,
    * n_matches, best_jaccard). */
  /** Fallback generator width for all-hot batch docs (no rare shingle
    * at all — boilerplate text, invisible to rare-shingle blocking by
    * construction; the cross-corpus analog of q41g's generator 2).
    * The q41k oracle SQL interpolates THIS constant. */
  val NearDupFallbackShingles = 4

  def incrementalNearDup(existing: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int = 2, maxDf: Int = 20,
      threshold: Double = 0.2): DataFrame = {
    val shE = wordShingles(spreadToCores(existing), idCol, textCol, k)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    val dfE = shE.groupBy("sh").agg(count(lit(1)).as("ce"))
    val out = incrementalNearDupWith(shE, dfE, batch, idCol, textCol, k,
      maxDf, threshold)
    // shE is OURS (built and staged above) and the pipeline's own stage
    // barriers have all materialized by the time the call returns, so
    // its blocks are releasable here. Caller-supplied corpus relations
    // are never dropped by the pipeline (a caller that stages a loaded
    // artifact across batches owns those blocks — round-18 advice).
    graft.CheckpointJanitor.dropNow(shE)
    out
  }

  /** [[incrementalNearDup]] against a PREBUILT corpus side: `shE` is
    * the corpus's hashed-shingle relation (doc, sh) and `dfE` its
    * per-shingle document frequency (sh, ce) — the build-once artifact
    * [[ShingleIndex]] persists (round-17 verdict item 4). The promise
    * the op text always made becomes the measured deployment shape:
    * per-batch cost excludes the corpus shingling/hashing pass
    * entirely; document frequencies still combine over BOTH sides
    * (corpus counts from the artifact + batch counts computed here),
    * so blocking decisions are bit-identical to the inline build. */
  def incrementalNearDupWith(shE: DataFrame, dfE: DataFrame,
      batch: DataFrame, idCol: String, textCol: String, k: Int = 2,
      maxDf: Int = 20, threshold: Double = 0.2): DataFrame =
    incrementalNearDupWith(shE, shE, dfE, batch, idCol, textCol, k,
      maxDf, threshold)

  /** [[incrementalNearDupWith]] with the corpus relation supplied
    * PER ACCESS KEY: `shESh` serves the sh-keyed joins (the
    * rare-shingle probe and the fallback's key probe), `shEDoc` the
    * doc-keyed candidate fetch (pull every shingle of the corpus docs
    * that blocked against the batch). Both must hold the same
    * (doc, sh) rows — the two-copy [[ShingleIndex]] bucketed layout
    * exists so each join finds its corpus side pre-partitioned on its
    * own key and only batch-sized relations shuffle per batch. */
  def incrementalNearDupWith(shESh: DataFrame, shEDoc: DataFrame,
      dfE: DataFrame,
      batch: DataFrame, idCol: String, textCol: String, k: Int,
      maxDf: Int, threshold: Double): DataFrame =
    incrementalNearDupSegmented(Seq((shESh, shEDoc)), dfE, batch,
      idCol, textCol, k, maxDf, threshold)

  /** [[incrementalNearDupWith]] over a SEGMENTED corpus artifact — the
    * LSM layout [[ShingleIndex.appendLsm]] maintains: the corpus's
    * (doc, sh) relation arrives as immutable segments (each a
    * (sh-keyed, doc-keyed) bucketed pair; doc ids are disjoint across
    * segments by the append guard), plus ONE merged df rollup for the
    * whole artifact. A segment UNION would erase the bucketed output
    * partitioning (Union's partitioning is unknown to Catalyst), so
    * every corpus-sized probe would re-shuffle the whole corpus per
    * batch — the exact cost the bucketed layout exists to remove.
    * Instead each corpus-touching join runs PER SEGMENT against that
    * segment's pre-bucketed copy and only the batch-sized results
    * union: the rare-shingle probe and the fallback probe through the
    * sh-keyed copies, the candidate fetch through the doc-keyed
    * copies. Per-batch shuffle volume stays batch-sized regardless of
    * segment count or corpus size; verdicts are bit-identical to the
    * single-relation pipeline because doc-disjoint segments make every
    * per-segment union reproduce the joins against the full relation
    * row-for-row (LsmShingleSpec pins equality). */
  def incrementalNearDupSegmented(segments: Seq[(DataFrame, DataFrame)],
      dfE: DataFrame,
      batch: DataFrame, idCol: String, textCol: String, k: Int,
      maxDf: Int, threshold: Double): DataFrame = {
    require(segments.nonEmpty, "need at least one corpus segment")
    // batch-sized relations consumed once per segment materialize ONCE
    // when there are multiple segments (plans built on them otherwise
    // recompute the producer per segment); with a single segment the
    // extra barrier is pure overhead — skip it and keep the q41k/l/m
    // plans unchanged
    def stagePerSegment(df: DataFrame): DataFrame =
      if (segments.sizeIs > 1) graft.Staging.stage(df) else df
    // the batch side keeps the shingle STRING alongside the hash: the
    // fallback generator ranks by (df, shingle) and the string tiebreak
    // is the one ordering both engines share (hash ordering is
    // Spark-only — ranking by it would silently desync the oracle)
    val shB = wordShingles(spreadToCores(batch), idCol, textCol, k)
      .select(col("doc"), col("shingle"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    // combined df = corpus-side counts ⊕ batch-side counts, computed
    // ONLY for shingles the batch contains: every downstream consumer
    // probes through shB (cand1 joins it, the fallback ranks a batch
    // doc's own shingles), so corpus-only shingles can never influence
    // a verdict — a LEFT join gives bit-identical output while keeping
    // dfreq (and hence rareSh) batch-vocabulary-sized. The old
    // full-outer form dragged the ENTIRE corpus vocabulary into rareSh
    // (maxDf keeps most shingles), making the shE⋈rareSh probe below
    // O(corpus) per batch — the opposite of the artifact's point.
    val dfreq = shB.groupBy("sh").agg(count(lit(1)).as("cb"))
      .join(dfE, Seq("sh"), "left_outer")
      .select(col("sh"),
        (col("cb") + coalesce(col("ce"), lit(0L))).as("c"))
      .transform(graft.Staging.stage)
    val rareSh = dfreq.filter(col("c") <= maxDf).select("sh")
    val shBr = shB.join(rareSh, "sh").select(col("doc").as("da"), col("sh"))
      .transform(stagePerSegment)
    // NOTE (round-21): the corpus side used to be pre-filtered with an
    // extra `segSh ⋈ rareSh` before meeting shBr — redundant, because
    // shBr's sh values are BY CONSTRUCTION a subset of rareSh (shBr =
    // shB ⋈ rareSh) and rareSh is unique per sh, so the inner join on
    // sh already restricts segSh to exactly those rows with identical
    // multiplicity. Dropping it removes one join + one rareSh shuffle
    // per segment per probe (guide §2.4: remove shuffles outright);
    // verdicts are row-identical (oracle unchanged, LsmShingleSpec).
    val cand1 = segments.map { case (segSh, _) =>
        shBr.join(segSh.select(col("doc").as("db"), col("sh")), "sh")
          .select("da", "db")
      }.reduce(_ unionByName _)
      .transform(graft.Staging.stage) // consumed twice: the union below + generator 2's unpaired set
    // Generator 2 — batch docs generator 1 left UNPAIRED: either
    // all-hot (every shingle above maxDf — boilerplate, invisible to
    // rare blocking by construction), or their only rare shingles are
    // NOVEL (absent from the corpus — e.g. a prefix edit mints a new
    // rare bigram while every shared bigram is hot, so the rare key
    // probes nothing). For exactly those docs, rank the doc's OWN
    // shingles by global frequency (least-hot first, string tiebreak)
    // and block on the top NearDupFallbackShingles. A near-copy shares
    // ~all shingles, so it shares these; fan-out per key is that
    // shingle's df — just above maxDf for the least-hot — so the
    // volume is O(|unpaired docs| × m × df), linear where a naive
    // unpaired×corpus join would be quadratic.
    val hotDocs = shB.select("doc").distinct()
      .join(cand1.select(col("da").as("doc")), Seq("doc"), "left_anti")
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("c"), col("shingle"))
    val fbKeys = shB.join(hotDocs, Seq("doc"), "left_semi")
      .join(dfreq, "sh")
      .withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= NearDupFallbackShingles)
      .select(col("doc").as("da"), col("sh"))
      .transform(stagePerSegment)
    val cand2 = segments.map { case (segSh, _) =>
        fbKeys.join(segSh.select(col("doc").as("db"), col("sh")), "sh")
          .select("da", "db")
      }.reduce(_ unionByName _)
    val cand = cand1.unionByName(cand2).distinct().transform(graft.Staging.stage)
    val shBc = shB.join(cand.select(col("da").as("doc")), Seq("doc"), "left_semi")
      .transform(graft.Staging.stage)
    // candidate fetch is DOC-keyed — the one corpus access that can't
    // ride the sh-partitioned copy (see the two-copy artifact layout)
    val shEc = segments.map { case (_, segDoc) =>
        segDoc.join(cand.select(col("db").as("doc")), Seq("doc"), "left_semi")
      }.reduce(_ unionByName _)
      .transform(graft.Staging.stage)
    val sizesB = shBc.groupBy("doc").agg(count(lit(1)).as("n"))
    val sizesE = shEc.groupBy("doc").agg(count(lit(1)).as("n"))
    val common = cand
      .join(shBc.as("s1"), col("s1.doc") === col("da"))
      .join(shEc.as("s2"), col("s2.doc") === col("db") && col("s2.sh") === col("s1.sh"))
      .groupBy("da", "db").agg(count(lit(1)).as("cm"))
    val pairs = common
      .join(sizesB.as("na"), col("na.doc") === col("da"))
      .join(sizesE.as("nb"), col("nb.doc") === col("db"))
      .withColumn("j",
        col("cm").cast("double") / (col("na.n") + col("nb.n") - col("cm")))
      .filter(col("j") >= threshold)
    val verdicts = pairs.groupBy("da")
      .agg(count(lit(1)).as("nm"), round(max(col("j")), 6).as("bj"))
    batch.select(col(idCol).as("batch_id"))
      .join(verdicts.withColumnRenamed("da", "batch_id"), Seq("batch_id"), "left_outer")
      .select(col("batch_id"),
        when(col("nm").isNotNull, 1L).otherwise(0L).as("matched"),
        coalesce(col("nm"), lit(0L)).as("n_matches"),
        coalesce(col("bj"), lit(0.0)).as("best_jaccard"))
  }

  def wordShingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    // fused kernel (round 16): bit-compatible with the old composed
    // array_distinct(transform(sequence, i -> concat_ws(slice))) form,
    // which sat on ArrayTransform — a CodegenFallback that dropped
    // every shingling consumer (q41d/g/k, q52/q52b) out of
    // whole-stage codegen (graft.functions.WordShingles)
    df.select(col(idCol).as("doc"),
        explode(graft.functions.WordShingles(
          split(lower(col(textCol)), "\\s+"), k)).as("shingle"))
      .filter(col("shingle") =!= "")

  /** MinHash signatures: H independent permutations approximated by
    * xxhash64 with distinct salts; signature = per-doc min of each.
    * Computed as ONE aggregation (H partial mins combine map-side). */
  def minHashSignatures(shingles: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"h$i"))
    shingles.groupBy("doc").agg(mins.head, mins.tail: _*)
      .select(col("doc"), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Map-only MinHash signatures: tokenization, shingling, and ALL
    * hash lanes fused in one expression pass (`MinHashSigs`) — no
    * explode, no aggregation shuffle, one string hash per shingle
    * (the composed form rehashes the shingle per lane). Bit-identical
    * output to `minHashSignatures(wordShingles(…))` (DedupSpec);
    * at 100 TB the signature stage is a pure map over the corpus. */
  def minHashSignaturesFast(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame =
    spreadToCores(df).select(col(idCol).as("doc"),
        graft.functions.MinHashSigs(
          split(lower(col(textCol)), "\\s+"), k, numHashes).as("sig"))
      .filter(col("sig").isNotNull)

  /** Map-only SimHash (fused twin of [[simHash]], same packing). */
  def simHashFast(df: DataFrame, idCol: String, textCol: String): DataFrame =
    spreadToCores(df).select(col(idCol).as("doc"),
        graft.functions.SimHash64(
          split(lower(col(textCol)), "\\s+")).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** The signature maps are CPU-dense, not byte-dense: a compact
    * corpus arrives as one input split (sf0.1 documents.parquet is
    * <1 MB), which would run the tokenize+hash pass serially on one
    * core — widen first (never shrinks an already-wide scan). Same
    * rationale as ngramJaccardStages.
    *
    * The width is SCALE-ADAPTIVE (round-21, guide §2: derive
    * partitioning from input size, don't pin a constant): one task per
    * [[SpreadTargetBytes]] of estimated input, capped at the core
    * count. A flat `cores` pinned EVERY downstream batch-side stage of
    * the dedup pipelines at 32 tasks regardless of data — at sf0.1
    * that is 32 near-empty tasks per stage barrier, each paying task
    * launch, shuffle-file and parquet-reader-init fixed costs that
    * profiling showed dominate the q41 family's wall (the data is KB;
    * the overhead is per-task). At corpus scale the estimate exceeds
    * cores × target and the width stays the full core count —
    * unchanged behavior where it matters. */
  private[ops] val SpreadTargetBytes = 64L * 1024
  private[ops] def spreadToCores(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // Floor at cores/4, not 2 (round-22, verdict/advice adjudication):
    // these stages are CPU-dense — compressed-parquet size estimates
    // understate tokenize+hash cost, so a byte-only width serialized
    // mid-scale corpora onto a couple of cores. cores/4 keeps a small
    // input parallel enough to hide per-row CPU while still avoiding
    // the 32-near-empty-tasks-per-barrier overhead a flat `cores`
    // paid; at corpus scale the byte term saturates to full cores
    // exactly as before.
    val want = (bytes / SpreadTargetBytes)
      .min(BigInt(cores)).max(BigInt(math.max(cores / 4, 2))).toInt
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPer`
    * values; docs sharing any band-hash become candidates; candidates
    * are verified by estimated Jaccard (fraction of equal minhashes).
    * Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b. */
  def minHashNearDups(sigs: DataFrame, bands: Int, rowsPer: Int,
      threshold: Double): DataFrame = {
    // Materialize the signatures ONCE: the shingle→explode→H-way min
    // pipeline behind `sigs` is the expensive stage, and the LSH
    // self-join below would otherwise re-execute it on BOTH sides
    // (2× compute, worse under AQE re-planning). Eager stage barrier
    // (Staging.stage — local blocks by default, reliable checkpoint
    // under spark.graft.reliableCheckpoint; not cache) so the blocks
    // are owned by the RDD and reclaimed when the plan is dropped — a
    // long-lived session never accumulates pinned cache entries. The
    // materialized relation is (doc, sig) — H longs per doc, tiny vs
    // the text.
    val matSigs = sigs.transform(graft.Staging.stage)
    val banded = matSigs.select(col("doc"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPer + 1, lit(rowsPer))), b)))
        .as(Seq("band", "bhash")))
    val a = banded.as("a"); val b = banded.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    cand
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / size(col("sig_a")))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  // ── portable (DuckDB-oracled) MinHash / SimHash family ───────────
  // Round-16 verdict item 3: swap the xxhash64 hash family (no DuckDB
  // twin → q41b/q41c rows-only since round 1) for the engine-portable
  // Horner-fold base + affine lanes in graft.functions.TextHashes —
  // the SAME modular fold the q92 CDC oracle already hash-checks.
  // Identical pipeline shape (map-only fused signature kernel; band /
  // chunk blocking; exact verify); only the hash family changes, and
  // with it every signature, band key and verdict becomes
  // bit-replayable in DuckDB.

  /** Map-only PORTABLE MinHash signatures — the oracle-checkable twin
    * of [[minHashSignaturesFast]] (same shingling/skip semantics, one
    * fused kernel pass, zero row inflation). */
  def minHashSignaturesPortable(df: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int): DataFrame =
    spreadToCores(df).select(col(idCol).as("doc"),
        graft.functions.MinHashSigsPortable(
          split(lower(col(textCol)), "\\s+"), k, numHashes).as("sig"))
      .filter(col("sig").isNotNull)

  /** Map-only PORTABLE SimHash (oracle-checkable twin of
    * [[simHashFast]]). */
  def simHashPortable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    spreadToCores(df).select(col(idCol).as("doc"),
        graft.functions.SimHash64Portable(
          split(lower(col(textCol)), "\\s+")).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** [[minHashNearDups]] with a PORTABLE band key: the band's
    * `rowsPer` signature values rendered as a comma-joined decimal
    * string (both engines render non-negative BIGINTs identically)
    * instead of an xxhash64 band compression. Join cardinality is the
    * same — candidates are pairs agreeing on EVERY value of some
    * band — and the key stays oracle-replayable. */
  def minHashNearDupsPortable(sigs: DataFrame, bands: Int, rowsPer: Int,
      threshold: Double): DataFrame = {
    val matSigs = sigs.transform(graft.Staging.stage) // same 2×-recompute guard as minHashNearDups
    val banded = matSigs.select(col("doc"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", slice(col("sig"), b * rowsPer + 1, lit(rowsPer)))))
        .as(Seq("band", "bkey")))
    val a = banded.as("a"); val b = banded.as("b")
    val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    cand
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / size(col("sig_a")))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  // ── DuckDB oracle emission for the portable family ───────────────

  /** DuckDB twin of [[graft.functions.TextHashes.portableBase]] over a
    * string expression — the q92 fold verbatim (DuckDB splits and
    * ascii()s by CODE POINT; the Scala kernel iterates code points to
    * match, so the twin holds beyond the BMP). */
  def baseHashSql(e: String): String =
    s"list_reduce([CAST(7 AS BIGINT)] || " +
      s"list_transform(list_filter(string_split($e, ''), c -> c <> ''), " +
      s"c -> CAST(ascii(c) AS BIGINT)), (a, x) -> (a * 31 + x) % 1000000007)"

  /** DuckDB twin of the SECOND Horner fold (seed 13, mult 131) of
    * [[graft.functions.TextHashes.foldBases]]. */
  def baseHash2Sql(e: String): String =
    s"list_reduce([CAST(${graft.functions.TextHashes.Seed2} AS BIGINT)] || " +
      s"list_transform(list_filter(string_split($e, ''), c -> c <> ''), " +
      s"c -> CAST(ascii(c) AS BIGINT)), " +
      s"(a, x) -> (a * ${graft.functions.TextHashes.Mult2} + x) % 1000000007)"

  /** DuckDB twin of [[graft.functions.TextHashes.mhLane]]: lane i's
    * hash from the two fold columns — (A_i·b1 + C_i·b2) mod p with the
    * pinned pairwise-independent constants. */
  private def laneSql(b1: String, b2: String, i: Int): String = {
    val th = graft.functions.TextHashes
    s"((${th.mhA(i)} * $b1 + ${th.mhC(i)} * $b2) % 1000000007)"
  }

  /** Full DuckDB restatement of
    * `minHashNearDupsPortable(minHashSignaturesPortable(src))` —
    * shingle → base fold → 32 lane mins → band-string blocking →
    * estimated-Jaccard verify, bit-exact. `src` must yield
    * (doc_id, text). */
  def minHashPortableSql(src: String, k: Int, numHashes: Int,
      bands: Int, rowsPer: Int, threshold: Double): String = {
    require(k == 2, "oracle emission fixed at k=2 shingles")
    val mins = (0 until numHashes)
      .map(i => s"MIN(${laneSql("b1", "b2", i)}) AS m$i").mkString(",\n      ")
    val bandKeys = (0 until bands).map { bd =>
      val key = (0 until rowsPer)
        .map(r => s"CAST(m${bd * rowsPer + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"  SELECT doc, $bd AS band, $key AS bkey FROM sig"
    }.mkString("\n  UNION ALL\n")
    val eqTerms = (0 until numHashes)
      .map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH dup AS (SELECT doc_id, text FROM $src),
       |toks AS (SELECT doc_id AS doc, string_split_regex(lower(text), '\\s+') AS l
       |         FROM dup),
       |sh AS (
       |  SELECT doc, shingle FROM (
       |    SELECT doc, UNNEST(list_transform(generate_series(1, len(l) - 1),
       |      i -> l[i] || ' ' || l[i + 1])) AS shingle
       |    FROM toks)
       |  WHERE shingle <> ''),
       |bh AS (SELECT doc, ${baseHashSql("shingle")} AS b1,
       |              ${baseHash2Sql("shingle")} AS b2 FROM sh),
       |sig AS (SELECT doc,
       |      $mins
       |    FROM bh GROUP BY doc),
       |bandkeys AS (
       |$bandKeys),
       |cand AS (
       |  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
       |  FROM bandkeys a JOIN bandkeys b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc < b.doc),
       |est AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST($eqTerms AS DOUBLE) / $numHashes AS est_jaccard
       |  FROM cand c
       |  JOIN sig sa ON sa.doc = c.doc_a
       |  JOIN sig sb ON sb.doc = c.doc_b)
       |SELECT doc_a, doc_b, est_jaccard FROM est
       |WHERE est_jaccard >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Full DuckDB restatement of
    * `simHashNearDups(simHashPortable(src), maxHamming)` — per-token
    * base fold → 64 lane-parity votes → packed simhash (bit 63 added
    * as the SIGNED int64 min to avoid any 2^63 literal) → 16-bit-chunk
    * blocking (`>>` is arithmetic in both engines, masked to 16 bits)
    * → exact Hamming verify via xor + bit_count (two's-complement
    * popcount in both engines). */
  def simHashPortableSql(src: String, maxHamming: Int): String = {
    val P = 1000000007L
    val th = graft.functions.TextHashes
    val votes = (0 until 64)
      .map(b => s"SUM(CASE WHEN ((${th.shA(b)} * b1 + ${th.shC(b)} * b2) % $P) % 2 = 1 " +
        s"THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n      ")
    val pack = ((0 until 63)
      .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)") :+
      "(CASE WHEN v63 > 0 THEN CAST(-9223372036854775807 - 1 AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH dup AS (SELECT doc_id, text FROM $src),
       |toks AS (SELECT doc_id AS doc, UNNEST(string_split_regex(lower(text), '\\s+')) AS t
       |         FROM dup),
       |th AS (SELECT doc, ${baseHashSql("t")} AS b1,
       |             ${baseHash2Sql("t")} AS b2 FROM toks WHERE t <> ''),
       |votes AS (SELECT doc,
       |      $votes
       |    FROM th GROUP BY doc),
       |shash AS (SELECT doc, CAST($pack AS BIGINT) AS simhash FROM votes),
       |chunks AS (
       |  SELECT doc, simhash, c.chunk, (simhash >> (c.chunk * 16)) & 65535 AS ckey
       |  FROM shash, (SELECT UNNEST([0, 1, 2, 3]) AS chunk) c),
       |cand AS (
       |  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
       |    a.simhash AS sh_a, b.simhash AS sh_b
       |  FROM chunks a JOIN chunks b
       |    ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc < b.doc)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS dist
       |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Exact n-gram (word k-gram) Jaccard near-dup pairs with
    * rare-shingle blocking — the q41d core, parameterized so specs can
    * drive it on adversarial fixtures. Returns (da, db, jaccard) with
    * da < db and jaccard ≥ threshold, jaccard rounded to 6 places.
    *
    * Scale shape (100 TB): every relation after the first projection
    * carries (doc, xxhash64(shingle)) — 8-byte hashes, never strings
    * (equality is all any consumer needs; results identical up to
    * 2^-64-scale collisions). Candidate generation joins only RARE
    * shingles (document frequency ≤ maxDf), bounding each shingle's
    * pair fan-out at maxDf·(maxDf-1)/2. Common counts are PAIR-BOUNDED:
    * enumerate per candidate pair, never self-join on a raw shingle
    * hash (a stopword bigram shared by D candidate docs would emit
    * D²/2 rows — a frequency-skewed hot key). See `ngramJaccardStages`
    * for the stage-by-stage rationale. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 2, maxDf: Int = 20, threshold: Double = 0.2): DataFrame =
    ngramJaccardStages(docs, idCol, textCol, k, maxDf, threshold)._3

  /** Internal stages of [[ngramJaccardPairs]] — (cand, candShingles,
    * result) — exposed so DedupSpec can bound the pair-enumeration
    * volume on a stopword-heavy fixture. */
  /** Shared candidate stage: hashed shingles + rare-shingle-blocked
    * DISTINCT (da, db) pairs — the pair generator behind both the
    * jaccard verify (ngramJaccardStages) and the scaled edit-distance
    * verify (editDistanceNearDupsScaled). Returns (sh, cand), both
    * eagerly localCheckpointed. */
  private[graft] def shingleCandidates(docs: DataFrame, idCol: String,
      textCol: String, k: Int, maxDf: Int): (DataFrame, DataFrame, DataFrame) = {
    // The shingle map is CPU-dense, not byte-dense — widen a
    // byte-small corpus to the core count first (spreadToCores, the
    // same rule the signature maps use).
    val spread = spreadToCores(docs)
    // Eager localCheckpoint, not cache(): the relation feeds several
    // downstream joins; checkpoint blocks are freed with the RDD
    // instead of pinning the session cache across a long-lived session.
    val sh = wordShingles(spread, idCol, textCol, k)
      .select(col("doc"), xxhash64(col("shingle")).as("sh"))
      .transform(graft.Staging.stage)
    val docFreq = sh.groupBy("sh").agg(count(lit(1)).as("c"))
    val rare = sh.join(docFreq.filter(col("c") <= maxDf), "sh")
    // cand is the small DISTINCT (da, db) pair relation; deduplicated
    // because consumers use it as a real inner-join input (a duplicate
    // pair would double a pair-bounded count), and eagerly
    // materialized because several consumers derive from it.
    val cand = rare.as("a").join(rare.as("b"), col("a.sh") === col("b.sh") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("da"), col("b.doc").as("db"))
      .distinct()
      .transform(graft.Staging.stage)
    // rare is returned LAZY (a plan over the checkpointed sh, no extra
    // cost to callers that ignore it) — q41g derives its all-hot doc
    // set from it before dropping sh.
    (sh, rare, cand)
  }

  private[graft] def ngramJaccardStages(docs: DataFrame, idCol: String,
      textCol: String, k: Int, maxDf: Int, threshold: Double)
      : (DataFrame, DataFrame, DataFrame) = {
    val (sh, _, cand) = shingleCandidates(docs, idCol, textCol, k, maxDf)
    // Common-shingle counts touch only CANDIDATE docs' shingles: the
    // full-corpus relation is semi-joined down to docs appearing in a
    // candidate pair (a small fraction of the corpus — at 100 TB this
    // is the difference between joining the corpus twice and joining a
    // sliver of it). `candDocs` sits on the RIGHT/BUILD side of the
    // left-semi join, which is duplicate-insensitive, so no DISTINCT
    // is needed there. The sliver is checkpointed once: three scans
    // below (sizes + both sides of the pair enumeration) would
    // otherwise re-run the semi-join against the full corpus each.
    val candDocs = cand.select(col("da").as("doc"))
      .unionByName(cand.select(col("db").as("doc")))
    val shc = sh.join(candDocs, Seq("doc"), "left_semi")
      .transform(graft.Staging.stage)
    // the full-corpus shingle relation has no consumer past the shc
    // build (cand was materialized inside shingleCandidates) — drop
    // its blocks now instead of carrying them to query end
    graft.CheckpointJanitor.dropNow(sh)
    val sizes = shc.groupBy("doc").agg(count(lit(1)).as("n"))
    // PAIR-BOUNDED common counts: enumerate per candidate pair — join
    // each pair to da's shingles, then probe db's shingles on
    // (doc, sh). Work is Σ_pairs |shingles(da)| plus the matches,
    // bounded by pair count × doc length — NEVER quadratic in how many
    // candidate docs share one hot shingle.
    val common = cand
      .join(shc.as("s1"), col("s1.doc") === col("da"))
      .join(shc.as("s2"), col("s2.doc") === col("db") && col("s2.sh") === col("s1.sh"))
      .groupBy("da", "db").agg(count(lit(1)).as("cm"))
    val result = common
      .join(sizes.as("na"), col("na.doc") === col("da"))
      .join(sizes.as("nb"), col("nb.doc") === col("db"))
      .withColumn("j", col("cm").cast("double") / (col("na.n") + col("nb.n") - col("cm")))
      .filter(col("j") >= threshold)
      .select(col("da"), col("db"), round(col("j"), 6).as("jaccard"))
    (cand, shc, result)
  }

  /** Scale path for edit-distance near-dup (q41g; the q42c
    * `cosineNearDupsScaled` precedent). The declared q41e blocks on
    * (lang, length-bucket) alone, which is QUADRATIC in block
    * occupancy — measured 16.9x wall at 10x data (SCALING.md), because
    * a 10x corpus grows every (lang, bucket) block 10x and pairs 100x.
    * Candidate pairs come from TWO bounded generators, then the same
    * (lang, length-bucket) constraint and thresholded banded
    * levenshtein verify run per CANDIDATE:
    *
    *  1. The rare-shingle generator (df <= maxDf bounds each shingle's
    *     fan-out at maxDf^2/2 — pair-bounded, never block-quadratic).
    *     Rationale for recall: docs within a small edit distance share
    *     almost all shingles, including rare ones — the same blocking
    *     argument the jaccard/minhash family rests on.
    *  2. For pairs involving an ALL-HOT doc (no rare shingle at all —
    *     boilerplate / stopword text, invisible to generator 1 by
    *     construction; round-10 measured them as the whole 0.706→1.0
    *     recall gap): two-pass SORTED-NEIGHBORHOOD blocking within
    *     (lang, length-bucket) — rank ALL block docs by the verify
    *     prefix and by its REVERSE (so an edit near either end of the
    *     prefix still leaves the other key's sort order intact), and
    *     pair each doc with its `window` rank-neighbors per pass,
    *     emitting only pairs where >= 1 side is all-hot (both-rare
    *     pairs are generator 1's job). The ranking is a linear
    *     sort-shuffle over the corpus and the emitted volume is
    *     <= 2·2·window·|hot| pairs — LINEAR in hot-doc count, where
    *     the naive hot×block join is quadratic in block occupancy
    *     (the testdata corpus at sf0.1 is 95% hot: 62.8k block pairs,
    *     100x growth at 10x data). Both passes are strings-and-window-
    *     functions only, so the DuckDB oracle computes identical ranks
    *     (binary collation, total order via the doc-id tiebreak) and
    *     q41g stays fully hash-checked.
    *
    * Oracle-parity assumptions, stated: (a) NULL keys sort LAST on
    * both engines — Spark's window uses asc_nulls_last explicitly to
    * match DuckDB's ASC default (a NULL text/pfx would otherwise
    * diverge the ranks); (b) reverse() is CODEPOINT-level on Spark but
    * grapheme-level on DuckDB — identical on the ASCII/BMP-no-
    * combining-mark corpora this targets, divergent on combining
    * characters (use an NFC-normalizing prep stage for such corpora).
    * Rank-pass scale note: row_number over (lang, lb) sorts each block
    * in ONE task — fine while no single (lang, length-bucket) block
    * dominates the corpus (true here: buckets are 10-char slices). If
    * one block were corpus-scale hot, the mitigation is finer bucketing
    * or a range-partitioned global rank; the candidate volume bound is
    * unaffected either way.
    *
    * Returns (da, db, dist). */
  /** Default sorted-neighborhood rank window (generator 2). The q41g
    * oracle SQL interpolates THIS constant into its BETWEEN bound, so
    * changing it can never silently desynchronize Spark from DuckDB. */
  val NeighborWindow = 3

  /** Exact edit-distance near-dups by (lang, length-bucket) block
    * join + thresholded banded levenshtein over a prefix — the simple,
    * fully-oracle-checkable form. QUADRATIC in block occupancy by
    * construction (SCALING.md: 18x wall at 10x data); call it through
    * [[editDistanceNearDupsAuto]], which bounds that hazard. */
  def editDistanceNearDupsBlocked(docs: DataFrame, idCol: String,
      textCol: String, langCol: String, lenCol: String,
      prefixLen: Int = 60, maxDist: Int = 20): DataFrame = {
    // explicit core-count repartition on the join keys: the blocked
    // self-join's output is byte-small, so AQE would coalesce the
    // shuffle to 1-2 partitions and serialize the CPU-dense
    // levenshtein verify; an explicit repartition(n, keys) satisfies
    // the join's distribution requirement and is never re-coalesced
    val d = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"),
        col(langCol).as("lang"), (col(lenCol) / 10).cast("long").as("lb"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("lang"), col("lb"))
    val a = d.as("a"); val b = d.as("b")
    a.join(b, col("a.lang") === col("b.lang") && col("a.lb") === col("b.lb") &&
        col("a.doc_id") < col("b.doc_id"))
      // thresholded levenshtein: banded DP with early exit (-1 beyond
      // the threshold) — exact for every row the filter keeps
      .withColumn("dist", levenshtein(
        substring(col("a.text"), 1, prefixLen),
        substring(col("b.text"), 1, prefixLen), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"), col("dist"))
  }

  /** Occupancy-guarded edit-distance near-dups (q41e's entry; round-12
    * verdict item 1). The block join's cost driver is the within-block
    * pair count P = Σ_blocks occ·(occ-1)/2: while P stays LINEAR in
    * the corpus (P/n ≤ `maxPairsPerDoc`), the exact block join is the
    * best plan — it runs the verify on exactly the pairs the operator
    * defines, and the oracle checks it bit-for-bit. Above the
    * threshold the same verify runs on [[editDistanceNearDupsScaled]]'s
    * two bounded candidate generators instead (rare-shingle +
    * sorted-neighborhood — measured recall 1.000 on the known-distance
    * DedupSpec fixture, the documented trade of every blocking scheme).
    *
    * The decision costs ONE tiny aggregation (block-occupancy
    * histogram → two scalars on the driver — adaptive planning in the
    * AQE spirit, no row data collects). Driver scales: sf0.01 reads
    * P/n = 1.4, sf0.1 reads 12.6 — both exact; the 10x derivation
    * reads ~126 — scaled. So the declared q41e stays hash-checked at
    * every oracle scale AND holds a ~linear wall at 10x (SCALING.md
    * round-12 row). */
  def editDistanceNearDupsAuto(docs: DataFrame, idCol: String,
      textCol: String, langCol: String, lenCol: String,
      prefixLen: Int = 60, maxDist: Int = 20,
      maxPairsPerDoc: Int = 32): DataFrame =
    editDistanceNearDupsAutoWithPath(docs, idCol, textCol, langCol, lenCol,
      prefixLen, maxDist, maxPairsPerDoc)._1

  /** [[editDistanceNearDupsAuto]] plus which path it chose (true =
    * scaled generators) — exposed so DedupSpec can pin the guard. */
  private[graft] def editDistanceNearDupsAutoWithPath(docs: DataFrame,
      idCol: String, textCol: String, langCol: String, lenCol: String,
      prefixLen: Int = 60, maxDist: Int = 20,
      maxPairsPerDoc: Int = 32): (DataFrame, Boolean) = {
    val stats = docs
      .groupBy(col(langCol), (col(lenCol) / 10).cast("long").as("lb"))
      .agg(count(lit(1)).as("c"))
      .agg(sum((col("c") * (col("c") - 1) / 2).cast("long")).as("pairs"),
        sum(col("c")).as("n"))
      .head()
    val pairs = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val n = math.max(if (stats.isNullAt(1)) 0L else stats.getLong(1), 1L)
    val useScaled = pairs > maxPairsPerDoc.toLong * n
    graft.GuardLog.record("editDistanceNearDupsAuto", useScaled)
    val out =
      if (useScaled)
        editDistanceNearDupsScaled(docs, idCol, textCol, langCol, lenCol,
          prefixLen, maxDist)
      else
        editDistanceNearDupsBlocked(docs, idCol, textCol, langCol, lenCol,
          prefixLen, maxDist)
    (out, useScaled)
  }

  def editDistanceNearDupsScaled(docs: DataFrame, idCol: String,
      textCol: String, langCol: String, lenCol: String,
      prefixLen: Int = 60, maxDist: Int = 20,
      k: Int = 2, maxDf: Int = 20, window: Int = NeighborWindow): DataFrame = {
    val (sh, rare, cand) = shingleCandidates(docs, idCol, textCol, k, maxDf)
    // Docs with >= 1 rare shingle, i.e. the docs generator 1 can see.
    // One extra agg over the checkpointed 8-byte (doc, sh) relation;
    // eagerly materialized (it is sh's LAST consumer — sh's blocks
    // drop right after, instead of living to query end).
    val rareDocs = rare.select("doc").distinct().transform(graft.Staging.stage)
    graft.CheckpointJanitor.dropNow(sh)
    val meta = docs.select(col(idCol).as("doc"),
      substring(col(textCol), 1, prefixLen).as("pfx"), col(langCol).as("lang"),
      (col(lenCol) / 10).cast("long").as("lb"))
    // generator 2: sorted-neighborhood passes over ALL block docs,
    // emitting only pairs that touch an all-hot doc
    val flagged = meta.join(rareDocs.withColumn("has_rare", lit(true)),
        Seq("doc"), "left")
      .withColumn("hot", coalesce(col("has_rare"), lit(false)) === lit(false))
    def neighborPass(key: Column): DataFrame = {
      // asc_nulls_last: DuckDB's ASC puts NULLs last, Spark's first —
      // pin the Spark side so a NULL pfx cannot diverge the ranks
      val w = Window.partitionBy("lang", "lb").orderBy(key.asc_nulls_last, col("doc"))
      val ranked = flagged.withColumn("rk", row_number().over(w))
        .select(col("doc"), col("hot"), col("lang"), col("lb"), col("rk"))
      // rank-window pairing as an EQUI-join: each doc probes its next
      // `window` ranks (explode of a window-sized sequence), so the
      // join shuffles on (lang, lb, rk) instead of theta-banding
      ranked.select(col("lang"), col("lb"), col("doc").as("doc_a"),
          col("hot").as("hot_a"),
          explode(sequence(col("rk") + 1, col("rk") + window)).as("rk"))
        .join(ranked.select(col("lang"), col("lb"), col("rk"),
          col("doc").as("doc_b"), col("hot").as("hot_b")), Seq("lang", "lb", "rk"))
        .filter(col("hot_a") || col("hot_b"))
        .select(least(col("doc_a"), col("doc_b")).as("da"),
          greatest(col("doc_a"), col("doc_b")).as("db"))
    }
    val hotCand = neighborPass(col("pfx"))
      .unionByName(neighborPass(reverse(col("pfx"))))
      .distinct()
    // The union is disjoint-by-construction from cand (a cand pair's
    // docs BOTH have a rare shingle — neither is hot), so no cross-
    // source distinct is needed.
    val allCand = cand.unionByName(hotCand)
    // Catalyst pushes the dist filter into the meta broadcast-join as a
    // join condition, so the CPU-dense levenshtein verify executes in
    // the candidate relation's layout — which is byte-small and
    // AQE-coalesced to 1-2 partitions. Spread it (the streamed join
    // side; BHJ preserves its partitioning) to the core count BEFORE
    // the joins; a post-verify repartition would run too late to help.
    val spread = allCand
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    spread
      .join(meta.as("ma"), col("ma.doc") === col("da"))
      .join(meta.as("mb"), col("mb.doc") === col("db") &&
        col("ma.lang") === col("mb.lang") && col("ma.lb") === col("mb.lb"))
      .withColumn("dist", levenshtein(col("ma.pfx"), col("mb.pfx"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("da"), col("db"), col("dist"))
  }

  /** Connected components over a near-dup pair relation — the cluster
    * RESOLUTION step a dedup pipeline runs after pair generation: every
    * doc in a pair gets the component id (= the component's minimum doc
    * id), so "keep one per cluster" is `doc == comp` and transitive
    * chains (A~B, B~C, A!~C) collapse into one cluster instead of
    * surviving pairwise deletion.
    *
    * Large-star / small-star alternation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014 — the GraphFrames
    * CC algorithm): the EDGE SET itself is rewired each round until
    * every component is a star centered on its minimum id. Large-star
    * links every node's larger neighbors to the minimum of its
    * neighborhood; small-star links its smaller neighbors (and itself)
    * to their minimum. Unlike label propagation, progress is
    * topology-independent: the round-15 CcRoundsProbe showed
    * hash-to-min crawling 13 rounds across the SemDeDup basin graph
    * (flat label forest, one basin-hop per round) where star rounds
    * rewire the whole basin at once. Each round here fuses
    * LS ∘ LS ∘ SS into one materialization (the double large-star
    * quarters path distances per round, so a 1000-doc chain converges
    * in ~6 rounds vs hash-to-min's 10 — spec-pinned in DedupSpec).
    * Convergence is detected STRUCTURALLY: the edge set is a star
    * forest iff every source appears exactly once and no source is
    * also a target — no confirming round, no label diff. The driver
    * loop holds only counts; every round stage-materializes, so
    * lineage stays flat however many rounds run. At 100 TB: state is
    * one (a, b) edge relation the size of the PAIRED docs (a sliver
    * of the corpus), never the corpus itself.
    *
    * SMALL-SLIVER FAST PATH: when the distinct pair count is at most
    * [[SmallGraphEdges]] (broadcast-class bytes — the same size
    * discipline as Spark's own 10 MB broadcast threshold), the star
    * loop's per-round stage-scheduling latency dominates actual work
    * (measured: q41f's 13-pair graph paid ~1.5 s of pure driver-loop
    * overhead). The sliver then runs union-find in ONE narrow task via
    * `mapPartitions` — executor-side, never a driver collect, memory
    * bounded by the guard — producing the identical (doc, comp) labels
    * (component id = min doc id either way; spec-pinned equal). Above
    * the guard the distributed star rounds run unchanged, so the plan
    * scales: the branch choice lands in GuardLog like every other
    * guarded operator.
    *
    * Returns (doc, comp, comp_size) for every doc in a pair. */
  def nearDupComponents(pairs: DataFrame, aCol: String = "da",
      bCol: String = "db", maxIters: Int = 20,
      smallGraphEdges: Long = SmallGraphEdges): DataFrame =
    nearDupComponentsWithRounds(pairs, aCol, bCol, maxIters,
      smallGraphEdges)._1

  /** Fast-path guard: distinct pair count at or below this runs
    * single-task union-find (≈ 1.6 MB of edge longs at the bound —
    * broadcast-class); above it, distributed star rounds. */
  val SmallGraphEdges: Long = 100000L

  /** [[nearDupComponents]] plus the number of star rounds actually
    * executed (0 on the union-find fast path) — the loop is
    * driver-eager, so the count is exact at return. Exposed so
    * DedupSpec can pin the round-count laws: flat at 10x corpus, and
    * ≤ hash-to-min on chain AND basin fixtures (those specs force the
    * distributed path with `smallGraphEdges = 0`). */
  def nearDupComponentsWithRounds(pairs: DataFrame, aCol: String = "da",
      bCol: String = "db", maxIters: Int = 20,
      smallGraphEdges: Long = SmallGraphEdges): (DataFrame, Int) = {
    // canonical orientation big → small; both ops preserve it
    var edges = pairs
      .select(greatest(col(aCol), col(bCol)).as("a"),
        least(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .transform(graft.Staging.stage)

    val nEdges = edges.count() // cheap: the relation is staged
    if (nEdges <= smallGraphEdges) {
      graft.GuardLog.branch("nearDupComponents", "smallSliver")
      return (smallSliverComponents(edges), 0)
    }
    graft.GuardLog.branch("nearDupComponents", "starRounds")

    // The stars ops are MULTISET-safe: group minima are unaffected by
    // duplicate edges, and per-op output size is bounded by ~2× input
    // (each input row emits ≤ 1), so the composite round below runs
    // all three ops duplicate-tolerant and pays ONE distinct at the
    // materialization — two fewer shuffles per round than
    // distinct-per-op, with intermediates bounded at ≤ 4×|edges|.
    // large-star: for each node u, m = min(Γ(u) ∪ {u}); emit (v, m)
    // for v ∈ Γ(u), v > u. Output stays big → small (v > u ≥ m).
    def largeStar(e: DataFrame): DataFrame = {
      val und = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      val mins = und.groupBy("a").agg(min("b").as("nm"))
        .select(col("a"), least(col("a"), col("nm")).as("m"))
      und.join(mins, "a").filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
    }
    // small-star: group edges at their LARGER endpoint u;
    // m = min(Γ⁻(u)); emit (w, m) for w ∈ Γ⁻(u) \ {m} plus (u, m).
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("a").agg(min("b").as("m"))
      e.join(mins, "a")
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .unionByName(mins.select(col("a"), col("m").as("b")))
    }
    // star forest ⇔ sources unique AND sources ∩ targets = ∅; with
    // LS/SS preserving connectivity this means ONE star per component.
    // ONE job: classify each node's (source-count, target-count) in a
    // single groupBy and look for any violating node.
    def isStarForest(e: DataFrame): Boolean =
      e.select(col("a").as("n"), lit(1L).as("s"), lit(0L).as("t"))
        .unionByName(e.select(col("b").as("n"), lit(0L).as("s"), lit(1L).as("t")))
        .groupBy("n").agg(sum("s").as("s"), sum("t").as("t"))
        .filter(col("s") > 1 || (col("s") > 0 && col("t") > 0))
        .isEmpty

    var iters = 0
    var stars = isStarForest(edges)
    while (!stars && iters < maxIters) {
      val next = smallStar(largeStar(largeStar(edges))).distinct()
        .transform(graft.Staging.stage)
      graft.CheckpointJanitor.dropNow(edges)
      edges = next
      iters += 1
      stars = isStarForest(edges)
    }
    // partially-converged edges would silently split one component in
    // several — fail loudly instead (star rounds quarter path
    // distances, so 20 rounds covers ~10^12-doc chains; hitting the
    // budget means the graph or the budget is wrong, not the answer)
    require(stars,
      s"nearDupComponents did not converge within $maxIters rounds " +
        "(edge set is not yet a star forest)")
    val labels = edges.select(col("a").as("doc"), col("b").as("comp"))
      .unionByName(
        edges.select(col("b").as("doc"), col("b").as("comp")).distinct())
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("comp_size"))
    (labels.join(sizes, "comp").select("doc", "comp", "comp_size"), iters)
  }

  /** Single-task union-find over a guard-bounded edge sliver — the
    * [[nearDupComponents]] fast path. Runs WHERE THE DATA IS (one
    * `mapPartitions` task after `coalesce(1)`, not a driver collect);
    * union-by-min with path compression, so the root of every set is
    * the component's minimum id — exactly the star algorithm's label.
    * The comp_size join stays distributed (it is already tiny here). */
  private def smallSliverComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val labels = edges
      .select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) {
            val nx = parent(c); parent(c) = r; c = nx
          }
          r
        }
        val nodes = scala.collection.mutable.LongMap.empty[Unit]
        it.foreach { case (a, b) =>
          nodes.update(a, ()); nodes.update(b, ())
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        nodes.keysIterator.map(n => (n, find(n)))
      }
      .toDF("doc", "comp")
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("comp_size"))
    labels.join(sizes, "comp").select("doc", "comp", "comp_size")
  }

  /** The pre-round-18 CC: hash-to-min label propagation with pointer
    * jumping. Kept as the measured comparator for the star algorithm
    * (DedupSpec pins star rounds ≤ these rounds on chain and basin
    * fixtures) and as the fallback if a deployment ever prefers
    * label-state over edge rewiring. O(diameter-ish) rounds on basin
    * graphs — the round-15 CcRoundsProbe measured 13 rounds on the
    * sf0.1 SemDeDup giant component where the star algorithm rewires
    * in ~3. */
  def nearDupComponentsHashToMinWithRounds(pairs: DataFrame,
      aCol: String = "da", bCol: String = "db",
      maxIters: Int = 20): (DataFrame, Int) = {
    val edges = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .unionByName(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
      .transform(graft.Staging.stage)
    // round 0 fused into the init: label = min(self, direct neighbors)
    // — diameter-1 components (the common near-dup case) then converge
    // in the first loop check without paying a propagation round
    var labels = edges.groupBy(col("a"))
      .agg(min(col("b")).as("nmin"))
      .select(col("a").as("doc"), least(col("a"), col("nmin")).as("comp"))
      .transform(graft.Staging.stage)
    def round(cur: DataFrame): (DataFrame, Long) = {
      val viaNeighbors = edges
        .join(cur.select(col("doc").as("b"), col("comp")), "b")
        .select(col("a").as("doc"), col("comp"))
      val prelim = viaNeighbors.unionByName(cur)
        .groupBy("doc").agg(min("comp").as("comp"))
      // pointer jump: follow the label one hop (comp is itself a doc in
      // the pair set, so the lookup always resolves unless comp is
      // already a root — left join keeps roots as-is)
      val next = prelim
        .join(prelim.select(col("doc").as("comp"), col("comp").as("jump")),
          Seq("comp"), "left")
        .select(col("doc"),
          least(col("comp"), coalesce(col("jump"), col("comp"))).as("comp"))
        .transform(graft.Staging.stage)
      val c = next
        .join(cur.select(col("doc"), col("comp").as("prev")), "doc")
        .filter(col("comp") =!= col("prev")).count()
      (next, c)
    }
    var changed = 1L
    var iters = 0
    while (changed > 0 && iters < maxIters) {
      val (next, c) = round(labels)
      // round() fully consumed the previous labels (next-build +
      // changed-count) — drop its blocks now, not at a later GC
      graft.CheckpointJanitor.dropNow(labels)
      labels = next
      changed = c
      iters += 1
    }
    if (changed > 0) {
      // the budget-exhausting round may itself have been the converging
      // one — convergence is only observable via a FOLLOWING zero-change
      // round, so run one confirming round before failing loudly
      val (next, c) = round(labels)
      graft.CheckpointJanitor.dropNow(labels)
      labels = next
      changed = c
      iters += 1
    }
    // no round runs again: the edge list is dead (the returned plan
    // derives from `labels` alone)
    graft.CheckpointJanitor.dropNow(edges)
    // partially-converged labels would silently split one component in
    // several — fail loudly instead (pointer jumping makes the bound
    // O(log diameter), so 20 rounds covers ~1M-doc chains; hitting it
    // means the graph or the budget is wrong, not the answer)
    require(changed == 0,
      s"nearDupComponents did not converge within $maxIters rounds " +
        s"(+1 confirming round; $changed labels still changing)")
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("comp_size"))
    (labels.join(sizes, "comp").select("doc", "comp", "comp_size"), iters)
  }

  /** 64-bit SimHash over word tokens: per-bit majority vote of token
    * hashes. The 64 votes accumulate in ONE imperative aggregate
    * (`SimHashAgg`, an `Array[Int](64)` buffer with map-side partial
    * merge) instead of 64 separate sum columns — one pass, one narrow
    * agg buffer, the same packed long out. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.SimHashAgg.register(df.sparkSession)
    df.select(col(idCol).as("doc"),
      explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", xxhash64(col("tok")))
      .groupBy("doc").agg(expr("simhash_agg(h)").as("simhash"))
  }

  /** Hamming distance between two simhash longs (popcount via bin()). */
  def hamming(a: Column, b: Column): Column =
    length(regexp_replace(bin(a.bitwiseXOR(b)), "0", ""))

  /** SimHash near-dups: block on 16-bit chunks (a ≤3-bit-different
    * pair must share at least one of 4 chunks — pigeonhole), verify by
    * full Hamming distance. Bounded fan-out: 4 buckets per doc. */
  def simHashNearDups(hashes: DataFrame, maxHamming: Int): DataFrame = {
    // Same recompute guard as minHashNearDups: (doc, simhash) is 16
    // bytes/doc — eagerly localCheckpoint it so the token-hash vote
    // aggregation runs once, not once per self-join side, without
    // pinning session cache (blocks freed with the RDD).
    val mat = hashes.transform(graft.Staging.stage)
    val chunked = mat.select(col("doc"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "ckey")))
    val a = chunked.as("a"); val b = chunked.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("dist", hamming(col("sh_a"), col("sh_b")).cast("int"))
      .filter(col("dist") <= maxHamming)
      .select("doc_a", "doc_b", "dist")
  }

  /** EXACT SUBSTRING dedup (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" shape, token-
    * granular): find every maximal token span covered by an `L`-token
    * gram that occurs ≥ 2 times ANYWHERE in the corpus, and report per
    * document how much of it is duplicated text. Doc-level dedup
    * (q41a–k) cannot see a boilerplate paragraph shared by otherwise-
    * distinct documents; this operator is the published fix.
    *
    * Plan (all relational, no suffix array needed for the ≥2-count
    * criterion):
    *   1. one explode pass → every L-gram occurrence (doc, start,
    *      gram);
    *   2. candidate grams by PORTABLE-HASH frequency — the global
    *      groupBy shuffles 8-byte hashes, never gram strings (at
    *      100 TB the gram relation is ~L× the corpus text, the hash
    *      relation ~1/8 of it);
    *   3. exact verify: only occurrences whose HASH is repeated join
    *      back and recount by the gram STRING — a ~30-bit hash
    *      collides at corpus scale, so the find→verify split keeps
    *      the string shuffle proportional to the DUPLICATED sliver
    *      while making false positives impossible (the minhash-verify
    *      discipline applied to exact matching);
    *   4. per-doc interval UNION of the surviving [s, s+L-1] spans via
    *      one per-doc window (running max of span end — overlapping
    *      grams of a long repeated passage merge without exploding
    *      L rows per gram);
    *   5. left join back to every doc: dup_tokens, dup_frac, and the
    *      ≥50%-duplicated drop verdict.
    *
    * Determinism: counts and span arithmetic are exact integers; the
    * single IEEE division (dup_frac) is rounded at 6 dp; the verdict
    * compares integers. DedupSpec pins interval-union coverage against
    * hand-placed overlapping duplicates. */
  def substringDupStats(docs: DataFrame, idCol: String, textCol: String,
      L: Int = 8): DataFrame = {
    val (toks, dup) = substringDupSpans(docs, idCol, textCol, L)
    val w = Window.partitionBy("doc").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cov = dup.withColumn("pm", max(col("e")).over(w))
      .withColumn("contrib", greatest(lit(0L),
        col("e") - greatest(coalesce(col("pm"), col("s") - 1), col("s") - 1)))
      .groupBy("doc").agg(sum("contrib").as("dup_tokens"),
        count(lit(1)).as("n_dup_grams"))
    toks.select(col("doc"), size(col("l")).cast("long").as("n_tokens"))
      .join(cov, Seq("doc"), "left")
      .select(col("doc").as("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens"), 6).as("dup_frac"),
        (coalesce(col("dup_tokens"), lit(0L)) * 2 < col("n_tokens"))
          .as("keep"))
  }

  /** Shared pipeline prefix of [[substringDupStats]] /
    * [[substringStrip]]: the filtered token arrays and the verified
    * duplicated-gram spans (doc, s, e). */
  private def substringDupSpans(docs: DataFrame, idCol: String,
      textCol: String, L: Int): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).as("doc"),
      array_remove(split(lower(col(textCol)), "\\s+"), "").as("l"))
    // Spark's sequence(1, n) DESCENDS when n < 1 — guard short docs
    // out before generating gram start positions.
    val occ = toks.filter(size(col("l")) >= L)
      .select(col("doc"), posexplode(transform(
        sequence(lit(1), size(col("l")) - (L - 1)),
        i => concat_ws(" ", slice(col("l"), i, lit(L))))).as(Seq("p0", "gram")))
      .select(col("doc"), (col("p0") + 1).cast("long").as("s"), col("gram"))
    // native Horner-fold kernel (bit-identical to TextAnalysis
    // .fingerprint's HOF form, none of its per-char array garbage —
    // this stage hashes ~L× the corpus token count)
    val fp = occ.withColumn("h", graft.functions.PortableHash(col("gram")))
      .transform(graft.Staging.stage) // occurrences feed the hash agg AND the verify join
    val hotHashes = fp.groupBy("h").agg(count(lit(1)).as("hn"))
      .filter(col("hn") >= 2).select("h")
    val cand = fp.join(hotHashes, "h")
    val verified = cand.groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("gram")
    val dup = cand.join(verified, "gram")
      .select(col("doc"), col("s"), (col("s") + (L - 1)).as("e"))
    (toks, dup)
  }

  /** [[substringDupStats]]'s REALIZATION step (q97b): actually strip
    * the duplicated spans and publish the cleaned corpus — the output
    * Lee et al.'s dedup ships to training. Covered positions come from
    * exploding the verified spans (row volume = duplicated occurrences
    * × L, corpus-LINEAR by the measured q97 law — never corpus × L);
    * surviving tokens rejoin per doc through an anti-join and
    * reassemble in position order. Docs losing every token stay in
    * the output with empty text — a corpus release must account for
    * every input id. */
  def substringStrip(docs: DataFrame, idCol: String, textCol: String,
      L: Int = 8): DataFrame = {
    val (toks, dup) = substringDupSpans(docs, idCol, textCol, L)
    val covered = dup
      .select(col("doc"), explode(sequence(col("s"), col("e"))).as("pos"))
      .distinct()
    val positions = toks
      .select(col("doc"), posexplode(col("l")).as(Seq("p0", "t")))
      .select(col("doc"), (col("p0") + 1).cast("long").as("pos"), col("t"))
    val kept = positions.join(covered, Seq("doc", "pos"), "left_anti")
      .groupBy("doc")
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("t")))),
          x => x.getField("t")), " ").as("clean_text"))
    toks.select(col("doc"), size(col("l")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc"), "left")
      .select(col("doc").as("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** DuckDB restatement of [[substringStrip]] — spans, covered-position
    * expansion, anti-join survival, in-order reassembly. */
  def substringStripSql(src: String, L: Int = 8): String = {
    val Lm1 = L - 1
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |           t -> t <> '') AS l
       |  FROM $src),
       |occ AS (
       |  SELECT doc_id, ge.s AS s, ge.gram AS gram FROM (
       |    SELECT doc_id, UNNEST(list_transform(generate_series(1, len(l) - $Lm1),
       |      i -> struct_pack(s := i, gram := array_to_string(l[i:i+$Lm1], ' ')))) AS ge
       |    FROM toks WHERE len(l) >= $L)),
       |fp AS (SELECT doc_id, s, gram, ${baseHashSql("gram")} AS h FROM occ),
       |hot AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) >= 2),
       |cand AS (SELECT fp.doc_id, fp.s, fp.gram FROM fp JOIN hot USING (h)),
       |ver AS (SELECT gram FROM cand GROUP BY gram HAVING COUNT(*) >= 2),
       |dup AS (SELECT c.doc_id, c.s, c.s + $Lm1 AS e FROM cand c JOIN ver USING (gram)),
       |covered AS (SELECT DISTINCT doc_id, pos FROM (
       |    SELECT doc_id, UNNEST(generate_series(s, e)) AS pos FROM dup)),
       |positions AS (
       |  SELECT doc_id, i AS pos, l[i] AS t
       |  FROM toks, UNNEST(generate_series(1, len(l))) AS g(i)),
       |kept AS (
       |  SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
       |    string_agg(p.t, ' ' ORDER BY p.pos) AS clean_text
       |  FROM positions p LEFT JOIN covered c
       |    ON c.doc_id = p.doc_id AND c.pos = p.pos
       |  WHERE c.pos IS NULL
       |  GROUP BY p.doc_id),
       |nt AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens FROM toks)
       |SELECT nt.doc_id, nt.n_tokens,
       |  COALESCE(k.kept_tokens, 0) AS kept_tokens,
       |  COALESCE(k.clean_text, '') AS clean_text
       |FROM nt LEFT JOIN kept k USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB restatement of [[substringDupStats]] — gram enumeration,
    * portable-hash candidates, exact-string verify, interval union and
    * verdicts, bit-exact. `src` must yield (doc_id, text). */
  def substringDupSql(src: String, L: Int = 8): String = {
    val Lm1 = L - 1
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |           t -> t <> '') AS l
       |  FROM $src),
       |occ AS (
       |  SELECT doc_id, ge.s AS s, ge.gram AS gram FROM (
       |    SELECT doc_id, UNNEST(list_transform(generate_series(1, len(l) - $Lm1),
       |      i -> struct_pack(s := i, gram := array_to_string(l[i:i+$Lm1], ' ')))) AS ge
       |    FROM toks WHERE len(l) >= $L)),
       |fp AS (SELECT doc_id, s, gram, ${baseHashSql("gram")} AS h FROM occ),
       |hot AS (SELECT h FROM fp GROUP BY h HAVING COUNT(*) >= 2),
       |cand AS (SELECT fp.doc_id, fp.s, fp.gram FROM fp JOIN hot USING (h)),
       |ver AS (SELECT gram FROM cand GROUP BY gram HAVING COUNT(*) >= 2),
       |dup AS (SELECT c.doc_id, c.s, c.s + $Lm1 AS e FROM cand c JOIN ver USING (gram)),
       |iv AS (SELECT doc_id, s, e,
       |         MAX(e) OVER (PARTITION BY doc_id ORDER BY s
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
       |       FROM dup),
       |cov AS (SELECT doc_id,
       |         CAST(SUM(GREATEST(0, e - GREATEST(COALESCE(pm, s - 1), s - 1))) AS BIGINT) AS dup_tokens,
       |         CAST(COUNT(*) AS BIGINT) AS n_dup_grams
       |       FROM iv GROUP BY 1),
       |nt AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens FROM toks)
       |SELECT nt.doc_id, nt.n_tokens,
       |  COALESCE(cov.dup_tokens, 0) AS dup_tokens,
       |  COALESCE(cov.n_dup_grams, 0) AS n_dup_grams,
       |  ROUND(CAST(COALESCE(cov.dup_tokens, 0) AS DOUBLE) / nt.n_tokens, 6) AS dup_frac,
       |  (COALESCE(cov.dup_tokens, 0) * 2 < nt.n_tokens) AS keep
       |FROM nt LEFT JOIN cov USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }
}
