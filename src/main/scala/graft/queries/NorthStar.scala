package graft.queries

import graft.Tables
import graft.ops.{Dedup, Multimodal, Pq, Similarity, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Q41–Q44 + training-data pipeline ops: dedup family, similarity
  * search, text analysis, multimodal plumbing. Oracle-checked
  * throughout — since round 16 the minhash/simhash family runs on the
  * engine-portable Horner-fold + affine-lane hashes (TextHashes
  * portable kernels), so q41b/q41c are duck-checked like the rest;
  * the xxhash64 variants remain as the non-oracle perf surface,
  * spec-pinned in DedupSpec.
  */
object NorthStar {

  /** documents ∪ shifted copies of every 10th doc — a deterministic
    * corpus WITH duplicates (the driver tables have none). */
  private val dupDocsSql =
    """(SELECT doc_id, text, lang FROM documents
      | UNION ALL
      | SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents
      | WHERE doc_id % 10 = 0)""".stripMargin

  val q41a = QueryDef("q41a_dedup_exact",
    s"""SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper,
       |  CAST(COUNT(*) AS BIGINT) AS copies
       |FROM $dupDocsSql
       |GROUP BY md5(text) HAVING COUNT(*) > 1
       |ORDER BY content_hash""".stripMargin) { (s, dir) =>
    import s.implicits._
    val d = Tables.documents(s, dir).select("doc_id", "text", "lang")
    val dup = d.unionByName(
      d.filter($"doc_id" % 10 === 0)
        .withColumn("doc_id", $"doc_id" + 1000000))
    dup.groupBy(md5($"text").as("content_hash"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("copies"))
      .filter($"copies" > 1)
      .orderBy("content_hash")
  }

  /** Incremental exact dedup (q41h): a new ingest batch — exact
    * copies of every 7th doc plus a twice-repeated "v2" edit of each —
    * deduped within itself (min-id per hash) AND against the existing
    * corpus's hash set. Expected survivors: exactly one v2 row per
    * source doc (the plain copies die against the corpus, the second
    * v2 copy dies within-batch). The existing side contributes only
    * its hash column — the projection a persisted fingerprint table
    * serves at 100 TB. */
  /** The deterministic "fresh crawl batch" shared by q41h/q41i and the
    * streaming twin q79: every 7th doc re-ingested verbatim (cross-
    * corpus dup), plus two ' v2' variants of it (an in-batch dup pair
    * that is NOT in the corpus). */
  private[queries] def incrementalBatch(d: DataFrame): DataFrame = {
    import d.sparkSession.implicits._
    val sevenths = d.filter($"doc_id" % 7 === 0)
    sevenths.withColumn("doc_id", $"doc_id" + 2000000)
      .unionByName(sevenths.select(($"doc_id" + 3000000).as("doc_id"),
        concat($"text", lit(" v2")).as("text")))
      .unionByName(sevenths.select(($"doc_id" + 4000000).as("doc_id"),
        concat($"text", lit(" v2")).as("text")))
  }

  val q41h = QueryDef("q41h_dedup_incremental",
    """WITH base AS (SELECT doc_id, text FROM documents),
      |batch AS (
      |  SELECT doc_id + 2000000 AS doc_id, text FROM base WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 3000000, text || ' v2' FROM base WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 4000000, text || ' v2' FROM base WHERE doc_id % 7 = 0),
      |keep AS (SELECT md5(text) AS h, MIN(doc_id) AS doc_id FROM batch GROUP BY 1)
      |SELECT k.doc_id FROM keep k
      |WHERE h NOT IN (SELECT md5(text) FROM base)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val d = Tables.documents(s, dir).select("doc_id", "text")
    Dedup.incrementalKeepIds(d, incrementalBatch(d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** q41i: the Bloom-prefiltered twin of q41h — same batch, same
    * semantics, same oracle; the bloom (built in one aggregation pass
    * over the existing corpus's fingerprints, applied map-side via
    * the SQL-exposed runtime-filter expressions) only short-circuits
    * definite negatives, so the answer is bit-identical while the
    * exact anti-join receives just the maybe-seen slice. */
  val q41i = QueryDef("q41i_dedup_incremental_bloom", q41h.oracle.get) { (s, dir) =>
    import s.implicits._
    val d = Tables.documents(s, dir).select("doc_id", "text")
    Dedup.incrementalKeepIdsBloom(d, incrementalBatch(d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** MinHash+LSH near-dup pairs over the duplicated corpus: shingle →
    * minhash → band → bucket-join → verify. DUCK-ORACLED since round
    * 16: the portable Horner-fold + affine-lane family
    * ([[graft.ops.Dedup.minHashSignaturesPortable]]) replaces
    * xxhash64, so every signature value, band key and verdict is
    * restated bit-exactly by [[graft.ops.Dedup.minHashPortableSql]].
    * Same fused map-only kernel shape; DedupSpec keeps the xxhash64
    * twins pinned for the non-oracle surface. */
  val q41b = QueryDef("q41b_dedup_minhash",
    Dedup.minHashPortableSql(dupDocsSql, k = 2, numHashes = 32,
      bands = 8, rowsPer = 4, threshold = 0.8)) { (s, dir) =>
    import s.implicits._
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val dup = d.unionByName(
      d.filter($"doc_id" % 10 === 0).withColumn("doc_id", $"doc_id" + 1000000))
    val sigs = Dedup.minHashSignaturesPortable(dup, "doc_id", "text",
      k = 2, numHashes = 32)
    // query-level janitor registration: this DataFrame is consumed
    // exactly once per invocation (Verify write / Bench count), so the
    // signature checkpoint inside its plan dies with that action
    // instead of a later GC (the q41-family bench-jitter fix)
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.minHashNearDupsPortable(sigs, bands = 8, rowsPer = 4, threshold = 0.8)
        .orderBy("doc_a", "doc_b"))
  }

  /** SimHash near-dup pairs (≤3 bits apart, 16-bit chunk blocking) —
    * duck-oracled since round 16 via the same portable hash family
    * ([[graft.ops.Dedup.simHashPortableSql]] restates votes, packing,
    * chunk keys and Hamming verify bit-exactly). */
  val q41c = QueryDef("q41c_dedup_simhash",
    Dedup.simHashPortableSql(dupDocsSql, maxHamming = 3)) { (s, dir) =>
    import s.implicits._
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val dup = d.unionByName(
      d.filter($"doc_id" % 10 === 0).withColumn("doc_id", $"doc_id" + 1000000))
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.simHashNearDups(Dedup.simHashPortable(dup, "doc_id", "text"), maxHamming = 3)
        .orderBy("doc_a", "doc_b"))
  }

  /** Shared DuckDB CTE chain producing the q41d near-dup pair relation
    * (rare-shingle blocking + pair-bounded common counts) — reused by
    * q41f's recursive-CTE component resolution. */
  private val ngramPairCtes =
    """toks AS (
      |  SELECT doc_id AS doc, string_split_regex(lower(text), '\s+') AS l
      |  FROM documents),
      |shingles AS (
      |  SELECT DISTINCT doc,
      |    UNNEST(list_transform(generate_series(1, len(l) - 1),
      |      i -> l[i] || ' ' || l[i + 1])) AS shingle
      |  FROM toks),
      |df AS (SELECT shingle, COUNT(*) AS c FROM shingles GROUP BY shingle),
      |rare AS (SELECT s.doc, s.shingle FROM shingles s JOIN df USING (shingle)
      |         WHERE df.c <= 20),
      |cand AS (SELECT DISTINCT a.doc AS da, b.doc AS db
      |         FROM rare a JOIN rare b USING (shingle) WHERE a.doc < b.doc),
      |sizes AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM shingles GROUP BY doc),
      |common AS (SELECT c.da, c.db, CAST(COUNT(*) AS BIGINT) AS cm
      |           FROM cand c
      |           JOIN shingles s1 ON s1.doc = c.da
      |           JOIN shingles s2 ON s2.doc = c.db AND s2.shingle = s1.shingle
      |           GROUP BY c.da, c.db)""".stripMargin

  private val ngramPairSelect =
    """SELECT da, db,
      |  ROUND(CAST(cm AS DOUBLE) / (na.n + nb.n - cm), 6) AS jaccard
      |FROM common JOIN sizes na ON na.doc = da JOIN sizes nb ON nb.doc = db
      |WHERE CAST(cm AS DOUBLE) / (na.n + nb.n - cm) >= 0.2""".stripMargin

  /** Exact n-gram (word-bigram) Jaccard near-dups with rare-shingle
    * blocking — identical relational program on both engines. */
  val q41d = QueryDef("q41d_dedup_ngram_jaccard",
    s"WITH $ngramPairCtes\n$ngramPairSelect\nORDER BY da, db") { (s, dir) =>
    // All topology/scale rationale lives on Dedup.ngramJaccardStages:
    // hashed shingles (the oracle joins strings; equality is all either
    // side uses), rare-shingle blocking, semi-joined sliver, and
    // PAIR-BOUNDED common-count enumeration (no hot-shingle self-join).
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        k = 2, maxDf = 20, threshold = 0.2)
        .orderBy("da", "db"))
  }

  /** Near-dup CLUSTER resolution over the q41d pair relation:
    * connected components, component id = min doc id, plus component
    * size — the "keep one per cluster" step that collapses transitive
    * chains. Spark runs hash-to-min label propagation
    * (Dedup.nearDupComponents); the oracle computes the identical
    * components with a recursive transitive-closure CTE over the SAME
    * pair SQL — both engines agree on every (doc, comp, comp_size). */
  val q41f = QueryDef("q41f_dedup_clusters",
    s"""WITH RECURSIVE $ngramPairCtes,
       |pairs AS ($ngramPairSelect),
       |edges AS (SELECT da AS a, db AS b FROM pairs
       |          UNION SELECT db AS a, da AS b FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b),
       |comp AS (SELECT a AS doc, least(a, MIN(b)) AS comp
       |         FROM reach GROUP BY a)
       |SELECT c.doc, c.comp, CAST(s.cnt AS BIGINT) AS comp_size
       |FROM comp c JOIN (SELECT comp, COUNT(*) AS cnt FROM comp GROUP BY comp) s
       |  USING (comp)
       |ORDER BY doc""".stripMargin) { (s, dir) =>
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, dir),
      "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.nearDupComponents(pairs).orderBy("doc"))
  }

  /** Edit-distance near-dups: block by (lang, length bucket), verify
    * with levenshtein over an 60-char prefix (cost cap) — the same
    * standard DP both engines implement, so fully oracle-checked.
    * OCCUPANCY-GUARDED (Dedup.editDistanceNearDupsAuto): the exact
    * block join runs while within-block pairs stay linear in the
    * corpus (true at every oracle scale — P/n 1.4 at sf0.01, 12.6 at
    * sf0.1), and the bounded q41g candidate generators take over above
    * the threshold (~126 pairs/doc at the 10x derivation), so no
    * declared entry carries the block-quadratic wall.
    * ORACLE-VALIDITY: the SQL twin states the exact relation, so the
    * hash-check is valid only on the exact branch (below the guard —
    * every driver scale); above it the output is the documented
    * candidate-generator subset. The branch taken is recorded in
    * GuardLog (bench env "guards") and stderr-logged when scaled. */
  val q41e = QueryDef("q41e_dedup_edit_distance",
    """SELECT a.doc_id AS da, b.doc_id AS db,
      |  CAST(levenshtein(substr(a.text, 1, 60), substr(b.text, 1, 60)) AS INTEGER) AS dist
      |FROM documents a JOIN documents b
      |  ON a.lang = b.lang
      | AND a.n_chars // 10 = b.n_chars // 10
      | AND a.doc_id < b.doc_id
      |WHERE levenshtein(substr(a.text, 1, 60), substr(b.text, 1, 60)) <= 20
      |ORDER BY da, db""".stripMargin) { (s, dir) =>
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.editDistanceNearDupsAuto(Tables.documents(s, dir),
        "doc_id", "text", "lang", "n_chars")
        .orderBy("da", "db"))
  }

  /** Scale path for q41e (the q42c `cosineNearDupsScaled` precedent):
    * q41e's (lang, length-bucket) blocking is quadratic in block
    * occupancy (measured 16.9x wall at 10x data — SCALING.md); here
    * the SAME verify runs only on bounded candidate pairs: rare-shingle
    * pairs (df <= 20 caps each shingle's fan-out) plus, for ALL-HOT
    * docs no rare shingle can reach, two-pass sorted-neighborhood
    * blocking within (lang, length-bucket) — linear in hot-doc count
    * (see Dedup.editDistanceNearDupsScaled). The oracle reuses q41d's
    * candidate CTEs and mirrors the neighborhood passes with window
    * functions — identical ranks under binary collation, so q41g stays
    * fully hash-checked. */
  val q41g = QueryDef("q41g_dedup_edit_scaled",
    s"""WITH $ngramPairCtes,
       |meta AS (SELECT doc_id AS doc, lang, n_chars // 10 AS lb,
       |                substr(text, 1, 60) AS pfx,
       |                NOT EXISTS (SELECT 1 FROM rare r WHERE r.doc = doc_id) AS hot
       |         FROM documents),
       |rkf AS (SELECT doc, hot, lang, lb,
       |          row_number() OVER (PARTITION BY lang, lb ORDER BY pfx NULLS LAST, doc) AS rk
       |        FROM meta),
       |rkr AS (SELECT doc, hot, lang, lb,
       |          row_number() OVER (PARTITION BY lang, lb ORDER BY reverse(pfx) NULLS LAST, doc) AS rk
       |        FROM meta),
       |hotcand AS (
       |  SELECT DISTINCT least(a.doc, b.doc) AS da, greatest(a.doc, b.doc) AS db
       |  FROM rkf a JOIN rkf b ON a.lang = b.lang AND a.lb = b.lb
       |   AND b.rk BETWEEN a.rk + 1 AND a.rk + ${Dedup.NeighborWindow} AND (a.hot OR b.hot)
       |  UNION
       |  SELECT DISTINCT least(a.doc, b.doc) AS da, greatest(a.doc, b.doc) AS db
       |  FROM rkr a JOIN rkr b ON a.lang = b.lang AND a.lb = b.lb
       |   AND b.rk BETWEEN a.rk + 1 AND a.rk + ${Dedup.NeighborWindow} AND (a.hot OR b.hot)),
       |cand2 AS (SELECT da, db FROM cand
       |          UNION ALL SELECT da, db FROM hotcand)
       |SELECT c.da, c.db,
       |  CAST(levenshtein(substr(a.text, 1, 60), substr(b.text, 1, 60)) AS INTEGER) AS dist
       |FROM cand2 c
       |JOIN documents a ON a.doc_id = c.da
       |JOIN documents b ON b.doc_id = c.db
       |WHERE a.lang = b.lang AND a.n_chars // 10 = b.n_chars // 10
       |  AND levenshtein(substr(a.text, 1, 60), substr(b.text, 1, 60)) <= 20
       |ORDER BY da, db""".stripMargin) { (s, dir) =>
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.editDistanceNearDupsScaled(Tables.documents(s, dir),
        "doc_id", "text", "lang", "n_chars")
        .orderBy("da", "db"))
  }

  /** Brute-force cosine top-k (exact baseline), decimal-exact dots. */
  val q42 = QueryDef("q42_similarity_bruteforce",
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0),
      |norms AS (
      |  SELECT vec_id, CAST(list_sum(list_transform(embedding,
      |    x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(23,14)))) AS DOUBLE) AS nrm
      |  FROM embeddings),
      |pairs AS (
      |  SELECT q.vec_id AS qid, e.vec_id AS vid,
      |    CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
      |      i -> CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
      |           AS DECIMAL(23,14)))) AS DOUBLE) AS dot
      |  FROM q, embeddings e WHERE e.vec_id <> q.vec_id),
      |scored AS (
      |  SELECT qid, vid, dot / sqrt(nq.nrm * ne.nrm) AS cosine
      |  FROM pairs JOIN norms nq ON nq.vec_id = qid JOIN norms ne ON ne.vec_id = vid)
      |SELECT qid, vid, CAST(rk AS INTEGER) AS rk, ROUND(cosine, 6) AS cosine FROM (
      |  SELECT qid, vid, cosine,
      |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
      |  FROM scored) WHERE rk <= 5
      |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.cosineTopK(emb, emb.filter($"vec_id" % 100 === 0), k = 5)
      .orderBy("qid", "rk")
  }

  /** LSH-bucketed ANN top-k (the 100 TB path; recall vs. q42 asserted
    * in SimilaritySpec). The hyperplanes are LCG-derived ±1 literal
    * arrays shared with the oracle, so the WHOLE pipeline — bucket ids,
    * candidate set, cosines, ranks — hash-checks against DuckDB. */
  val q42b = QueryDef("q42b_similarity_ann_lsh",
    s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0),
       |norms AS (SELECT vec_id, ${Similarity.dotSql("embedding", "embedding")} AS nrm
       |          FROM embeddings),
       |cb AS (${Similarity.bucketedSql("embeddings", 4, 8)}),
       |qb AS (${Similarity.bucketedSql("q", 4, 8)}),
       |cand AS (SELECT DISTINCT qb.vec_id AS qid, cb.vec_id AS vid
       |         FROM cb JOIN qb ON cb.tbl = qb.tbl AND cb.bucket = qb.bucket
       |         WHERE cb.vec_id <> qb.vec_id),
       |scored AS (
       |  SELECT c.qid, c.vid,
       |    ${Similarity.dotSql("q.embedding", "e.embedding")} / sqrt(nq.nrm * ne.nrm) AS cosine
       |  FROM cand c
       |  JOIN q ON q.vec_id = c.qid
       |  JOIN embeddings e ON e.vec_id = c.vid
       |  JOIN norms nq ON nq.vec_id = c.qid
       |  JOIN norms ne ON ne.vec_id = c.vid)
       |SELECT qid, vid, CAST(rk AS INTEGER) AS rk, ROUND(cosine, 6) AS cosine FROM (
       |  SELECT qid, vid, cosine,
       |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
       |  FROM scored) WHERE rk <= 5
       |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.annTopK(emb, emb.filter($"vec_id" % 100 === 0), k = 5,
      planesPerTable = 4, tables = 8)
      .orderBy("qid", "rk")
  }

  /** IVF ANN top-k (the cell-probing scale path, complementing q42b's
    * LSH): strided-sample + one-Lloyd-step coarse quantizer, map-side
    * argmax assignment, nprobe-cell exact verify. Fully hash-checked —
    * the oracle recomputes the same seeds, Lloyd sums, assignments,
    * probes and ranks from the table with the same decimal-exact
    * arithmetic (Similarity.ivfSql). */
  val q42d = QueryDef("q42d_similarity_ivf",
    Similarity.ivfSql(cells = 16, nprobe = 4, k = 5)) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopK(emb, emb.filter($"vec_id" % 100 === 0), k = 5,
      cells = 16, nprobe = 4)
      .orderBy("qid", "rk")
  }

  /** q42e: the PRODUCTION IVF shape — index built once per (JVM,
    * dataset) by IvfIndex.buildOrLoadWithAssignments (centroids + a
    * cell-PARTITIONED assignment parquet), probes read only the probed
    * cells' partitions (round-12 verdict item 2). Same oracle SQL as
    * q42d: the probed path must return byte-identical answers to the
    * inline rebuild, proven by hash here and by partition-pruned-scan
    * assertion in IvfIndexSpec. */
  private val ivfScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  /** The per-(JVM, dataset) build-once IVF index (cells = 16) shared by
    * every query that probes the corpus under the SAME quantizer —
    * q42e's ANN serving and q100b's hard-negative mining. Scratch
    * memoized per dataset (the bucketedDir/csvScratch pattern): the
    * index is BUILD-ONCE state, not per-query work. */
  private def sharedIvfIndex(s: org.apache.spark.sql.SparkSession, dir: String,
      emb: org.apache.spark.sql.DataFrame)
      : (Seq[(Int, Array[Double], Double)], org.apache.spark.sql.DataFrame) = {
    val scratch = ivfScratch.computeIfAbsent(dir, _ =>
      java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/index")
    scratch.synchronized {
      graft.ops.IvfIndex.buildOrLoadWithAssignments(s, emb, cells = 16, scratch)
    }
  }
  val q42e = QueryDef("q42e_similarity_ivf_indexed",
    Similarity.ivfSql(cells = 16, nprobe = 4, k = 5)) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val (cents, assigned) = sharedIvfIndex(s, dir, emb)
    Similarity.ivfTopKProbed(cents, assigned,
      emb.filter($"vec_id" % 100 === 0), k = 5, nprobe = 4)
      .orderBy("qid", "rk")
  }

  /** q42g: the IVF index LIFECYCLE — q41n's delta-maintenance shape
    * applied to the ANN family (the Faiss `add` semantic): the
    * quantizer is trained ONCE on the original corpus slice and then
    * FROZEN; arriving vectors are assigned under it (a delta-sized
    * map, [[graft.ops.IvfIndex.appendAssignments]]) and appended to
    * the cell-partitioned assignment artifact — the corpus is never
    * re-read, the quantizer never retrained per arrival. Probes over
    * the maintained index surface the delta vectors exactly as a
    * from-scratch union assignment would (spec-pinned bit-identity;
    * the oracle trains on the slice and assigns/verifies over the
    * union — [[graft.ops.Similarity.ivfDeltaSql]]). Recall drift under
    * a frozen quantizer is the documented trade: re-train on the
    * rebuild cadence, re-check the recall SLA then. */
  private val ivfDeltaScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  val q42g = QueryDef("q42g_similarity_ivf_delta",
    Similarity.ivfDeltaSql(cells = 16, nprobe = 4, k = 5)) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val scratch = buildOnceScratch(ivfDeltaScratch, dir, "graft_ivfd") { p =>
      val corpus0 = emb.filter($"vec_id" % 10 =!= 7)
      val c = graft.ops.IvfIndex.buildOrLoad(s, corpus0, cells = 16, p)
      graft.ops.IvfIndex.saveAssignments(s, corpus0, c, p + ".assign")
      graft.ops.IvfIndex.appendAssignments(s,
        emb.filter($"vec_id" % 10 === 7), c, p + ".assign")
    }
    val (cents, assigned) =
      (graft.ops.IvfIndex.load(s, scratch),
        graft.ops.IvfIndex.loadAssignments(s, scratch + ".assign"))
    Similarity.ivfTopKProbed(cents, assigned,
      emb.filter($"vec_id" % 100 === 0), k = 5, nprobe = 4)
      .orderBy("qid", "rk")
  }

  /** q79c: q42g's grow lifecycle run CONTINUOUSLY — the similarity
    * family's twin of q79b: arriving vectors land as a STREAM and each
    * `foreachBatch` tick folds them into the live generation's
    * cell-partitioned assignment under the FROZEN quantizer
    * ([[graft.ops.IvfIndex.appendAssignments]] — a delta-sized map +
    * idempotent token splice, crash-safe per tick), then evaluates the
    * DERIVED retrain trigger in-loop ([[graft.ops.IvfIndex
    * .needsRetrain]]). The fixture is the NATURAL (undrifted) arrival,
    * so the tick-by-tick pin is the measured null result: natural
    * growth must NOT fire the occupancy trigger (SCALING.md: natural
    * driftRatio 0.975–1.08 across the decade vs the 1.25 threshold) —
    * the monitor that tells a 100 TB deployment retraining would buy
    * nothing. Per-vector assignment is order-independent, so ANY
    * micro-batching converges to q42g's index; the oracle is q42g's
    * text VERBATIM (train on the slice, assign/verify over the union)
    * and StreamingIvfSpec pins streamed ≡ q42g plus the quiet trigger
    * and the single-generation layout. */
  private val ivfStreamScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Test hook: the memoized q79c generation root for `dir`, once
    * built (StreamingIvfSpec reads drift/generation state through
    * it). */
  private[graft] def q79cArtifactRoot(dir: String): Option[String] =
    Option(ivfStreamScratch.get(dir)).filter(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(p + "_BUILT")))

  val q79c = QueryDef("q79c_stream_ivf_accept",
    Similarity.ivfDeltaSql(cells = 16, nprobe = 4, k = 5)) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val scratch = buildOnceScratch(ivfStreamScratch, dir, "graft_ivfs") { p =>
      val corpus0 = emb.filter($"vec_id" % 10 =!= 7)
      val c0 = Similarity.ivfCentroids(corpus0, cells = 16)
      graft.ops.IvfIndex.commitGeneration(s, corpus0, c0, p)
      val assignDir = graft.ops.IvfIndex.currentGenDir(s, p).get + "/assign"
      // q79b's staging discipline: tens-digit-mod-4 single-file slices
      // (deterministic micro-batches, populated at all SFs), stale
      // checkpoint wiped — and PROVEN gone — so a crashed build's
      // re-run replays the whole feed against the artifact
      // commitGeneration just reset
      val ckpt = p + "_ckpt"
      Streaming.wipeCheckpoint(ckpt)
      val feed = p + "_feed"
      Streaming.stageSingleFileSlices(emb.filter($"vec_id" % 10 === 7),
        pmod(floor($"vec_id" / 10), lit(4)), 4, feed)
      val sch = s.read.parquet(feed).schema
      val ss = Streaming.streamSession(s)
      val q = ss.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(feed)
        .writeStream
        .foreachBatch { (mb: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          val bs = mb.sparkSession
          graft.ops.IvfIndex.appendAssignments(bs, mb.toDF(), c0, assignDir)
          require(!graft.ops.IvfIndex.needsRetrain(bs, p),
            "natural arrival must keep the derived retrain trigger quiet")
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // landed guard (q79b's m.gen > 1 twin): every vector — original
      // corpus AND every streamed arrival — must be in the assignment,
      // or the build must fail here rather than commit a silently
      // incomplete index (e.g. a stream that ran zero ticks)
      val (_, totalAssigned) = graft.ops.IvfIndex.occupancy(s, assignDir)
      val expected = emb.count()
      require(totalAssigned == expected,
        s"streamed grow left the assignment incomplete: " +
          s"$totalAssigned of $expected vectors landed")
    }
    val (cents, assigned) = graft.ops.IvfIndex.loadCurrent(s, scratch)
    Similarity.ivfTopKProbed(cents, assigned,
      emb.filter($"vec_id" % 100 === 0), k = 5, nprobe = 4)
      .orderBy("qid", "rk")
  }

  /** q42h: the RETRAIN CADENCE — the step q42g's op doc promises
    * ("re-train on the rebuild cadence, re-check the recall SLA
    * then"), made real AND TRIGGERED (round-19 verdict item 3): the
    * lifecycle's corpus is the DRIFTED fixture — 30% of the table
    * arrives shifted by a constant direction the original quantizer
    * never saw (IvfRetrainProbe's production failure, a deterministic
    * `+3.0f` on dimension `vec_id % 3`, replayed verbatim by the
    * oracle's `corpus2` CTE) — so the frozen-quantizer grow phase
    * (train on the undrifted 70%, append the drifted 30% under it via
    * [[graft.ops.IvfIndex.appendAssignments]]) actually CROWDS cells,
    * and the retrain runs exactly when the DERIVED occupancy trigger
    * fires ([[graft.ops.IvfIndex.needsRetrain]] — live max-cell
    * occupancy ≥ [[graft.ops.IvfIndex.RetrainOccupancyFactor]] = 1.25×
    * the committed baseline; the entry REQUIRES
    * fires-before / quiet-after, so the driver run itself pins the
    * operating point, like q41p's compaction threshold). The retrain
    * is deterministic k-means over the grown corpus (q42f's 3
    * exact-decimal Lloyd rounds), a full re-assignment, and an ATOMIC
    * generation swap of the (quantizer, assignment) PAIR
    * ([[graft.ops.IvfIndex.commitGeneration]] — cell ids mean
    * different regions under different centroids, so a torn pair
    * would probe the wrong vectors; IvfIndexSpec crash-injects the
    * swap). The oracle is q42f's full k-means IVF pipeline over the
    * drifted corpus: the retrained index must answer exactly as an
    * index built from scratch over everything it now holds. Recall /
    * occupancy / candidate-volume laws in SCALING.md (IvfRetrainProbe,
    * rounds 19-20). */
  private val ivfRetrainScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val q42hSql: String = {
    // float addition replayed exactly: x + 3.0f == round-to-float of
    // the exact double sum, which is what the CAST chain computes
    val drift =
      """WITH corpus2 AS MATERIALIZED (
        |  SELECT vec_id,
        |    CASE WHEN vec_id % 10 >= 7 THEN
        |      list_transform(generate_series(1, len(embedding)),
        |        i -> CASE WHEN (i - 1) = vec_id % 3
        |             THEN CAST(CAST(embedding[i] AS DOUBLE) + 3.0 AS REAL)
        |             ELSE embedding[i] END)
        |    ELSE embedding END AS embedding
        |  FROM embeddings),
        |""".stripMargin
    drift + Similarity.ivfIterSql(cells = 16, nprobe = 4, k = 5,
      iters = 3, src = "corpus2").stripPrefix("WITH ")
  }
  val q42h = QueryDef("q42h_similarity_ivf_retrain", q42hSql) { (s, dir) =>
    import s.implicits._
    val corpus2 = Tables.embeddings(s, dir).select($"vec_id",
      when($"vec_id" % 10 >= 7,
        transform($"embedding", (x, i) =>
          when(i === pmod($"vec_id", lit(3)).cast("int"), x + lit(3.0f))
            .otherwise(x)))
        .otherwise($"embedding").as("embedding"))
    val scratch = buildOnceScratch(ivfRetrainScratch, dir, "graft_ivfr") { p =>
      // gen-1: the frozen-quantizer grow lifecycle (q42g's shape) over
      // the drifted arrival stream
      val corpus0 = corpus2.filter($"vec_id" % 10 < 7)
      val c0 = Similarity.ivfCentroids(corpus0, cells = 16)
      graft.ops.IvfIndex.commitGeneration(s, corpus0, c0, p)
      graft.ops.IvfIndex.appendAssignments(s,
        corpus2.filter($"vec_id" % 10 >= 7), c0,
        graft.ops.IvfIndex.currentGenDir(s, p).get + "/assign")
      // gen-2: the retrain runs AT the derived trigger, not on faith
      require(graft.ops.IvfIndex.needsRetrain(s, p),
        "q42h's drift fixture must fire the derived occupancy trigger")
      graft.ops.IvfIndex.retrain(s, corpus2, cells = 16, iters = 3, p)
      require(!graft.ops.IvfIndex.needsRetrain(s, p),
        "the retrain must quiesce the trigger")
    }
    val (cents, assigned) = graft.ops.IvfIndex.loadCurrent(s, scratch)
    Similarity.ivfTopKProbed(cents, assigned,
      corpus2.filter($"vec_id" % 100 === 0), k = 5, nprobe = 4)
      .orderBy("qid", "rk")
  }

  /** q42f: IVF with a DETERMINISTIC K-MEANS quantizer (round-16
    * verdict item 2) — the strided seeds refined by THREE fixed
    * exact-decimal Lloyd iterations instead of one
    * ([[graft.ops.Similarity.ivfCentroidsIter]]): no randomness, no
    * convergence test, so the whole training loop unrolls into
    * oracle CTEs and the full pipeline hash-checks like q42d. Build
    * cost is iters× one corpus pass + a (cell, dim) map-side-combined
    * shuffle — a BUILD-time dial (probe cost unchanged) that buys
    * tighter cells: measured recall at equal nprobe=4 in SCALING.md
    * round 16. */
  val q42f = QueryDef("q42f_similarity_ivf_kmeans",
    Similarity.ivfIterSql(cells = 16, nprobe = 4, k = 5, iters = 3)) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfTopKWith(
      Similarity.ivfCentroidsIter(emb, cells = 16, iters = 3),
      emb, emb.filter($"vec_id" % 100 === 0), k = 5, nprobe = 4)
      .orderBy("qid", "rk")
  }

  /** Embedding-cosine near-duplicate pairs (multi-table LSH blocked,
    * exact-decimal verify) — same literal planes as q42b → fully
    * oracle-checked, and non-empty at every driver SF (the 0.35
    * threshold sits inside the fixture's cosine distribution).
    * OCCUPANCY-GUARDED (Similarity.cosineNearDupsAuto): the fixed
    * 4-plane plan runs while expected bucket occupancy ≤ 1024 (all
    * oracle scales), and planesForCorpus-sized planes take over above
    * it, so the declared entry never pays the measured 23-34x
    * fixed-plane wall (SCALING.md).
    * ORACLE-VALIDITY: the SQL twin fixes 4-plane buckets, so the
    * hash-check is valid only on the fixed branch (below the guard —
    * every driver scale); above it the pair set is differently blocked
    * (still threshold-verified-exact). Branch recorded in GuardLog
    * (bench env "guards") and stderr-logged when scaled. */
  val q42c = QueryDef("q42c_dedup_embedding_cosine",
    s"""WITH eb AS (${Similarity.bucketedSql("embeddings", 4, 4)}),
       |norms AS (SELECT vec_id, ${Similarity.dotSql("embedding", "embedding")} AS nrm
       |          FROM embeddings),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |         FROM eb a JOIN eb b
       |           ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |scored AS (
       |  SELECT c.vec_a, c.vec_b,
       |    ${Similarity.dotSql("ea.embedding", "eb2.embedding")} / sqrt(na.nrm * nb.nrm) AS cosine
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.vec_a
       |  JOIN embeddings eb2 ON eb2.vec_id = c.vec_b
       |  JOIN norms na ON na.vec_id = c.vec_a
       |  JOIN norms nb ON nb.vec_id = c.vec_b)
       |SELECT vec_a, vec_b, ROUND(cosine, 6) AS cosine FROM scored
       |WHERE cosine >= 0.35
       |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
    Similarity.cosineNearDupsAuto(Tables.embeddings(s, dir),
      planesPerTable = 4, tables = 4, threshold = 0.35)
      .orderBy("vec_a", "vec_b")
  }

  /** Cluster-balanced diverse subset selection (q74): IVF-quantize the
    * corpus (q42d's deterministic coarse quantizer), rank every vector
    * within its cell by cosine-to-own-centroid (representativeness),
    * keep the top 8 per cell — every region of embedding space
    * retains members, where a global score cut would drain sparse
    * regions (the diversity-preserving subsample a curation pipeline
    * runs between dedup and packing). Fully hash-checked: the oracle
    * recomputes the identical quantizer (shared CTE text with q42d's
    * oracle) and the identical ranks
    * ([[graft.ops.Similarity.clusterBalancedSelect]] documents the
    * map-only assignment + per-cell window plan). */
  val q74 = QueryDef("q74_cluster_balanced_select",
    Similarity.clusterSelectSql(cells = 16, m = 8)) { (s, dir) =>
    Similarity.clusterBalancedSelect(Tables.embeddings(s, dir),
      cells = 16, m = 8)
      .orderBy("cell", "rk")
  }

  /** Token frequency top-100 (split → explode → count). */
  val q43a = QueryDef("q43a_token_counts",
    """SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM (SELECT UNNEST(string_split_regex(lower(text), '\s+')) AS token
      |      FROM documents)
      |WHERE token <> ''
      |GROUP BY token ORDER BY cnt DESC, token LIMIT 100""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(split(lower($"text"), "\\s+")).as("token"))
      .filter($"token" =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"token").limit(100)
  }

  /** Language-ID: stopword-ratio vote, identical relational heuristic
    * on both engines (argmax, alphabetical tie-break). */
  val q43b = QueryDef("q43b_language_id", {
    val langs = TextAnalysis.stopwords.keys.toSeq.sorted
    def lst(l: String) =
      TextAnalysis.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
    val scoreCols = langs.map(l =>
      s"ROUND(CAST(len(list_filter(toks, t -> list_contains(${lst(l)}, t))) AS DOUBLE) / greatest(len(toks), 1), 6) AS score_$l")
      .mkString(",\n  ")
    // argmax with earliest-alphabetical tie-break: lang i wins iff its
    // score strictly exceeds the max of all earlier langs and no later
    // lang strictly exceeds the running max (mirrors the Scala fold).
    val pred = langs.tail.reverse.zipWithIndex.map { case (l, _) =>
      val earlier = langs.takeWhile(_ != l).map(e => s"score_$e").mkString(", ")
      s"WHEN score_$l > greatest($earlier) THEN '$l'"
    }.mkString("CASE ", " ", s" ELSE '${langs.head}' END")
    s"""WITH scored AS (
       |  SELECT doc_id, lang,
       |  $scoreCols
       |  FROM (SELECT doc_id, lang,
       |          string_split_regex(lower(text), '\\s+') AS toks
       |        FROM documents))
       |SELECT doc_id, lang, ${langs.map(l => s"score_$l").mkString(", ")},
       |  $pred AS pred_lang
       |FROM scored ORDER BY doc_id""".stripMargin
  }) { (s, dir) =>
    import s.implicits._
    val langs = TextAnalysis.stopwords.keys.toSeq.sorted
    val out = TextAnalysis.languageId(Tables.documents(s, dir), "text")
    out.select((Seq($"doc_id", $"lang") ++
      langs.map(l => round(col(s"score_$l"), 6).as(s"score_$l")) :+
      $"pred_lang"): _*)
      .orderBy("doc_id")
  }

  /** Quality scoring: length/punct/stopword signals, shared formula. */
  val q43c = QueryDef("q43c_quality_score",
    """SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens, avg_word_len,
      |  punct_ratio, stopword_ratio, quality FROM (
      |  SELECT doc_id,
      |    len(toks) AS n_tokens,
      |    ROUND(nchar / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS avg_word_len,
      |    ROUND(punct / greatest(nchar, 1.0), 6) AS punct_ratio,
      |    ROUND(stop_hits / greatest(CAST(len(toks) AS DOUBLE), 1.0), 6) AS stopword_ratio,
      |    ROUND(least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4 +
      |      (1.0 - punct / greatest(nchar, 1.0)) * 0.3 +
      |      least(stop_hits / greatest(CAST(len(toks) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.3, 6) AS quality
      |  FROM (
      |    SELECT doc_id,
      |      string_split_regex(lower(text), '\s+') AS toks,
      |      CAST(length(text) AS DOUBLE) AS nchar,
      |      CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')) AS DOUBLE) AS punct,
      |      CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
      |        t -> list_contains(['the','of','and','to','in','is','on','for'], t))) AS DOUBLE) AS stop_hits
      |    FROM documents))
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    TextAnalysis.qualityScore(Tables.documents(s, dir), "text")
      .select("doc_id", "n_tokens", "avg_word_len", "punct_ratio",
        "stopword_ratio", "quality")
      .orderBy("doc_id")
  }

  /** Token counting (whitespace + BPE-ish estimate) + rolling-hash
    * fingerprint — identical modular Horner fold on both engines. */
  val q43d = QueryDef("q43d_tokens_fingerprint",
    """SELECT doc_id,
      |  CAST(ws_tokens AS INTEGER) AS ws_tokens,
      |  CAST(bpe_tokens AS INTEGER) AS bpe_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER) AS re_tokens,
      |  list_reduce(
      |    [CAST(7 AS BIGINT)] ||
      |    list_transform(list_filter(string_split(lower(trim(text)), ''), c -> c <> ''),
      |      c -> CAST(ascii(c) AS BIGINT)),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
      |FROM (
      |  SELECT doc_id, text,
      |    len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
      |    list_reduce([CAST(0 AS BIGINT)] ||
      |      list_transform(string_split_regex(trim(text), '\s+'),
      |        w -> CAST(ceil(CAST(length(w) AS DOUBLE) / 4.0) AS BIGINT)),
      |      (a, b) -> a + b) AS bpe_tokens
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    TextAnalysis.tokenCounts(Tables.documents(s, dir), "text")
      .withColumn("fingerprint", TextAnalysis.fingerprint($"text"))
      .select("doc_id", "ws_tokens", "bpe_tokens", "re_tokens", "fingerprint")
      .orderBy("doc_id")
  }

  /** Per-language length-distribution report (q43f): exact linear-
    * interpolated quantiles of n_chars — the corpus-stats table every
    * dataset release publishes. Spark `percentile` and DuckDB
    * `quantile_cont` share the R-7 convention; results round to 6
    * digits to absorb last-ulp association differences. One two-phase
    * hash aggregate over ~|langs| keys — at 100 TB the partial
    * aggregation absorbs the corpus map-side (for a sketch-based
    * single-pass alternative at extreme cardinality, see Q35's
    * approx_count_distinct precedent; exact percentile needs the
    * per-group value multiset, which Spark accumulates sorted). */
  val q43f = QueryDef("q43f_length_quantiles",
    """SELECT lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
      |  ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
      |  ROUND(quantile_cont(n_chars, 0.75), 6) AS p75,
      |  ROUND(quantile_cont(n_chars, 0.9), 6) AS p90
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.9D))").as("qa"))
      .select($"lang", $"n_docs",
        round(element_at($"qa", 1), 6).as("p25"),
        round(element_at($"qa", 2), 6).as("p50"),
        round(element_at($"qa", 3), 6).as("p75"),
        round(element_at($"qa", 4), 6).as("p90"))
      .orderBy("lang")
  }

  /** TF-IDF top-5 terms per document (q43g): per-(doc, term) counts,
    * corpus doc-frequency from the SAME tf relation (no second scan),
    * smoothed idf = ln((N+1)/(df+1)) + 1. Ranked by the ROUNDED score
    * (then term) so a 1-ulp ln() difference between Java and DuckDB
    * libm can never flip ranks the value hash can't see —
    * [[graft.ops.TextAnalysis.tfIdfTopTerms]] documents the contract. */
  val q43g = QueryDef("q43g_tfidf_top_terms",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM toks WHERE term <> '' GROUP BY 1, 2),
      |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    ROUND(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, term, tf, df, tfidf, CAST(rk AS INTEGER) AS rk FROM (
      |  SELECT scored.*, ROW_NUMBER() OVER (
      |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      |  FROM scored) t WHERE rk <= 5
      |ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
    TextAnalysis.tfIdfTopTerms(Tables.documents(s, dir), "doc_id", "text", 5)
      .orderBy("doc_id", "rk")
  }

  /** kNN label classification (q83): predict each query vector's
    * label by majority vote over its 5 nearest neighbors (exact
    * cosine, [[graft.ops.Similarity.cosineTopK]]) — the standard
    * label-propagation / auto-labeling shape an embedding pipeline
    * runs to extend a small labeled seed set, and the first query to
    * exercise the embeddings table's `label` column. Deterministic
    * end-to-end: the neighbor set is the decimal-exact top-k (total
    * tie-break on vid), the vote is integer counting, and the
    * predicted label breaks vote ties on the SMALLEST label. Output
    * carries the true label so the result doubles as a
    * leave-one-out accuracy audit. Plan: the kNN join is q42's
    * broadcast-query shape; votes and prediction are two tiny
    * per-query aggregates. */
  /** The kNN-vote CTE prefix shared by q83's and q91's oracles —
    * extracted verbatim so both recompute the IDENTICAL neighbor set,
    * votes, and predictions. */
  private val knnVoteCte: String =
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 100 = 0),
      |norms AS (
      |  SELECT vec_id, CAST(list_sum(list_transform(embedding,
      |    x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(23,14)))) AS DOUBLE) AS nrm
      |  FROM embeddings),
      |pairs AS (
      |  SELECT q.vec_id AS qid, e.vec_id AS vid,
      |    CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
      |      i -> CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
      |           AS DECIMAL(23,14)))) AS DOUBLE) AS dot
      |  FROM q, embeddings e WHERE e.vec_id <> q.vec_id),
      |scored AS (
      |  SELECT qid, vid, dot / sqrt(nq.nrm * ne.nrm) AS cosine
      |  FROM pairs JOIN norms nq ON nq.vec_id = qid JOIN norms ne ON ne.vec_id = vid),
      |top AS (SELECT qid, vid FROM (
      |    SELECT qid, vid,
      |      ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
      |    FROM scored) WHERE rk <= 5),
      |votes AS (SELECT t.qid, e.label, CAST(COUNT(*) AS BIGINT) AS votes
      |          FROM top t JOIN embeddings e ON e.vec_id = t.vid GROUP BY 1, 2),
      |pred AS (SELECT qid, label AS pred_label, votes FROM (
      |    SELECT qid, label, votes, ROW_NUMBER() OVER (
      |      PARTITION BY qid ORDER BY votes DESC, label) AS rn
      |    FROM votes) WHERE rn = 1)""".stripMargin

  /** Shared Spark prefix of q83/q91: (qid, true_label, pred_label,
    * votes) under the deterministic kNN vote. */
  private def knnPred(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
    val labels = emb.select($"vec_id", $"label")
    val top = Similarity.cosineTopK(emb, emb.filter($"vec_id" % 100 === 0), k = 5)
      .select($"qid", $"vid")
    val votes = top.join(labels.withColumnRenamed("vec_id", "vid"), "vid")
      .groupBy("qid", "label").agg(count(lit(1)).as("votes"))
    val rn = Window.partitionBy("qid").orderBy($"votes".desc, $"label")
    val pred = votes.withColumn("rn", row_number().over(rn))
      .filter($"rn" === 1)
      .select($"qid", $"label".as("pred_label"), $"votes")
    pred.join(labels.select($"vec_id".as("qid"), $"label".as("true_label")), "qid")
  }

  val q83 = QueryDef("q83_knn_label_classify",
    knnVoteCte + """
      |SELECT p.qid, CAST(e.label AS INTEGER) AS true_label,
      |  CAST(p.pred_label AS INTEGER) AS pred_label, p.votes
      |FROM pred p JOIN embeddings e ON e.vec_id = p.qid
      |ORDER BY p.qid""".stripMargin) { (s, dir) =>
    import s.implicits._
    knnPred(s, dir)
      .select($"qid", $"true_label", $"pred_label", $"votes")
      .orderBy("qid")
  }

  /** Classifier evaluation metrics (q91): the per-class confusion
    * counts + precision/recall/F1 table every model-eval pipeline
    * publishes, computed over q83's kNN predictions (shared CTE
    * prefix — bit-identical neighbor set, votes, predictions). The
    * determinism trick: each metric is ONE division whose operands
    * are integers — precision = tp/(tp+fp), recall = tp/(tp+fn),
    * F1 = 2·tp/(2·tp+fp+fn), the harmonic-mean identity that avoids
    * composing p and r in floating point — so no IEEE tree ever has
    * more than one rounding. Zero denominators → NULL (the honest
    * "no predictions for this class" row). Plan shape: ONE
    * `groupBy(t, pr)` pass collapses the predictions to the
    * O(classes²) confusion matrix first; the labels cross join then
    * replicates only that tiny relation, never the prediction rows
    * (round-15 verdict item 6 — the corpus-shaped work stays in
    * q83's kNN stage). */
  val q91 = QueryDef("q91_eval_metrics",
    knnVoteCte + """,
      |pp AS (SELECT CAST(e.label AS INTEGER) AS t, CAST(p.pred_label AS INTEGER) AS pr
      |       FROM pred p JOIN embeddings e ON e.vec_id = p.qid),
      |labels AS (SELECT DISTINCT CAST(label AS INTEGER) AS label FROM embeddings),
      |m AS (
      |  SELECT l.label,
      |    CAST(SUM(CASE WHEN t = l.label THEN 1 ELSE 0 END) AS BIGINT) AS support,
      |    CAST(SUM(CASE WHEN t = l.label AND pr = l.label THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |    CAST(SUM(CASE WHEN pr = l.label AND t <> l.label THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |    CAST(SUM(CASE WHEN t = l.label AND pr <> l.label THEN 1 ELSE 0 END) AS BIGINT) AS fn
      |  FROM labels l CROSS JOIN pp GROUP BY 1)
      |SELECT label, support, tp, fp, fn,
      |  CASE WHEN tp + fp > 0
      |       THEN ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) END AS precision,
      |  CASE WHEN tp + fn > 0
      |       THEN ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) END AS recall,
      |  CASE WHEN 2 * tp + fp + fn > 0
      |       THEN ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6) END AS f1
      |FROM m ORDER BY label""".stripMargin) { (s, dir) =>
    import s.implicits._
    val pp = knnPred(s, dir)
      .select($"true_label".cast("int").as("t"), $"pred_label".cast("int").as("pr"))
    val labels = Tables.embeddings(s, dir)
      .select($"label".cast("int").as("label")).distinct()
    // collapse predictions to the O(classes²) confusion matrix in one
    // corpus pass; only this tiny relation is replicated per label
    val cm = pp.groupBy("t", "pr").agg(count(lit(1)).as("cnt"))
    val m = labels.crossJoin(broadcast(cm))
      .groupBy("label")
      .agg(sum(when($"t" === $"label", $"cnt").otherwise(0L)).as("support"),
        sum(when($"t" === $"label" && $"pr" === $"label", $"cnt").otherwise(0L)).as("tp"),
        sum(when($"pr" === $"label" && $"t" =!= $"label", $"cnt").otherwise(0L)).as("fp"),
        sum(when($"t" === $"label" && $"pr" =!= $"label", $"cnt").otherwise(0L)).as("fn"))
    m.select($"label", $"support", $"tp", $"fp", $"fn",
        when($"tp" + $"fp" > 0,
          round($"tp".cast("double") / ($"tp" + $"fp"), 6)).as("precision"),
        when($"tp" + $"fn" > 0,
          round($"tp".cast("double") / ($"tp" + $"fn"), 6)).as("recall"),
        when(lit(2) * $"tp" + $"fp" + $"fn" > 0,
          round((lit(2) * $"tp").cast("double") / (lit(2) * $"tp" + $"fp" + $"fn"), 6)).as("f1"))
      .orderBy("label")
  }

  /** PQ/ADC approximate nearest neighbors (q88): the EMBEDDING-
    * COMPRESSION rung of the ANN ladder ([[graft.ops.Pq]] — Jégou et
    * al. 2011, the Faiss IVFPQ layout). The corpus is encoded ONCE
    * into M=16 one-byte codes per vector (16× smaller than the
    * floats — at 100 TB the artifact that turns an IO-bound vector
    * scan into a cache-resident code scan); queries precompute
    * 16-entry distance tables per subspace and shortlist every
    * vector with 16 table LOOKUPS summed in exact decimal (no float
    * multiply touches the corpus at query time, and no IEEE tree to
    * pin), then rerank the 100-deep shortlist with the exact
    * full-dim L2 — the two-stage deployment every PQ system runs.
    * Deterministic end-to-end, so codebooks→encode→ADC→rerank is
    * hash-checked whole. GraphAnalyticsSpec asserts recall against
    * the exact L2 top-k. Composes with q42e: IVF prunes cells, PQ
    * compresses the vectors inside them. */
  val q88 = QueryDef("q88_similarity_pq_adc", Pq.pqSql(k = 5)) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Pq.pqTopK(emb, emb.filter($"vec_id" % 100 === 0), k = 5)
      .orderBy("qid", "rk")
  }

  /** q88d: PQ/ADC with K-MEANS-trained subspace codebooks (round-17
    * verdict item 7) — the strided seed books refined by fixed
    * exact-arithmetic Lloyd steps per subspace
    * ([[graft.ops.Pq.codebooksIter]]); the whole training loop unrolls
    * into oracle CTEs exactly like q42f's quantizer, so the trained
    * pipeline hash-checks end-to-end. Query-time cost identical to
    * q88. The depth is the DERIVED operating point
    * ([[graft.ops.Pq.LloydIters]] = 2 — the smallest depth whose
    * measured recall clears the ≥0.85 band at both ends of the 1×/10×
    * decade, with qerr descent inside the diminishing-returns knee;
    * the `nprobeFor` discipline applied to the training dial,
    * round-18 verdict item 5). */
  val q88d = QueryDef("q88d_similarity_pq_kmeans",
    Pq.pqKmeansSql(k = 5, iters = Pq.LloydIters)) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Pq.pqTopKKmeans(emb, emb.filter($"vec_id" % 100 === 0), k = 5)
      .orderBy("qid", "rk")
  }

  /** IVFPQ (q88b): the Faiss composition stated as ONE declared
    * hash-checked pipeline — the IVF coarse quantizer (q42d/e's exact
    * machinery, bit-identical oracle prefix) prunes candidates to the
    * query's nprobe/cells slice, ADC scores only the survivors' CODES,
    * the exact rerank finishes. At 100 TB a query batch touches
    * nprobe/cells of 1/16th of the raw bytes; the two index builds are
    * each one corpus pass. The probe width is DERIVED
    * ([[graft.ops.Pq.nprobeFor]]: cells/2 — the measured smallest
    * operating point holding recall ≥ 0.6 across the 1×/10× decade,
    * SCALING.md round 16); [[graft.ops.Pq.ivfpqTopK]] documents the
    * raw-vector-PQ variant choice (q88c is the residual refinement). */
  val q88b = QueryDef("q88b_similarity_ivfpq", Pq.ivfpqSql(k = 5)) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Pq.ivfpqTopK(emb, emb.filter($"vec_id" % 100 === 0), k = 5)
      .orderBy("qid", "rk")
  }

  /** IVFPQ with RESIDUAL encoding (q88c) — the Faiss refinement the
    * raw-vector q88b deliberately skipped (round-16 verdict "missing"
    * item 2): PQ codes describe x − μ(cell) instead of x, so the 16
    * codes per subspace spend their precision on within-cell detail
    * rather than re-describing the coarse structure the cell id
    * already encodes; the query's ADC tables are rebuilt per probed
    * cell from q − μ(cell). (q−μ)−(x−μ) = q−x keeps ADC comparable
    * across cells. μ is decimal-sums/exact-count (one IEEE division
    * per dim) and every residual component is one IEEE subtraction, so
    * the WHOLE refinement stays hash-checked
    * ([[graft.ops.Pq.ivfpqResidualSql]]). Measured ADC-fidelity gain
    * vs q88b in SCALING.md round 16. */
  val q88c = QueryDef("q88c_similarity_ivfpq_residual",
    Pq.ivfpqResidualSql(k = 5)) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Pq.ivfpqResidualTopK(emb, emb.filter($"vec_id" % 100 === 0), k = 5)
      .orderBy("qid", "rk")
  }

  /** Content-defined chunking (q92): the rsync/LBFS boundary rule at
    * token granularity — [[graft.ops.TextAnalysis.cdcChunks]]
    * documents why fixed-size chunking breaks chunk-level dedup on
    * edit (every downstream boundary shifts) and CDC does not (the
    * spec pins edit locality). Divisor 16 → expected ~16-token
    * chunks; the per-token hash is the engine-portable modular
    * Horner fold, so every boundary — and thus every chunk extent —
    * hash-checks. */
  val q92 = QueryDef("q92_cdc_chunking",
    """WITH toks0 AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      |  FROM documents),
      |t0 AS (SELECT doc_id, CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
      |         unnest(toks) AS token
      |       FROM toks0),
      |t AS (SELECT doc_id, pos, token FROM t0 WHERE token <> ''),
      |b AS (SELECT doc_id, pos,
      |        CASE WHEN list_reduce([CAST(7 AS BIGINT)] ||
      |          list_transform(list_filter(string_split(token, ''), c -> c <> ''),
      |            c -> CAST(ascii(c) AS BIGINT)),
      |          (a, x) -> (a * 31 + x) % 1000000007) % 16 = 0
      |        THEN 1 ELSE 0 END AS bnd
      |      FROM t),
      |c AS (SELECT doc_id, pos,
      |        1 + COALESCE(SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk
      |      FROM b)
      |SELECT doc_id, CAST(chunk AS BIGINT) AS chunk,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(MIN(pos) AS BIGINT) AS start_pos,
      |  CAST(MAX(pos) AS BIGINT) AS end_pos
      |FROM c GROUP BY 1, 2 ORDER BY doc_id, chunk""".stripMargin) { (s, dir) =>
    TextAnalysis.cdcChunks(Tables.documents(s, dir), "doc_id", "text", 16)
      .orderBy("doc_id", "chunk")
  }

  /** Sparse TF-IDF "more like this" (q81): top-5 nearest documents
    * per query doc via an inverted-index join — the third similarity
    * shape beside dense LSH (q42b) and IVF (q42d/e), and the one that
    * needs NO embeddings: candidate pairs exist only through shared
    * terms, partial dot products combine map-side, and the whole
    * pipeline is exact INT64 micro-unit arithmetic up to one final
    * IEEE division (round 16: was decimal(18,6) — the micro-unit
    * weights cut the sf0.1 wall 5.9→3.7 s at identical 6-dp weight
    * rounding; [[graft.ops.TextAnalysis.moreLikeThis]] documents the
    * plan, the overflow bound, and the df-ceiling that bounds
    * hot-term fan-out at web scale). Ranks order by the ROUNDED score
    * (q43g's discipline). */
  val q81 = QueryDef("q81_tfidf_more_like_this",
    """WITH toks AS (
      |  SELECT doc_id AS doc, unnest(string_split_regex(lower(text), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc, term, CAST(COUNT(*) AS BIGINT) AS tf
      |       FROM toks WHERE term <> '' GROUP BY 1, 2),
      |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
      |w AS (SELECT tf.doc, tf.term,
      |        CAST(ROUND(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) * 1000000.0)
      |             AS BIGINT) AS w
      |      FROM tf JOIN df USING (term) CROSS JOIN n),
      |norms AS (SELECT doc, CAST(SUM(w * w) AS BIGINT) AS nsq FROM w GROUP BY 1),
      |q AS (SELECT doc AS qid, term, w AS wq FROM w WHERE doc % 100 = 0),
      |pairs AS (SELECT q.qid, d.doc AS did, CAST(SUM(q.wq * d.w) AS BIGINT) AS dot
      |          FROM q JOIN w d USING (term) WHERE d.doc <> q.qid
      |          GROUP BY 1, 2),
      |scored AS (SELECT p.qid, p.did,
      |             ROUND(CAST(p.dot AS DOUBLE) /
      |               sqrt(CAST(nq.nsq AS DOUBLE) * CAST(nd.nsq AS DOUBLE)), 6) AS score
      |           FROM pairs p JOIN norms nq ON nq.doc = p.qid
      |                        JOIN norms nd ON nd.doc = p.did)
      |SELECT qid, did, CAST(rk AS BIGINT) AS rk, score FROM (
      |  SELECT qid, did, score, ROW_NUMBER() OVER (
      |    PARTITION BY qid ORDER BY score DESC, did) AS rk
      |  FROM scored) WHERE rk <= 5
      |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
    // NO janitor registration here (unlike q41b): q81 is a SQL dual
    // pair, and SqlDualEntrySpec legitimately executes one invocation's
    // result several times — the janitor's single-consumption contract
    // would kill the staged w blocks after the first count. The staged
    // relations are MB-scale; the ContextCleaner's GC path reclaims
    // them promptly enough.
    TextAnalysis.moreLikeThis(Tables.documents(s, dir), "doc_id", "text", k = 5)
      .orderBy("qid", "rk")
  }

  /** Incremental cross-corpus NEAR-dup (q41k): the fuzzy twin of
    * q41h — a freshly-ingested batch (deterministic derivation:
    * 'copy '-prefixed near-copies of every doc_id%10=3 corpus doc,
    * vowel-swapped genuinely-new text for doc_id%10=4) is tested for
    * n-gram Jaccard similarity against the EXISTING corpus, one
    * verdict per batch doc. [[graft.ops.Dedup.incrementalNearDup]]
    * carries the two-sided blocking topology; the oracle restates the
    * identical relational program over the same derivations. The
    * prefix-copies must match (they keep every original bigram), the
    * vowel-swapped docs must not (most bigrams change). */
  private val q41kSql =
    """WITH exdocs AS (SELECT doc_id AS doc, text FROM documents),
      |badocs AS (
      |  SELECT doc_id + 2000000 AS doc, 'copy ' || text AS text
      |  FROM documents WHERE doc_id % 10 = 3
      |  UNION ALL
      |  SELECT doc_id + 3000000 AS doc, translate(text, 'aeiou', 'xyzwv') AS text
      |  FROM documents WHERE doc_id % 10 = 4),
      |tE AS (SELECT doc, string_split_regex(lower(text), '\s+') AS l FROM exdocs),
      |tB AS (SELECT doc, string_split_regex(lower(text), '\s+') AS l FROM badocs),
      |shE AS (SELECT DISTINCT doc,
      |    UNNEST(list_transform(generate_series(1, len(l) - 1),
      |      i -> l[i] || ' ' || l[i + 1])) AS shingle FROM tE),
      |shB AS (SELECT DISTINCT doc,
      |    UNNEST(list_transform(generate_series(1, len(l) - 1),
      |      i -> l[i] || ' ' || l[i + 1])) AS shingle FROM tB),
      |df AS (SELECT shingle, COUNT(*) AS c FROM (
      |    SELECT doc, shingle FROM shE UNION ALL SELECT doc, shingle FROM shB) u
      |  GROUP BY 1),
      |rare AS (SELECT shingle FROM df WHERE c <= 20),
      |cand1 AS (SELECT DISTINCT b.doc AS da, e.doc AS db
      |          FROM shB b JOIN rare USING (shingle)
      |          JOIN shE e USING (shingle)),
      |hot AS (SELECT doc FROM shB EXCEPT SELECT da FROM cand1),
      |fb AS (SELECT doc, shingle FROM (
      |    SELECT b.doc, b.shingle,
      |      ROW_NUMBER() OVER (PARTITION BY b.doc
      |        ORDER BY df.c, b.shingle) AS rk
      |    FROM shB b JOIN hot USING (doc) JOIN df USING (shingle)) t
      |  WHERE rk <= 4),
      |cand2 AS (SELECT DISTINCT f.doc AS da, e.doc AS db
      |          FROM fb f JOIN shE e USING (shingle)),
      |cand AS (SELECT da, db FROM cand1 UNION SELECT da, db FROM cand2),
      |sizesB AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM shB GROUP BY doc),
      |sizesE AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM shE GROUP BY doc),
      |common AS (SELECT c.da, c.db, CAST(COUNT(*) AS BIGINT) AS cm
      |           FROM cand c
      |           JOIN shB s1 ON s1.doc = c.da
      |           JOIN shE s2 ON s2.doc = c.db AND s2.shingle = s1.shingle
      |           GROUP BY 1, 2),
      |pairs AS (SELECT da, CAST(cm AS DOUBLE) / (na.n + nb.n - cm) AS j
      |          FROM common
      |          JOIN sizesB na ON na.doc = da JOIN sizesE nb ON nb.doc = db
      |          WHERE CAST(cm AS DOUBLE) / (na.n + nb.n - cm) >= 0.2),
      |verd AS (SELECT da, CAST(COUNT(*) AS BIGINT) AS n_matches,
      |                ROUND(MAX(j), 6) AS best_jaccard
      |         FROM pairs GROUP BY 1)
      |SELECT b.doc AS batch_id,
      |  CAST(CASE WHEN v.da IS NULL THEN 0 ELSE 1 END AS BIGINT) AS matched,
      |  COALESCE(v.n_matches, 0) AS n_matches,
      |  COALESCE(v.best_jaccard, 0.0) AS best_jaccard
      |FROM badocs b LEFT JOIN verd v ON v.da = b.doc
      |ORDER BY batch_id""".stripMargin

  /** The q41k/q41l batch: prefix-copies of doc_id%10=3 (must match)
    * plus vowel-swapped genuinely-new text for doc_id%10=4 (must not). */
  private[graft] def nearDupBatch(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.filter($"doc_id" % 10 === 3)
      .select(($"doc_id" + 2000000L).as("doc_id"),
        concat(lit("copy "), $"text").as("text"))
      .unionByName(d.filter($"doc_id" % 10 === 4)
        .select(($"doc_id" + 3000000L).as("doc_id"),
          translate($"text", "aeiou", "xyzwv").as("text")))
  }

  /** One round of the cross-corpus near-dup pipeline as DuckDB CTE
    * fragments with every relation suffixed by `sfx`, so [[q41nSql]]
    * can replay the pipeline twice (probe → accept → probe) inside one
    * statement. `corpus`/`batch` name (doc, text) CTEs; the fragment
    * chain ends in `verd$sfx` (da, n_matches, best_jaccard) — the
    * matched batch docs. Body is q41kSql's pipeline verbatim. */
  private def nearDupCtes(sfx: String, corpus: String, batch: String): String =
    s"""tE$sfx AS (SELECT doc, string_split_regex(lower(text), '\\s+') AS l FROM $corpus),
       |tB$sfx AS (SELECT doc, string_split_regex(lower(text), '\\s+') AS l FROM $batch),
       |shE$sfx AS (SELECT DISTINCT doc,
       |    UNNEST(list_transform(generate_series(1, len(l) - 1),
       |      i -> l[i] || ' ' || l[i + 1])) AS shingle FROM tE$sfx),
       |shB$sfx AS (SELECT DISTINCT doc,
       |    UNNEST(list_transform(generate_series(1, len(l) - 1),
       |      i -> l[i] || ' ' || l[i + 1])) AS shingle FROM tB$sfx),
       |df$sfx AS (SELECT shingle, COUNT(*) AS c FROM (
       |    SELECT doc, shingle FROM shE$sfx UNION ALL SELECT doc, shingle FROM shB$sfx) u
       |  GROUP BY 1),
       |rare$sfx AS (SELECT shingle FROM df$sfx WHERE c <= 20),
       |cand1$sfx AS (SELECT DISTINCT b.doc AS da, e.doc AS db
       |          FROM shB$sfx b JOIN rare$sfx USING (shingle)
       |          JOIN shE$sfx e USING (shingle)),
       |hot$sfx AS (SELECT doc FROM shB$sfx EXCEPT SELECT da FROM cand1$sfx),
       |fb$sfx AS (SELECT doc, shingle FROM (
       |    SELECT b.doc, b.shingle,
       |      ROW_NUMBER() OVER (PARTITION BY b.doc
       |        ORDER BY df$sfx.c, b.shingle) AS rk
       |    FROM shB$sfx b JOIN hot$sfx USING (doc) JOIN df$sfx USING (shingle)) t
       |  WHERE rk <= 4),
       |cand2$sfx AS (SELECT DISTINCT f.doc AS da, e.doc AS db
       |          FROM fb$sfx f JOIN shE$sfx e USING (shingle)),
       |cand$sfx AS (SELECT da, db FROM cand1$sfx UNION SELECT da, db FROM cand2$sfx),
       |sizesB$sfx AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM shB$sfx GROUP BY doc),
       |sizesE$sfx AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n FROM shE$sfx GROUP BY doc),
       |common$sfx AS (SELECT c.da, c.db, CAST(COUNT(*) AS BIGINT) AS cm
       |           FROM cand$sfx c
       |           JOIN shB$sfx s1 ON s1.doc = c.da
       |           JOIN shE$sfx s2 ON s2.doc = c.db AND s2.shingle = s1.shingle
       |           GROUP BY 1, 2),
       |pairs$sfx AS (SELECT da, CAST(cm AS DOUBLE) / (na.n + nb.n - cm) AS j
       |          FROM common$sfx
       |          JOIN sizesB$sfx na ON na.doc = da JOIN sizesE$sfx nb ON nb.doc = db
       |          WHERE CAST(cm AS DOUBLE) / (na.n + nb.n - cm) >= 0.2),
       |verd$sfx AS (SELECT da, CAST(COUNT(*) AS BIGINT) AS n_matches,
       |                ROUND(MAX(j), 6) AS best_jaccard
       |         FROM pairs$sfx GROUP BY 1)""".stripMargin

  /** q41n's oracle: the artifact LIFECYCLE replayed in SQL — round 1
    * probes batch1 against the corpus, the unmatched docs are ACCEPTED
    * into it, round 2 probes batch2 against corpus ∪ accepted. Batch2
    * mixes copies of batch1's (typically accepted) translate-variants —
    * matchable only through the delta — with novel re-vowelled docs. */
  private val q41nSql =
    s"""WITH exdocs AS (SELECT doc_id AS doc, text FROM documents),
       |badocs1 AS (
       |  SELECT doc_id + 2000000 AS doc, 'copy ' || text AS text
       |  FROM documents WHERE doc_id % 10 = 3
       |  UNION ALL
       |  SELECT doc_id + 3000000 AS doc, translate(text, 'aeiou', 'xyzwv') AS text
       |  FROM documents WHERE doc_id % 10 = 4),
       |${nearDupCtes("1", "exdocs", "badocs1")},
       |accepted AS (SELECT b.doc, b.text FROM badocs1 b
       |             LEFT JOIN verd1 v ON v.da = b.doc WHERE v.da IS NULL),
       |exdocs2 AS (SELECT doc, text FROM exdocs
       |            UNION ALL SELECT doc, text FROM accepted),
       |badocs2 AS (
       |  SELECT doc_id + 4000000 AS doc,
       |    'copy ' || translate(text, 'aeiou', 'xyzwv') AS text
       |  FROM documents WHERE doc_id % 10 = 4
       |  UNION ALL
       |  SELECT doc_id + 5000000 AS doc, translate(text, 'aeiou', 'uoiea') AS text
       |  FROM documents WHERE doc_id % 10 = 6),
       |${nearDupCtes("2", "exdocs2", "badocs2")}
       |SELECT b.doc AS batch_id,
       |  CAST(CASE WHEN v.da IS NULL THEN 0 ELSE 1 END AS BIGINT) AS matched,
       |  COALESCE(v.n_matches, 0) AS n_matches,
       |  COALESCE(v.best_jaccard, 0.0) AS best_jaccard
       |FROM badocs2 b LEFT JOIN verd2 v ON v.da = b.doc
       |ORDER BY batch_id""".stripMargin

  val q41k = QueryDef("q41k_dedup_incremental_neardup", q41kSql) { (s, dir) =>
    val d = Tables.documents(s, dir).select("doc_id", "text")
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.incrementalNearDup(d, nearDupBatch(s, dir), "doc_id", "text",
        k = 2, maxDf = 20, threshold = 0.2)
        .orderBy("batch_id"))
  }

  /** q41l: q41k's DEPLOYMENT shape (round-17 verdict item 4) — the
    * corpus's hashed-shingle relation and its df rollup come from the
    * build-once [[graft.ops.ShingleIndex]] artifact (memoized per
    * (JVM, dataset) like q42e's IVF index), so the per-batch cost
    * excludes the corpus shingling pass entirely. Same oracle SQL as
    * q41k: the artifact holds exactly the relations the inline build
    * derives, so the verdicts hash-match bit-for-bit. */
  private val shingleScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  val q41l = QueryDef("q41l_dedup_incremental_neardup_indexed",
    q41kSql) { (s, dir) =>
    val scratch = shingleScratch.computeIfAbsent(dir, _ =>
      java.nio.file.Files.createTempDirectory("graft_shingle").toString + "/index")
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val (shE, dfE) = scratch.synchronized {
      graft.ops.ShingleIndex.buildOrLoad(s, d, "doc_id", "text", k = 2, scratch)
    }
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.incrementalNearDupWith(shE, dfE, nearDupBatch(s, dir),
        "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
        .orderBy("batch_id"))
  }

  /** q41m: q41l in the BIG-BATCH regime. q41l's plan is the
    * small-batch shape — the batch's rare-shingle relation broadcasts,
    * so the corpus artifact is scanned once with no shuffle on either
    * probe side. A big batch (TBs of fresh crawl against a 100 TB
    * corpus) has a rare-shingle set far past broadcast size; the probe
    * joins become shuffle joins, and a FLAT corpus artifact then
    * re-shuffles the entire corpus (doc, sh) relation + df rollup on
    * every batch. This entry runs the identical pipeline over the
    * BUCKETED artifact ([[graft.ops.ShingleIndex.saveBucketed]]:
    * the (doc, sh) relation bucketed+sorted by `sh` AND a second copy
    * by `doc` — one per probe key — plus the df rollup by `sh`) with
    * MERGE hints standing in for the too-big-to-broadcast planner
    * state — the sort-merge probes read co-located pre-sorted buckets
    * and only batch-sized relations move (ShingleIndexSpec pins the
    * corpus side exchange-free; ShingleBucketProbe measures the
    * fixed-batch shuffle law at 10× corpus; the q50/q14c bucketing
    * discipline applied to the dedup artifact). Same oracle SQL as
    * q41k — join strategy and at-rest layout change nothing about the
    * verdicts. */
  val q41m = QueryDef("q41m_dedup_incremental_neardup_bucketed",
    q41kSql) { (s, dir) =>
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val (shESh, shEDoc, dfE) = shingleScratch.synchronized {
      graft.ops.ShingleIndex.buildOrLoadBucketed(s, d, "doc_id", "text",
        k = 2, table = graft.ops.ShingleIndex.tableFor("shingle", dir))
    }
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.incrementalNearDupWith(shESh.hint("merge"),
        shEDoc.hint("merge"), dfE.hint("merge"),
        nearDupBatch(s, dir), "doc_id", "text", k = 2, maxDf = 20,
        threshold = 0.2)
        .orderBy("batch_id"))
  }

  /** Batch2 for the q41n lifecycle: copies of batch1's translate-
    * variants (near-dups of docs the corpus holds ONLY through the
    * round-1 append — the rows that prove delta maintenance) plus
    * novel re-vowelled docs as the unmatched control. */
  private def nearDupBatch2(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select("doc_id", "text")
    d.filter($"doc_id" % 10 === 4)
      .select(($"doc_id" + 4000000L).as("doc_id"),
        concat(lit("copy "), translate($"text", "aeiou", "xyzwv")).as("text"))
      .unionByName(d.filter($"doc_id" % 10 === 6)
        .select(($"doc_id" + 5000000L).as("doc_id"),
          translate($"text", "aeiou", "uoiea").as("text")))
  }

  /** q41n: the artifact LIFECYCLE (the claim [[graft.ops.ShingleIndex
    * .append]] implements — "delta maintenance is append-shaped"):
    * build the corpus artifact once, probe batch1 (q41k's batch),
    * APPEND the accepted (unmatched) docs — one shingling pass over
    * the delta plus a rollup-sized merge, zero corpus re-reads — then
    * probe batch2 against the maintained artifact. Batch2's copies of
    * batch1's accepted docs match ONLY through the delta (spec-pinned:
    * the same probe against the pristine artifact misses them). The
    * oracle replays both rounds in one SQL statement ([[q41nSql]]);
    * the returned verdicts are batch2's. */
  /** Build-once-per-(JVM, dataset) scratch with a completion marker —
    * the lifecycle entries' memoization (q41n, q42g): the first caller
    * to win the per-path lock runs `build(scratch)` to completion
    * BEFORE the marker appears, so a crashed partial build re-runs
    * (every writer inside the builds is overwrite-mode up to the final
    * append, which the re-run's overwrite clears) and concurrent
    * callers block on the lock rather than racing the build. */
  private def buildOnceScratch(
      map: java.util.concurrent.ConcurrentHashMap[String, String],
      dir: String, prefix: String)(build: String => Unit): String = {
    val scratch = map.computeIfAbsent(dir, _ =>
      java.nio.file.Files.createTempDirectory(prefix).toString + "/index")
    val marker = java.nio.file.Paths.get(scratch + "_BUILT")
    scratch.synchronized {
      if (!java.nio.file.Files.exists(marker)) {
        build(scratch)
        java.nio.file.Files.createFile(marker)
      }
    }
    scratch
  }

  private val deltaScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  val q41n = QueryDef("q41n_dedup_incremental_neardup_delta",
    q41nSql) { (s, dir) =>
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val scratch = buildOnceScratch(deltaScratch, dir, "graft_shdelta") { p =>
      graft.ops.ShingleIndex.save(d, "doc_id", "text", 2, p)
      val (shE, dfE) = graft.ops.ShingleIndex.load(s, p)
      val b1 = nearDupBatch(s, dir)
      val v1 = Dedup.incrementalNearDupWith(shE, dfE, b1,
        "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
      val accepted = b1.join(
        v1.filter(col("matched") === 0)
          .select(col("batch_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      graft.ops.ShingleIndex.append(s, accepted, "doc_id", "text", 2, p)
      graft.CheckpointJanitor.dropNow(v1)
    }
    val (shE2, dfE2) = graft.ops.ShingleIndex.load(s, scratch)
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.incrementalNearDupWith(shE2, dfE2, nearDupBatch2(s, dir),
        "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
        .orderBy("batch_id"))
  }

  /** q41o: q41n's lifecycle over the BUCKETED artifact — the round-18
    * composition gap closed (q41m's layout is the only one that
    * survives big batches at 100 TB, but could only full-rebuild;
    * q41n's append maintained only the flat layout, and its two
    * relations committed non-atomically). The LSM layout
    * ([[graft.ops.ShingleIndex.saveLsm]]/[[graft.ops.ShingleIndex
    * .appendLsm]]) keeps the corpus (doc, sh) relation as immutable
    * bucketed SEGMENTS — the accept writes one delta-sized segment
    * pair plus a rollup-sized df merge, never touching existing tables
    * — and commits BOTH relations with one atomic pointer swap (the
    * q46 stage-and-swap pattern), so a crash can never leave df behind
    * the shingle rows and a crashed append retries cleanly
    * (LsmShingleSpec pins both). Probes run per segment
    * ([[graft.ops.Dedup.incrementalNearDupSegmented]]) under the same
    * MERGE hints as q41m, so the corpus sides stay exchange-free and
    * the per-batch shuffle law survives the append (ShingleBucketProbe
    * post-append rung). Same oracle as q41n: layout and join strategy
    * change nothing about the verdicts. */
  /** One probe → accept step over a live LSM generation: the verdicts
    * for `batch` plus the accepted (unmatched) docs. This IS the
    * accept rule — hoisted so q41o, q41p and q79b's foreachBatch tick
    * share one definition and the lifecycles cannot silently diverge
    * (the loadLsmHinted discipline applied to the accept side). */
  private def lsmProbeAccept(
      segs: Seq[(DataFrame, DataFrame)], dfE: DataFrame,
      batch: DataFrame): (DataFrame, DataFrame) = {
    val v = Dedup.incrementalNearDupSegmented(segs, dfE, batch,
      "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
    val accepted = batch.join(
      v.filter(col("matched") === 0)
        .select(col("batch_id").as("doc_id")),
      Seq("doc_id"), "left_semi")
    (v, accepted)
  }

  private val lsmScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  val q41o = QueryDef("q41o_dedup_incremental_neardup_lsm",
    q41nSql) { (s, dir) =>
    import graft.ops.ShingleIndex
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val base = ShingleIndex.tableFor("shlsm", dir)
    val scratch = buildOnceScratch(lsmScratch, dir, "graft_shlsm") { p =>
      ShingleIndex.saveLsm(s, d, "doc_id", "text", 2, p, base)
      val (segs1, dfE1) = ShingleIndex.loadLsmHinted(s, p)
      val (v1, accepted) = lsmProbeAccept(segs1, dfE1, nearDupBatch(s, dir))
      ShingleIndex.appendLsm(s, accepted, "doc_id", "text", 2, p, base)
      graft.CheckpointJanitor.dropNow(v1)
    }
    val (segs2, dfE2) = ShingleIndex.loadLsmHinted(s, scratch)
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.incrementalNearDupSegmented(segs2, dfE2, nearDupBatch2(s, dir),
        "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
        .orderBy("batch_id"))
  }

  /** q41p: the LSM lifecycle's COMPACTION step as a first-class entry —
    * q41o's probe → accept, the accepted docs folded in as THREE delta
    * appends (splitting the accept batch drives the artifact to the
    * 4-segment state), and then compaction runs exactly when
    * [[graft.ops.ShingleIndex.shouldCompact]] fires — the DERIVED
    * trigger (S* = 4 from the measured amortization optimum
    * S* = 1 + √(2R/τ); see [[graft.ops.ShingleIndex
    * .CompactAtSegments]] + SCALING.md). The entry REQUIRES the
    * trigger quiet at 3 segments and fired at 4 before compacting, so
    * the derived operating point is pinned by the driver run itself,
    * like q88b's derived nprobe and q88d's derived Lloyd depth.
    * Compaction folds the segments into one behind the same atomic
    * pointer swap, and batch2 probes the COMPACTED generation.
    * Compaction changes the at-rest layout, never the verdicts
    * (LsmShingleSpec pins probe invariance), so the oracle is q41n's
    * text unchanged — the strongest pin that the rewrite loses
    * nothing. */
  private val lsmCompactScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  val q41p = QueryDef("q41p_dedup_incremental_neardup_compacted",
    q41nSql) { (s, dir) =>
    import graft.ops.ShingleIndex
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val base = ShingleIndex.tableFor("shlsmc", dir)
    val scratch = buildOnceScratch(lsmCompactScratch, dir, "graft_shlsmc") { p =>
      ShingleIndex.saveLsm(s, d, "doc_id", "text", 2, p, base)
      val (segs1, dfE1) = ShingleIndex.loadLsmHinted(s, p)
      val (v1, accepted) = lsmProbeAccept(segs1, dfE1, nearDupBatch(s, dir))
      // three delta appends (tens-digit-mod-3 split keeps every slice
      // populated at all SFs) drive the artifact to 4 segments — the
      // derived compaction point; the trigger must stay quiet at 3
      val third = pmod(floor(col("doc_id") / 10), lit(3))
      ShingleIndex.appendLsm(s,
        accepted.filter(third === 0), "doc_id", "text", 2, p, base)
      ShingleIndex.appendLsm(s,
        accepted.filter(third === 1), "doc_id", "text", 2, p, base)
      require(!ShingleIndex.shouldCompact(
          ShingleIndex.currentManifest(s, p).get),
        "the derived trigger must not fire below S* = 4")
      ShingleIndex.appendLsm(s,
        accepted.filter(third === 2), "doc_id", "text", 2, p, base)
      graft.CheckpointJanitor.dropNow(v1)
      val m = ShingleIndex.currentManifest(s, p).get
      require(ShingleIndex.shouldCompact(m),
        s"q41p must compact AT the derived trigger; segments=${m.segments.size}")
      ShingleIndex.compactLsm(s, p, base)
    }
    val (segs2, dfE2) = ShingleIndex.loadLsmHinted(s, scratch)
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.incrementalNearDupSegmented(segs2, dfE2, nearDupBatch2(s, dir),
        "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
        .orderBy("batch_id"))
  }

  /** q79b: the LSM accept lifecycle run CONTINUOUSLY — q41o's
    * probe → accept → append loop driven by Structured Streaming, the
    * crawl-ingest deployment shape at 100 TB (documents arrive forever;
    * the dedup artifact is maintained ONLINE, not rebuilt). Batch1
    * arrives as a multi-file parquet feed with `maxFilesPerTrigger=1`
    * (four micro-batches); each `foreachBatch` tick probes the LIVE
    * generation ([[graft.ops.Dedup.incrementalNearDupSegmented]] under
    * the same MERGE hints as q41o), appends the accepted docs as one
    * delta segment behind the atomic pointer swap, and then runs the
    * DERIVED maintenance rule in-loop: when [[graft.ops.ShingleIndex
    * .shouldCompact]] fires (S* = 4, the measured amortization
    * optimum), compaction folds the generation before the next tick —
    * so the probe tax is bounded by construction for an UNBOUNDED
    * arrival stream, which is the property that makes the lifecycle
    * deployable. With four non-empty accept slices the trigger fires
    * exactly once mid-stream (segments 1→2→3→4 → compact → 1→2;
    * StreamingLsmSpec pins gen 6 / 2 live segments / fired-once).
    * Batch2 then probes the maintained artifact batch-side. Shares
    * q41n's oracle VERBATIM — the replay is ONE batch probe → accept,
    * so the entry pins batch ≡ stream for the whole lifecycle (trigger
    * count must not change the verdicts; batch1's accepted docs are
    * mutually non-dup, so sequential accept converges to the batch
    * accept) on top of q41o's layout-invariance pin. */
  private val lsmStreamScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Test hook: the memoized q79b artifact root for `dir`, once built
    * (StreamingLsmSpec reads the final manifest through it). */
  private[graft] def q79bArtifactRoot(dir: String): Option[String] =
    Option(lsmStreamScratch.get(dir)).filter(p =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(p + "_BUILT")))

  val q79b = QueryDef("q79b_stream_neardup_lsm_accept",
    q41nSql) { (s, dir) =>
    import graft.ops.ShingleIndex
    val d = Tables.documents(s, dir).select("doc_id", "text")
    val base = ShingleIndex.tableFor("shlsms", dir)
    val scratch = buildOnceScratch(lsmStreamScratch, dir, "graft_shlsms") { p =>
      ShingleIndex.saveLsm(s, d, "doc_id", "text", 2, p, base)
      // stage batch1 as FOUR single-file arrivals split on the tens
      // digit (q41p's split idiom — every slice carries accepted docs
      // at all SFs), so maxFilesPerTrigger=1 yields four deterministic
      // micro-batches whatever the source's file ordering.
      // Crash-retry discipline (the buildOnceScratch contract): a
      // re-run just reset the artifact to gen-1 via saveLsm, so the
      // CHECKPOINT of a crashed stream must go too — a survivor would
      // make the restarted stream skip already-committed micro-batches
      // against the fresh artifact and silently drop their accepts
      // (wipeCheckpoint PROVES the deletion); feed files are
      // overwritten in place by the shared stager.
      val ckpt = p + "_ckpt"
      Streaming.wipeCheckpoint(ckpt)
      val feed = p + "_feed"
      Streaming.stageSingleFileSlices(nearDupBatch(s, dir),
        pmod(floor(col("doc_id") / 10), lit(4)), 4, feed)
      val sch = s.read.parquet(feed).schema
      // the stream plans on the dedicated reduced-partition streaming
      // session (stateless here, but ticks stay cheap); the foreachBatch
      // body is plain batch work against the shared persistent catalog
      val ss = Streaming.streamSession(s)
      val q = ss.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(feed)
        .writeStream
        .foreachBatch { (mb: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          val bs = mb.sparkSession
          val (segs, dfE) = ShingleIndex.loadLsmHinted(bs, p)
          val (v, accepted) = lsmProbeAccept(segs, dfE, mb.toDF())
          ShingleIndex.appendLsm(bs, accepted, "doc_id", "text", 2, p, base)
          graft.CheckpointJanitor.dropNow(v)
          if (ShingleIndex.shouldCompact(
              ShingleIndex.currentManifest(bs, p).get))
            ShingleIndex.compactLsm(bs, p, base)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val m = ShingleIndex.currentManifest(s, p).get
      require(!ShingleIndex.shouldCompact(m),
        s"in-loop maintenance must keep the probe tax below S*; " +
          s"segments=${m.segments.size}")
      require(m.gen > 1L,
        "the stream accepted nothing — the feed never reached the artifact")
    }
    val (segs2, dfE2) = ShingleIndex.loadLsmHinted(s, scratch)
    graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.incrementalNearDupSegmented(segs2, dfE2, nearDupBatch2(s, dir),
        "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
        .orderBy("batch_id"))
  }

  /** Corpus-trained unigram-LM quality scoring (q43h): P(w) from one
    * token pass, each doc scored by mean token log-prob + per-token
    * perplexity — the cheap stand-in for an LM quality filter, trained
    * and applied in the same job ([[graft.ops.TextAnalysis
    * .unigramLogProb]] documents the one-pass plan shape). Per-token
    * log-probs are rounded at 6 dp BEFORE the order-independent
    * decimal mean, and ppl is derived from the already-rounded mean —
    * identical IEEE expression trees in both engines. */
  val q43h = QueryDef("q43h_lm_logprob",
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
      |  FROM documents),
      |t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      |tc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM t2 GROUP BY 1),
      |n AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM tc),
      |lp AS (SELECT t2.doc_id,
      |         ROUND(ln(CAST(tc.cnt AS DOUBLE) / n.total), 6) AS lp
      |       FROM t2 JOIN tc USING (term) CROSS JOIN n),
      |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |        ROUND(CAST(SUM(CAST(lp AS DECIMAL(28,6))) AS DOUBLE) / COUNT(lp), 6) AS avg_logp
      |      FROM lp GROUP BY 1)
      |SELECT doc_id, n_tokens, avg_logp, ROUND(exp(-avg_logp), 6) AS ppl
      |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.unigramLogProb(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Bigram-LM perplexity scoring (q43j): q43h's sequence-aware
    * sibling — P(b|a) = (c(a,b)+1)/(c(a)+V) with add-one smoothing,
    * trained and applied in the same job. A doc full of corpus-common
    * WORDS in corpus-unusual ORDER now scores badly, which the
    * unigram model cannot see; this is the standard cheap LM quality
    * filter shape. The per-doc mean is EXACT integer micro-nat
    * arithmetic (no davg: the decimal-sum-over-count quotient lands
    * exactly on a .5×10⁻⁶ ROUND boundary at sf0.1 doc 1705, where the
    * engines' half-handling disagrees — see
    * [[graft.ops.TextAnalysis.bigramLogProb]]); docs with < 2 tokens
    * drop out in both engines. */
  val q43j = QueryDef("q43j_bigram_lm",
    """WITH w AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS w
      |  FROM documents
      |  WHERE len(string_split_regex(trim(lower(text)), '\s+')) >= 2),
      |bg AS (
      |  SELECT doc_id, split_part(p, ' ', 1) AS a, split_part(p, ' ', 2) AS b
      |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
      |          i -> w[i] || ' ' || w[i + 1])) AS p FROM w)),
      |bc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM bg GROUP BY 1, 2),
      |toks AS (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
      |         FROM documents),
      |t2 AS (SELECT t FROM toks WHERE t <> ''),
      |uc AS (SELECT t AS a, CAST(COUNT(*) AS BIGINT) AS ca FROM t2 GROUP BY 1),
      |vocab AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v FROM t2),
      |lp AS (SELECT bg.doc_id,
      |         CAST(ROUND(ln(CAST(bc.cab + 1 AS DOUBLE) / CAST(uc.ca + vocab.v AS DOUBLE))
      |              * 1000000.0) AS BIGINT) AS lpm
      |       FROM bg JOIN bc USING (a, b) JOIN uc USING (a) CROSS JOIN vocab),
      |d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |        -(CAST(((-SUM(lpm)) * 1000) // COUNT(*) AS DOUBLE)) / 1000000000.0 AS avg_logp
      |      FROM lp GROUP BY 1)
      |SELECT doc_id, n_bigrams, avg_logp, ROUND(exp(-avg_logp), 6) AS ppl
      |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.bigramLogProb(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** End-to-end semantic dedup (q41j, the SemDeDup shape): LSH-bucketed
    * cosine near-dup pairs (q42c's machinery, literal splitmix64
    * hyperplanes so the oracle reproduces the buckets bit-exactly) →
    * connected components (q41f's pointer-jumping resolution) → ONE
    * representative kept per semantic cluster (min vec_id), singletons
    * kept by construction. Output is the full per-vector verdict:
    * cluster id, cluster size, kept flag — the artifact a curation
    * pipeline joins back onto the corpus to realize the drop. */
  val q41j = QueryDef("q41j_dedup_semantic",
    s"""WITH RECURSIVE eb AS (${Similarity.bucketedSql("embeddings", 4, 4)}),
       |norms AS (SELECT vec_id, ${Similarity.dotSql("embedding", "embedding")} AS nrm
       |          FROM embeddings),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |         FROM eb a JOIN eb b
       |           ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |pairs AS (
       |  SELECT c.vec_a, c.vec_b
       |  FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.vec_a
       |  JOIN embeddings eb2 ON eb2.vec_id = c.vec_b
       |  JOIN norms na ON na.vec_id = c.vec_a
       |  JOIN norms nb ON nb.vec_id = c.vec_b
       |  WHERE ${Similarity.dotSql("ea.embedding", "eb2.embedding")} / sqrt(na.nrm * nb.nrm) >= 0.35),
       |edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs
       |          UNION SELECT vec_b AS a, vec_a AS b FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b),
       |comp0 AS (SELECT a AS vec, least(a, MIN(b)) AS comp
       |          FROM reach GROUP BY a),
       |comp AS (SELECT e.vec_id AS vec, COALESCE(c.comp, e.vec_id) AS comp
       |         FROM embeddings e LEFT JOIN comp0 c ON c.vec = e.vec_id),
       |sizes AS (SELECT comp, COUNT(*) AS cnt FROM comp GROUP BY comp)
       |SELECT c.vec AS vec_id, c.comp, CAST(s.cnt AS BIGINT) AS comp_size,
       |  CAST(CASE WHEN c.vec = c.comp THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM comp c JOIN sizes s USING (comp)
       |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val pairs = Similarity.cosineNearDupsAuto(emb,
      planesPerTable = 4, tables = 4, threshold = 0.35)
      .select($"vec_a".as("da"), $"vec_b".as("db"))
    val comp0 = graft.CheckpointJanitor.evictAfterConsumption(
      Dedup.nearDupComponents(pairs).select($"doc".as("vec_id"), $"comp"))
    val full = emb.select($"vec_id")
      .join(comp0, Seq("vec_id"), "left_outer")
      .select($"vec_id", coalesce($"comp", $"vec_id").as("comp"))
    val sizes = full.groupBy("comp").agg(count(lit(1)).as("comp_size"))
    full.join(sizes, "comp")
      .select($"vec_id", $"comp", $"comp_size",
        when($"vec_id" === $"comp", 1L).otherwise(0L).as("kept"))
      .orderBy("vec_id")
  }

  /** Boilerplate line stripping (q43i, the C4 rule): lines repeating
    * across more than 10 documents are chrome, not content — strip
    * them by global line frequency, no pattern list. The corpus is
    * documents with deterministic boilerplate injected (a subscribe
    * banner on every 3rd doc, a copyright footer on every 5th), so
    * the expected removals are known by construction;
    * [[graft.ops.TextAnalysis.stripBoilerplate]] carries the one-pass
    * topology. Output: per-doc line counts in/kept + md5 of the
    * cleaned reassembly (identical string → identical hash in both
    * engines). */
  val q43i = QueryDef("q43i_boilerplate_strip",
    """WITH docs2 AS (
      |  SELECT doc_id,
      |    text ||
      |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter today' ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'copyright 2024 example corp all rights reserved' ELSE '' END
      |    AS text
      |  FROM documents),
      |lines AS (
      |  SELECT doc_id,
      |    UNNEST(generate_series(1, len(l))) AS pos,
      |    UNNEST(l) AS line
      |  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM docs2)),
      |freq AS (SELECT line, COUNT(*) AS ldf FROM lines GROUP BY 1),
      |kept AS (SELECT l.doc_id, l.pos, l.line FROM lines l
      |         JOIN freq USING (line) WHERE freq.ldf <= 10),
      |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
      |          md5(string_agg(line, chr(10) ORDER BY pos)) AS clean_hash
      |        FROM kept GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines_in,
      |  COALESCE(a.n_lines_kept, 0) AS n_lines_kept,
      |  COALESCE(a.clean_hash, md5('')) AS clean_hash
      |FROM docs2 d LEFT JOIN agg a USING (doc_id)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val docs2 = Tables.documents(s, dir).select($"doc_id",
      concat($"text",
        when($"doc_id" % 3 === 0,
          concat(lit("\n"), lit("subscribe to our newsletter today")))
          .otherwise(""),
        when($"doc_id" % 5 === 0,
          concat(lit("\n"), lit("copyright 2024 example corp all rights reserved")))
          .otherwise("")).as("text"))
    TextAnalysis.stripBoilerplate(docs2, "doc_id", "text", maxLineDf = 10)
      .orderBy("doc_id")
  }

  /** End-to-end curation pipeline — the composed flow a training-data
    * build actually runs: corpus (with duplicates) → quality filter
    * (score ≥ 0.5, ≥ 5 tokens) → exact dedup (keep min doc id per
    * content hash) → per-language corpus stats. Composes
    * TextAnalysis.qualityScore + Dedup.exactKeeperIds; the oracle
    * restates the identical formulas over the same dup corpus. Every
    * stage is map/agg-shaped: the only shuffles are the (hash, id)
    * dedup decision and the final tiny per-lang aggregate. */
  val q43e = QueryDef("q43e_curation_pipeline",
    s"""WITH base AS (SELECT doc_id, text, lang FROM $dupDocsSql AS dd),
       |m AS (
       |  SELECT doc_id, lang, text,
       |    string_split_regex(lower(text), '\\s+') AS toks,
       |    CAST(length(text) AS DOUBLE) AS nchar,
       |    CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
       |    CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
       |      t -> list_contains(['the','of','and','to','in','is','on','for'], t))) AS DOUBLE) AS stop_hits
       |  FROM base),
       |scored AS (
       |  SELECT doc_id, lang, text,
       |    len(toks) AS n_tokens,
       |    ROUND(least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4 +
       |      (1.0 - punct / greatest(nchar, 1.0)) * 0.3 +
       |      least(stop_hits / greatest(CAST(len(toks) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.3, 6) AS quality
       |  FROM m),
       |kept AS (SELECT * FROM scored WHERE quality >= 0.5 AND n_tokens >= 5),
       |keepers AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
       |curated AS (SELECT k.* FROM kept k JOIN keepers USING (doc_id))
       |SELECT lang, CAST(COUNT(*) AS BIGINT) AS kept,
       |  ROUND(CAST(SUM(CAST(quality AS DECIMAL(28,6))) AS DOUBLE) / COUNT(quality), 6) AS avg_quality,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM curated GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    import s.implicits._
    val d = Tables.documents(s, dir).select("doc_id", "text", "lang")
    val dup = d.unionByName(
      d.filter($"doc_id" % 10 === 0).withColumn("doc_id", $"doc_id" + 1000000))
    val kept = TextAnalysis.qualityScore(dup, "text")
      .filter($"quality" >= 0.5 && $"n_tokens" >= 5)
    val curated = kept.join(Dedup.exactKeeperIds(kept, "doc_id", "text"),
      Seq("doc_id"), "left_semi")
    curated.groupBy("lang").agg(
      count(lit(1)).as("kept"),
      graft.Canon.davg($"quality").as("avg_quality"),
      sum($"n_tokens").cast("long").as("total_tokens"))
      .orderBy("lang")
  }

  /** Multimodal plumbing: binary payload column → typed partition-wise
    * feature extraction (decode stubbed; schema/batching real). */
  val q44 = QueryDef("q44_multimodal_features",
    """SELECT doc_id AS media_id, 'img_' || lang AS kind,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  CAST(64 + octet_length(encode(text)) % 640 AS INTEGER) AS width,
      |  CAST(64 + octet_length(encode(text)) % 480 AS INTEGER) AS height
      |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val media = Multimodal.fromDocuments(s, Tables.documents(s, dir))
    Multimodal.extractFeatures(media).toDF()
      .select("media_id", "kind", "n_bytes", "width", "height")
      .orderBy("media_id")
  }

  /** Multimodal frame-sample + resize: every 10th frame of each media
    * row (stub container arithmetic), aspect-preserving 224 resize —
    * the partition-wise fan-out a video training pipeline runs, with
    * the whole arithmetic mirrored by the oracle. */
  val q44b = QueryDef("q44b_multimodal_frame_sample",
    """SELECT media_id, CAST(f AS INTEGER) AS frame_idx,
      |  CAST(f * 40 AS INTEGER) AS frame_ms,
      |  CAST(CASE WHEN greatest(w, h) > 224 THEN w * 224 // greatest(w, h)
      |       ELSE w END AS INTEGER) AS rw,
      |  CAST(CASE WHEN greatest(w, h) > 224 THEN h * 224 // greatest(w, h)
      |       ELSE h END AS INTEGER) AS rh
      |FROM (
      |  SELECT doc_id AS media_id, 1 + octet_length(encode(text)) % 240 AS nf,
      |    64 + octet_length(encode(text)) % 640 AS w,
      |    64 + octet_length(encode(text)) % 480 AS h
      |  FROM documents), UNNEST(generate_series(0, nf - 1, 10)) AS t(f)
      |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
    import s.implicits._
    val media = Multimodal.fromDocuments(s, Tables.documents(s, dir))
    Multimodal.sampleFrames(media, stride = 10, maxSide = 224).toDF()
      .select("media_id", "frame_idx", "frame_ms", "rw", "rh")
      .orderBy("media_id", "frame_idx")
  }

  /** Multimodal REAL decode: each document carries an actual binary
    * PPM (P6) payload — ASCII header + RGB raster, pixel values a
    * deterministic function of (id, x, y) — and the partition-wise
    * decoder PARSES it back (real header tokenizer + raster walk,
    * [[Multimodal.decodePpm]]), emitting channel sums derived from
    * decoded pixels. The oracle enumerates the same pixels from the
    * same arithmetic. Codec-dependent formats (JPEG/H.264) keep the
    * documented stub (q44/q44b); this query pins the decode plumbing
    * end-to-end on a format a bare JVM can really decode. */
  val q44c = QueryDef("q44c_multimodal_ppm_decode",
    """SELECT doc_id AS media_id,
      |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  CAST(SUM((doc_id + 7 * x + 13 * y) % 256) AS BIGINT) AS r_sum,
      |  CAST(SUM((doc_id * 3 + 5 * x + 11 * y) % 256) AS BIGINT) AS g_sum,
      |  CAST(SUM((doc_id * 5 + 3 * x + 17 * y) % 256) AS BIGINT) AS b_sum
      |FROM (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
      |  UNNEST(generate_series(0, w - 1)) AS xs(x),
      |  UNNEST(generate_series(0, h - 1)) AS ys(y)
      |GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val media = Multimodal.fromDocumentsPpm(s, Tables.documents(s, dir))
    Multimodal.extractPixelFeatures(media).toDF()
      .select("media_id", "width", "height", "r_sum", "g_sum", "b_sum")
      .orderBy("media_id")
  }

  /** Real WAV audio decode (q44d — q44c's audio twin): one
    * deterministic 16-bit stereo PCM WAV per document, decoded by a
    * REAL RIFF chunk-walker (validates RIFF/WAVE, walks fmt →
    * data skipping unknown chunks, checks the PCM layout) into
    * per-channel |sample| sums and the global peak — the
    * loudness/clipping screen an audio curation pipeline runs. The
    * oracle restates the sample formula over generate_series, so
    * header parse + chunk walk + sample fold are all hash-checked
    * ([[graft.ops.Multimodal.decodeWav]]; partition-wise decode is
    * the justified mapPartitions, as q44c). */
  val q44d = QueryDef("q44d_multimodal_wav_decode",
    """SELECT doc_id AS media_id, 8000 AS sample_rate, 2 AS channels,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(SUM(abs(((doc_id * 31 + (2 * f) * 7) % 65536) - 32768)) AS BIGINT) AS l_abs_sum,
      |  CAST(SUM(abs(((doc_id * 31 + (2 * f + 1) * 7) % 65536) - 32768)) AS BIGINT) AS r_abs_sum,
      |  CAST(MAX(GREATEST(abs(((doc_id * 31 + (2 * f) * 7) % 65536) - 32768),
      |                    abs(((doc_id * 31 + (2 * f + 1) * 7) % 65536) - 32768))) AS INTEGER) AS peak
      |FROM (SELECT doc_id, 64 + doc_id % 64 AS nf FROM documents),
      |  UNNEST(generate_series(0, nf - 1)) AS fs(f)
      |GROUP BY doc_id, nf ORDER BY media_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val media = Multimodal.fromDocumentsWav(s, Tables.documents(s, dir))
    Multimodal.extractAudioFeatures(media).toDF()
      .select("media_id", "sample_rate", "channels", "n_frames",
        "l_abs_sum", "r_abs_sum", "peak")
      .orderBy("media_id")
  }

  /** q44e: perceptual-hash IMAGE near-dup — the multimodal twin of
    * q41c, composing the two mature families (round-18 verdict item
    * 4): dHash over [[graft.ops.Multimodal.dHash64]]'s decoded-raster
    * luma grid, then q41c's exact machinery —
    * [[graft.ops.Dedup.simHashNearDups]]' 16-bit-chunk Hamming
    * blocking + bit_count verify. The fixture pairs each
    * doc_id%4==0 image with a variant produced by a REAL binary
    * transform ([[graft.ops.Multimodal.brightenPpm]] — parse, clamp-add
    * +40 to every raster byte, re-emit): brightness shifts cancel in
    * dHash's neighbor comparisons except at clamp sites, so variants
    * land a few bits from their base (matched) while distinct images'
    * quadratic textures give independent hashes (unmatched) — the spec
    * pins both. Every step is integer-exact; the oracle re-derives the
    * sampled-grid lumas from the texture arithmetic and replays
    * hash→block→verify, so the whole pipeline hash-checks like q41c.
    * Scale shape: decode+hash is a pure map (the justified
    * mapPartitions, as q44c); blocking fans out 4 rows/image; verify
    * is candidate-bounded — no pairwise image comparison anywhere. */
  val q44e = QueryDef("q44e_multimodal_phash_neardup",
    """WITH m AS (
      |  SELECT doc_id AS mid, doc_id AS id, 0 AS delta,
      |         16 + doc_id % 17 AS w, 12 + doc_id % 13 AS h FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, 40, 16 + doc_id % 17, 12 + doc_id % 13
      |  FROM documents WHERE doc_id % 4 = 0),
      |g AS (SELECT mid, id, delta, gx, gy,
      |        gx * (w - 1) // 8 AS px, gy * (h - 1) // 7 AS py
      |      FROM m, UNNEST(generate_series(0, 8)) AS t1(gx),
      |              UNNEST(generate_series(0, 7)) AS t2(gy)),
      |lum AS (SELECT mid, gx, gy,
      |    (299 * LEAST(((id + 31 * px + 17 * py) * (id + 31 * px + 17 * py)) % 256 + delta, 255)
      |   + 587 * LEAST(((id * 3 + 29 * px + 19 * py) * (id * 3 + 29 * px + 19 * py)) % 256 + delta, 255)
      |   + 114 * LEAST(((id * 5 + 23 * px + 37 * py) * (id * 5 + 23 * px + 37 * py)) % 256 + delta, 255)) // 1000 AS l
      |  FROM g),
      |bits AS (SELECT a.mid, a.gy * 8 + a.gx AS b,
      |           CASE WHEN a.l < c.l THEN 1 ELSE 0 END AS v
      |         FROM lum a JOIN lum c ON c.mid = a.mid AND c.gy = a.gy
      |           AND c.gx = a.gx + 1
      |         WHERE a.gx < 8),
      |ph AS (SELECT mid, CAST(SUM(CASE WHEN v = 0 THEN 0
      |          WHEN b = 63 THEN CAST(-9223372036854775807 - 1 AS BIGINT)
      |          ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END) AS BIGINT) AS phash
      |       FROM bits GROUP BY mid),
      |chunks AS (SELECT mid, phash, c.chunk,
      |             (phash >> (c.chunk * 16)) & 65535 AS ckey
      |           FROM ph, (SELECT UNNEST([0, 1, 2, 3]) AS chunk) c),
      |cand AS (SELECT DISTINCT a.mid AS doc_a, b.mid AS doc_b,
      |            a.phash AS ha, b.phash AS hb
      |         FROM chunks a JOIN chunks b
      |           ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.mid < b.mid)
      |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS dist
      |FROM cand WHERE bit_count(xor(ha, hb)) <= 12
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    import s.implicits._
    val base = Multimodal.fromDocumentsPpmTextured(s, Tables.documents(s, dir))
    val variants = base.filter(col("media_id") % 4 === 0)
      .map(r => Multimodal.MediaRow(r.media_id + 1000000L, r.kind,
        Multimodal.brightenPpm(r.payload, 40)))
    Dedup.simHashNearDups(
      Multimodal.perceptualHashes(base.unionByName(variants)),
      maxHamming = 12)
      .orderBy("doc_a", "doc_b")
  }

  /** q44f: AUDIO near-dup — the q44e pattern on q44d's decoder,
    * completing the multimodal dedup story (round-19 verdict item 5).
    * [[graft.ops.Multimodal.audioFingerprint64]] folds decoded PCM
    * into a 64-bit per-window energy-sign fingerprint (65 equal frame
    * windows, bit = does energy rise into the next window), then
    * q41c's exact machinery — 16-bit-chunk Hamming blocking +
    * bit_count verify ([[graft.ops.Dedup.simHashNearDups]]). The
    * fixture pairs each doc_id%4==0 stream with a variant produced by
    * a REAL binary transform ([[graft.ops.Multimodal.gainWav]] —
    * chunk-walk, clamp-double every int16 sample, re-emit): gain
    * scales every window energy monotonically so the sign comparisons
    * survive except at the ~0.7% clamp sites, landing variants a few
    * bits from base (matched), while distinct streams' quadratic
    * sample textures give independent energy walks (unmatched) — the
    * spec pins both plus the byte-level transform law. Every step is
    * integer-exact; the oracle re-derives the samples from the
    * texture arithmetic and replays window → sign → pack → block →
    * verify, so the whole pipeline hash-checks like q44e. Scale
    * shape: decode+fingerprint is a pure map (the justified
    * mapPartitions, as q44d); blocking fans out 4 rows/stream; verify
    * is candidate-bounded — no pairwise audio comparison anywhere. */
  val q44f = QueryDef("q44f_multimodal_audio_neardup",
    """WITH m AS (
      |  SELECT doc_id AS mid, doc_id AS id, 1 AS g,
      |         4 + doc_id % 5 AS wlen FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, doc_id, 2, 4 + doc_id % 5
      |  FROM documents WHERE doc_id % 4 = 0),
      |en AS (SELECT mid, j,
      |    SUM(ABS(LEAST(GREATEST(g * (((id * 31 + i * 7) * (id * 31 + i * 7)) % 33000 - 16500),
      |                           -32768), 32767))) AS e
      |  FROM (SELECT mid, id, g, j, 2 * j * wlen + k AS i
      |        FROM m, UNNEST(generate_series(0, 64)) AS t1(j),
      |                UNNEST(generate_series(0, 2 * wlen - 1)) AS t2(k))
      |  GROUP BY mid, j),
      |bits AS (SELECT a.mid, a.j AS b,
      |           CASE WHEN a.e < c.e THEN 1 ELSE 0 END AS v
      |         FROM en a JOIN en c ON c.mid = a.mid AND c.j = a.j + 1
      |         WHERE a.j < 64),
      |ph AS (SELECT mid, CAST(SUM(CASE WHEN v = 0 THEN 0
      |          WHEN b = 63 THEN CAST(-9223372036854775807 - 1 AS BIGINT)
      |          ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END) AS BIGINT) AS phash
      |       FROM bits GROUP BY mid),
      |chunks AS (SELECT mid, phash, c.chunk,
      |             (phash >> (c.chunk * 16)) & 65535 AS ckey
      |           FROM ph, (SELECT UNNEST([0, 1, 2, 3]) AS chunk) c),
      |cand AS (SELECT DISTINCT a.mid AS doc_a, b.mid AS doc_b,
      |            a.phash AS ha, b.phash AS hb
      |         FROM chunks a JOIN chunks b
      |           ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.mid < b.mid)
      |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS dist
      |FROM cand WHERE bit_count(xor(ha, hb)) <= 12
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    import s.implicits._
    val base = Multimodal.fromDocumentsWavTextured(s, Tables.documents(s, dir))
    val variants = base.filter(col("media_id") % 4 === 0)
      .map(r => Multimodal.MediaRow(r.media_id + 1000000L, r.kind,
        Multimodal.gainWav(r.payload, 2)))
    Dedup.simHashNearDups(
      Multimodal.audioFingerprints(base.unionByName(variants)),
      maxHamming = 12)
      .orderBy("doc_a", "doc_b")
  }

  /** q101: the CAPSTONE — one composed end-to-end LLM-corpus pipeline
    * entry (round-19 verdict item 6), every stage an already-oracled
    * operator, the COMPOSITION hash-pinned: ingest a mixed-quality
    * crawl batch (prefix copies, vowel-swapped novels, exact corpus
    * dups, within-batch dups) → model-based quality filter (q98's
    * hashed linear classifier, fused map-only kernel) → within-batch
    * exact dedup (keyed window, no global window) → exact-vs-corpus
    * anti join → near-dup probe against the corpus's LSM shingle
    * artifact (q41o machinery, per-segment bucketed probes) → ACCEPT:
    * the survivors append to the artifact behind its atomic pointer
    * swap (manifest-summary dup guard takes the range-disjoint fast
    * path — batch ids sit above every corpus id) → the curated slice
    * commits via stage-and-swap and reads back with one-step time
    * travel (q80's readCurrent/readPrevious). The declared result is
    * the per-lang audit row a curation run ends with: batch/stage
    * survivor counts, previous vs current corpus size, added chars,
    * and the post-append re-probe (copies of every accepted doc MUST
    * match through the appended segment — the q41n proof that the
    * accept actually landed, here per language). Mutations run once
    * per (JVM, dataset) inside the memoized build (the q41o
    * discipline: a re-run probes read-only artifacts, so the append
    * can never double-fire); the persisted accepted/stats relations
    * make re-runs artifact-reads, not recomputes. The oracle replays
    * the ENTIRE pipeline — quality CTEs, both dedup stages, two
    * near-dup rounds, the rollup delta — in one statement. */
  private val capScratch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def capstoneBatch(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    val d = Tables.documents(s, dir).select("doc_id", "lang", "text")
    d.filter($"doc_id" % 10 === 3)
      .select(($"doc_id" + 2000000L).as("doc_id"), $"lang",
        concat(lit("copy "), $"text").as("text"))
      .unionByName(d.filter($"doc_id" % 10 === 4)
        .select(($"doc_id" + 3000000L).as("doc_id"), $"lang",
          translate($"text", "aeiou", "xyzwv").as("text")))
      .unionByName(d.filter($"doc_id" % 10 === 7)
        .select(($"doc_id" + 6000000L).as("doc_id"), $"lang", $"text"))
      .unionByName(d.filter($"doc_id" % 10 === 4)
        .select(($"doc_id" + 9000000L).as("doc_id"), $"lang",
          translate($"text", "aeiou", "xyzwv").as("text")))
  }
  private val q101Sql: String = {
    val hashDim = graft.ops.Curation.HashDim
    s"""WITH corpus AS (SELECT doc_id AS doc, lang, text FROM documents),
       |batchq AS (
       |  SELECT doc_id + 2000000 AS doc, lang, 'copy ' || text AS text
       |  FROM documents WHERE doc_id % 10 = 3
       |  UNION ALL
       |  SELECT doc_id + 3000000, lang, translate(text, 'aeiou', 'xyzwv')
       |  FROM documents WHERE doc_id % 10 = 4
       |  UNION ALL
       |  SELECT doc_id + 6000000, lang, text
       |  FROM documents WHERE doc_id % 10 = 7
       |  UNION ALL
       |  SELECT doc_id + 9000000, lang, translate(text, 'aeiou', 'xyzwv')
       |  FROM documents WHERE doc_id % 10 = 4),
       |toksq AS (SELECT doc, UNNEST(string_split_regex(lower(text), '\\s+')) AS t
       |          FROM batchq),
       |t2q AS (SELECT doc, t FROM toksq WHERE t <> ''),
       |bhq AS (SELECT doc, ${Dedup.baseHashSql("t")} % $hashDim AS b FROM t2q),
       |contribq AS (SELECT doc, (1664525 * b + 1013904223) % 2001 AS wpos FROM bhq),
       |dq AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |         CAST(SUM(wpos) AS BIGINT) AS sw
       |       FROM contribq GROUP BY 1),
       |qual AS (SELECT doc FROM dq WHERE (sw * 1000) // n_tokens - 1000000 > 0),
       |qdocs AS (SELECT b.doc, b.lang, b.text FROM batchq b JOIN qual USING (doc)),
       |wdocs AS (SELECT doc, lang, text FROM (
       |    SELECT doc, lang, text,
       |      ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc) AS rn
       |    FROM qdocs) WHERE rn = 1),
       |ndocs AS (SELECT w.doc, w.lang, w.text FROM wdocs w
       |          ANTI JOIN corpus c ON c.text = w.text),
       |${nearDupCtes("1", "corpus", "ndocs")},
       |accepted AS (SELECT n.doc, n.lang, n.text FROM ndocs n
       |             LEFT JOIN verd1 v ON v.da = n.doc WHERE v.da IS NULL),
       |curated AS (SELECT doc, lang, text FROM corpus
       |            UNION ALL SELECT doc, lang, text FROM accepted),
       |badocs2 AS (SELECT doc + 1000000 AS doc, lang, 'copy ' || text AS text
       |            FROM accepted),
       |${nearDupCtes("2", "curated", "badocs2")},
       |postm AS (SELECT b.lang, CAST(COUNT(v.da) AS BIGINT) AS post_matched
       |          FROM badocs2 b LEFT JOIN verd2 v ON v.da = b.doc GROUP BY 1),
       |prev AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_previous,
       |           CAST(SUM(length(text)) AS BIGINT) AS chars_prev
       |         FROM corpus GROUP BY 1),
       |cur AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_current,
       |          CAST(SUM(length(text)) AS BIGINT) AS chars_cur
       |        FROM curated GROUP BY 1),
       |sb AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_batch FROM batchq GROUP BY 1),
       |sq AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_quality FROM qdocs GROUP BY 1),
       |sn AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_new FROM ndocs GROUP BY 1),
       |sa AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_accepted FROM accepted GROUP BY 1)
       |SELECT cur.lang,
       |  COALESCE(sb.n_batch, 0) AS n_batch,
       |  COALESCE(sq.n_quality, 0) AS n_quality,
       |  COALESCE(sn.n_new, 0) AS n_new,
       |  COALESCE(sa.n_accepted, 0) AS n_accepted,
       |  prev.n_previous, cur.n_current,
       |  cur.chars_cur - prev.chars_prev AS added_chars,
       |  COALESCE(postm.post_matched, 0) AS post_matched
       |FROM cur JOIN prev USING (lang)
       |LEFT JOIN sb USING (lang) LEFT JOIN sq USING (lang)
       |LEFT JOIN sn USING (lang) LEFT JOIN sa USING (lang)
       |LEFT JOIN postm USING (lang)
       |ORDER BY lang""".stripMargin
  }
  val q101 = QueryDef("q101_corpus_pipeline", q101Sql) { (s, dir) =>
    import graft.ops.ShingleIndex
    import s.implicits._
    val corpus = Tables.documents(s, dir).select("doc_id", "lang", "text")
    val base = ShingleIndex.tableFor("shcap", dir)
    val scratch = buildOnceScratch(capScratch, dir, "graft_cap") { p =>
      val batch = capstoneBatch(s, dir)
      // 1. quality filter (q98's fused hashed-classifier kernel)
      val qdocs = batch.join(
        graft.ops.Curation.hashedLinearScore(batch, "doc_id", "text")
          .filter($"keep").select("doc_id"),
        Seq("doc_id"), "left_semi")
      // 2. within-batch exact dedup — keyed window, never a global one
      val wdocs = qdocs.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy("text").orderBy("doc_id")))
        .filter($"rn" === 1).drop("rn")
      // 3. exact-vs-corpus anti join (the q41a shape across relations)
      val ndocs = wdocs.join(corpus.select("text"), Seq("text"), "left_anti")
        .select("doc_id", "lang", "text")
      // 4. near-dup probe against the corpus LSM artifact
      ShingleIndex.saveLsm(s, corpus.select("doc_id", "text"),
        "doc_id", "text", 2, s"$p/lsm", base)
      val (segs, dfE) = ShingleIndex.loadLsmHinted(s, s"$p/lsm")
      val v1 = Dedup.incrementalNearDupSegmented(segs, dfE,
        ndocs.select("doc_id", "text"), "doc_id", "text",
        k = 2, maxDf = 20, threshold = 0.2)
      ndocs.join(v1.filter($"matched" === 0)
          .select($"batch_id".as("doc_id")), Seq("doc_id"), "left_semi")
        .write.mode("overwrite").parquet(s"$p/accepted")
      graft.CheckpointJanitor.dropNow(v1)
      val acc = s.read.parquet(s"$p/accepted")
      // 5. accept: append behind the atomic pointer swap (the
      // manifest-summary guard takes the range-disjoint fast path)
      ShingleIndex.appendLsm(s, acc.select("doc_id", "text"),
        "doc_id", "text", 2, s"$p/lsm", base)
      // persisted per-lang stage stats — re-runs read, never re-mutate
      def cnt(df: DataFrame, name: String) =
        df.groupBy("lang").agg(count(lit(1)).as(name))
      cnt(batch, "n_batch")
        .join(cnt(qdocs, "n_quality"), Seq("lang"), "full_outer")
        .join(cnt(ndocs, "n_new"), Seq("lang"), "full_outer")
        .join(cnt(acc, "n_accepted"), Seq("lang"), "full_outer")
        .write.mode("overwrite").parquet(s"$p/stats")
      // 6. curated slice: two stage-and-swap refreshes (pre/post
      // accept) make the pipeline's delta time-travel-readable
      def rollup(docs: DataFrame) = docs.groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(length($"text")).as("chars"))
      graft.ops.StagedRefresh.refresh(rollup(corpus), s"$p/curated")
      graft.ops.StagedRefresh.refresh(
        rollup(corpus.unionByName(acc)), s"$p/curated")
    }
    // read-only per run: artifacts + the post-append re-probe
    val acc = s.read.parquet(s"$scratch/accepted")
    val batch2 = acc.select(($"doc_id" + 1000000L).as("doc_id"), $"lang",
      concat(lit("copy "), $"text").as("text"))
    val (segs2, dfE2) = ShingleIndex.loadLsmHinted(s, s"$scratch/lsm")
    val v2 = Dedup.incrementalNearDupSegmented(segs2, dfE2,
      batch2.select("doc_id", "text"), "doc_id", "text",
      k = 2, maxDf = 20, threshold = 0.2)
    val postm = batch2.join(v2.filter($"matched" === 1)
        .select($"batch_id".as("doc_id")), Seq("doc_id"), "left_semi")
      .groupBy("lang").agg(count(lit(1)).as("post_matched"))
    val cur = graft.ops.StagedRefresh.readCurrent(s, s"$scratch/curated")
      .select($"lang", $"n".as("n_current"), $"chars".as("chars_cur"))
    val prev = graft.ops.StagedRefresh.readPrevious(s, s"$scratch/curated")
      .select($"lang", $"n".as("n_previous"), $"chars".as("chars_prev"))
    graft.CheckpointJanitor.evictAfterConsumption(
      cur.join(prev, Seq("lang"))
        .join(s.read.parquet(s"$scratch/stats"), Seq("lang"), "left_outer")
        .join(postm, Seq("lang"), "left_outer")
        .select($"lang",
          coalesce($"n_batch", lit(0L)).as("n_batch"),
          coalesce($"n_quality", lit(0L)).as("n_quality"),
          coalesce($"n_new", lit(0L)).as("n_new"),
          coalesce($"n_accepted", lit(0L)).as("n_accepted"),
          $"n_previous", $"n_current",
          ($"chars_cur" - $"chars_prev").cast("long").as("added_chars"),
          coalesce($"post_matched", lit(0L)).as("post_matched"))
        .orderBy("lang"))
  }

  /** Hard-negative mining (q100): per query, the 3 most-similar
    * WRONG-label vectors — the contrastive-training data op (DPR/
    * SBERT triplet mining; random negatives teach nothing, the
    * near-miss wrong answers are the training signal). Label
    * predicate inside the join, decimal-exact ranking, per-query
    * WindowGroupLimit — [[graft.ops.Similarity.hardNegatives]]. */
  val q100 = QueryDef("q100_hard_negatives",
    """WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % 100 = 0),
      |norms AS (
      |  SELECT vec_id, CAST(list_sum(list_transform(embedding,
      |    x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(23,14)))) AS DOUBLE) AS nrm
      |  FROM embeddings),
      |pairs AS (
      |  SELECT q.vec_id AS qid, CAST(q.label AS INTEGER) AS q_label,
      |    e.vec_id AS vid, CAST(e.label AS INTEGER) AS neg_label,
      |    CAST(list_sum(list_transform(generate_series(1, len(q.embedding)),
      |      i -> CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
      |           AS DECIMAL(23,14)))) AS DOUBLE) AS dot
      |  FROM q, embeddings e
      |  WHERE e.vec_id <> q.vec_id AND e.label <> q.label),
      |scored AS (
      |  SELECT qid, q_label, vid, neg_label, dot / sqrt(nq.nrm * ne.nrm) AS cosine
      |  FROM pairs JOIN norms nq ON nq.vec_id = qid JOIN norms ne ON ne.vec_id = vid),
      |top AS (SELECT qid, q_label, vid, neg_label,
      |    CAST(rk AS INTEGER) AS rk, ROUND(cosine, 6) AS cosine
      |  FROM (SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY qid ORDER BY cosine DESC, vid) AS rk
      |    FROM scored) WHERE rk <= 3)
      |SELECT qid, q_label, vid, neg_label, rk, cosine FROM top
      |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.hardNegatives(emb, emb.filter($"vec_id" % 100 === 0), k = 3)
      .withColumn("rk", $"rk".cast("int"))
      .orderBy("qid", "rk")
  }

  /** IVF-pruned hard-negative mining (q100b): q100's documented scale
    * path made real — the coarse quantizer prunes each query's
    * candidates to its nprobe best cells BEFORE the label predicate
    * and exact scoring, so a mining batch touches ∝ nprobe/cells of
    * the corpus. nprobe = [[graft.ops.Pq.nprobeFor]](cells) — the
    * round-16 derived operating point shared with q88b. Recall vs the
    * exact q100 is bounded by the coarse probe (SimilaritySpec pins
    * the subset law: every q100b negative is reachable and
    * wrong-label; probed-cell misses are the documented trade). */
  val q100b = QueryDef("q100b_hard_negatives_ivf",
    Similarity.hardNegativesIvfSql(cells = 16,
      nprobe = graft.ops.Pq.nprobeFor(16), k = 3)) { (s, dir) =>
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    // round-17 verdict item 3: mine against the PERSISTED q42e index
    // (same cells=16 quantizer) instead of rebuilding it per call —
    // the quantizer build + corpus assignment move off the query path
    val (cents, assigned) = sharedIvfIndex(s, dir, emb)
    Similarity.hardNegativesIvfProbed(cents, assigned, emb,
      emb.filter($"vec_id" % 100 === 0), k = 3,
      nprobe = graft.ops.Pq.nprobeFor(16))
      .withColumn("rk", $"rk".cast("int"))
      .orderBy("qid", "rk")
  }

  /** Exact SUBSTRING dedup (q97, Lee et al. 2022): per-doc duplicated-
    * token coverage by corpus-repeated 8-token grams — the sub-document
    * rung of the dedup ladder (doc-level q41a, near-dup q41d/e, line-
    * level q43i boilerplate; this one catches the shared PARAGRAPH
    * inside otherwise-distinct docs). Candidate grams by portable-hash
    * frequency, exact-string verify (collisions impossible in the
    * verdict), per-doc interval UNION of surviving spans via one
    * window — see [[graft.ops.Dedup.substringDupStats]] for the 100 TB
    * plan shape. The corpus's templated sentences make the natural
    * fixture: ~9% of docs carry a ≥8-token repeated span at sf0.01. */
  val q97 = QueryDef("q97_substring_dedup",
    Dedup.substringDupSql("documents", L = 8)) { (s, dir) =>
    Dedup.substringDupStats(Tables.documents(s, dir), "doc_id", "text", L = 8)
      .orderBy("doc_id")
  }

  /** q97's REALIZATION (q97b): the cleaned corpus itself — duplicated
    * spans stripped, surviving tokens reassembled in order, every
    * input id accounted for (fully-stripped docs stay as empty text).
    * The whole reassembled STRING hash-checks against the oracle —
    * the strongest possible pin on the span arithmetic
    * ([[graft.ops.Dedup.substringStrip]]). */
  val q97b = QueryDef("q97b_substring_strip",
    Dedup.substringStripSql("documents", L = 8)) { (s, dir) =>
    Dedup.substringStrip(Tables.documents(s, dir), "doc_id", "text", L = 8)
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(q41a, q41h, q41i, q41b, q41c, q41d, q41e, q41f, q41g,
    q41j, q41k, q41l, q41m, q41n, q41o, q41p, q79b, q42, q42b, q42c, q42d, q42e, q42f, q42g, q42h, q79c, q74, q43a, q43b, q43c, q43d, q43e, q43f,
    q43g, q43h, q43i, q43j, q44, q44b, q44c, q44d, q44e, q44f, q101, q81, q83, q88, q88b, q88c, q88d,
    q91, q92, q97, q97b, q100, q100b)
}
