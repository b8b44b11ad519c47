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

  /** Word-level shingles (distinct), the unit for MinHash / Jaccard:
    * positions 1..n-k+1 (1-based), k consecutive tokens each. */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tokens = split(lower(col(textCol)), "\\s+")
    val shingles = when(size(tokens) >= k,
      transform(sequence(lit(1), size(tokens) - k + 1),
        i => concat_ws(" ", slice(tokens, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol).as("doc"), explode(array_distinct(shingles)).as("shingle"))
      .filter(col("shingle") =!= "")
  }

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
    df.select(col(idCol).as("doc"),
        graft.functions.MinHashSigs(
          split(lower(col(textCol)), "\\s+"), k, numHashes).as("sig"))
      .filter(col("sig").isNotNull)

  /** Map-only SimHash (fused twin of [[simHash]], same packing). */
  def simHashFast(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        graft.functions.SimHash64(
          split(lower(col(textCol)), "\\s+")).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** LSH banding: split the signature into `bands` bands of `rowsPer`
    * values; docs sharing any band-hash become candidates; candidates
    * are verified by estimated Jaccard (fraction of equal minhashes).
    * Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b. */
  def minHashNearDups(sigs: DataFrame, bands: Int, rowsPer: Int,
      threshold: Double): DataFrame = {
    // Materialize the signatures ONCE: the shingle→explode→H-way min
    // pipeline behind `sigs` is the expensive stage, and the LSH
    // self-join below would otherwise re-execute it on BOTH sides
    // (2× compute, worse under AQE re-planning). Eager localCheckpoint
    // (not cache) so the blocks are owned by the RDD and reclaimed by
    // the ContextCleaner when the plan is dropped — a long-lived
    // session never accumulates pinned cache entries. The materialized
    // relation is (doc, sig) — H longs per doc, tiny vs the text.
    val matSigs = sigs.localCheckpoint()
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
    val mat = hashes.localCheckpoint()
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
}
