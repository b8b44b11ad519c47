/*
 * Deterministic corpus sampling for training-data pipelines.
 *
 * Everything here is keyed multiplicative hashing over integer
 * arithmetic — NOT `df.sample()` — for three reasons that matter at
 * 100 TB:
 *
 *  1. REPRODUCIBILITY. `sample()` draws per-partition random streams,
 *     so the selected set changes with partitioning, task retries and
 *     Spark versions. A hash predicate selects the SAME rows on any
 *     cluster layout, any engine — an auditable property when the
 *     sample feeds a training run.
 *  2. NO SHUFFLE, NO DRIVER STATE. The predicate is a scalar
 *     expression inside whole-stage codegen: sampling 100 TB is a
 *     map-only scan, and the same row lands in the same split even
 *     when the pipeline is re-run incrementally on new partitions.
 *  3. ORACLE-CHECKABLE. `(key * 2654435761) % 10000` evaluates
 *     identically in DuckDB, so the driver hash-gate covers the whole
 *     family exactly (unlike RNG sampling, which could only ever be
 *     rows-only).
 *
 * The portable hash is Knuth's multiplicative method (A = 2^32·φ).
 * Stated honestly: `k ↦ (k·A) mod 10000` is a PERMUTATION of the
 * residues, so on sequential surrogate keys this is SYSTEMATIC
 * sampling — every window of 10000 consecutive keys contributes
 * exactly the requested fraction (a feature for balanced splits), but
 * selection correlates with key arithmetic (multiples of small
 * divisors cluster). When statistical independence from key structure
 * matters — keys that encode source/shard/time — use
 * [[Sampler.bernoulliHashed]] (xxhash64, a real PRF; no DuckDB twin →
 * rows-only in the gate, exactness asserted in SamplerSpec).
 * Overflow: |key| ≤ 3.4e9 keeps `key * A` inside Int64 — far beyond
 * any TPC-H orderkey at the scales we run.
 *
 * Reference scope: the reference ETL (walletDataConsumer.py:92-104)
 * materializes full tables only; sampling/splitting is part of the
 * beyond-reference training-pipeline surface (SURVEY.md §2 "beyond
 * §2.2").
 */
package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

object Sampler {

  /** 2^32 · golden-ratio conjugate, the classic Knuth multiplier. */
  val Knuth = 2654435761L

  /** Number of hash buckets = basis points: rates are INTEGER basis
    * points so Spark and the DuckDB oracle compute bit-identical
    * predicates (no float thresholds). */
  val Buckets = 10000L

  /** `(key * Knuth) mod 10000` — the shared sampling coordinate.
    * `pmod` (not `%`) so the semantics stay total if a caller ever
    * passes a signed surrogate key; DuckDB's `%` agrees on the
    * non-negative keys the declared queries use. */
  def bucket(key: Column): Column = pmod(key * lit(Knuth), lit(Buckets))

  /** SQL twin of [[bucket]] for oracle queries. */
  def bucketSql(key: String): String = s"($key * $Knuth) % $Buckets"

  /** Deterministic Bernoulli sample: keep rows whose bucket falls
    * below `rateBp` basis points (1000 = 10%). Map-only — survives any
    * repartitioning and re-runs row-stable. */
  def bernoulli(df: DataFrame, key: Column, rateBp: Int): DataFrame = {
    require(rateBp >= 0 && rateBp <= Buckets, s"rateBp out of range: $rateBp")
    df.filter(bucket(key) < lit(rateBp.toLong))
  }

  /** [[bernoulli]] with xxhash64 instead of the multiplicative
    * permutation: selection is statistically independent of key
    * structure (the production choice when keys encode source, shard
    * or time), still deterministic and layout-stable. xxhash64 has no
    * DuckDB twin, so the declared query (q51d) is rows-only — the
    * fraction band and key-structure independence are asserted in
    * SamplerSpec instead. */
  def bernoulliHashed(df: DataFrame, key: Column, rateBp: Int): DataFrame = {
    require(rateBp >= 0 && rateBp <= Buckets, s"rateBp out of range: $rateBp")
    df.filter(pmod(xxhash64(key), lit(Buckets)) < lit(rateBp.toLong))
  }

  /** Stratified deterministic sample: per-stratum keep rates (basis
    * points) with a default for unlisted strata. The rate lookup is a
    * literal CASE chain — broadcast-free, codegen'd, and exactly
    * mirrored by the oracle's CASE. Use to rebalance a skewed corpus
    * (e.g. downsample a dominant language) without a shuffle. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    (ratesBp.values.toSeq :+ defaultBp).foreach(r =>
      require(r >= 0 && r <= Buckets, s"rateBp out of range: $r"))
    val rate = ratesBp.foldLeft(lit(defaultBp.toLong)) {
      case (acc, (value, bp)) => when(stratum === lit(value), lit(bp.toLong)).otherwise(acc)
    }
    df.filter(bucket(key) < rate)
  }

  /** Deterministic WEIGHTED sample: keep a row with probability
    * `weight / maxWeight` — importance sampling for quality-weighted
    * corpus curation (keep high-quality documents at a higher rate
    * without a second pass). Predicate: `bucket(key) * maxWeight <
    * weight * Buckets`, all-Int64 — so the same exactness/stability
    * properties as [[bernoulli]] hold, and the oracle reproduces it
    * bit-for-bit. `weight` must be integer-valued in [0, maxWeight]
    * (cast upstream; a fractional weight would reintroduce float
    * boundary cases into the keep decision). */
  def weighted(df: DataFrame, key: Column, weight: Column,
      maxWeight: Int): DataFrame = {
    require(maxWeight > 0, s"maxWeight must be positive: $maxWeight")
    df.filter(bucket(key) * lit(maxWeight.toLong) < weight * lit(Buckets))
  }

  /** Deterministic DOMAIN MIXING to target proportions: derive each
    * stratum's keep rate from its OBSERVED count so the kept corpus
    * approaches the target weight mix `weight` (an integer column that
    * is constant within a stratum), at the largest size the data
    * allows. The binding stratum — the one whose availability/weight
    * ratio is smallest — keeps 100%; every other stratum downsamples
    * proportionally:
    *
    *   rate_bp(s) = min over t of (10000 · n_t · w_s) div (w_t · n_s)
    *
    * `floor(min x) = min(floor x)` over the tiny strata×strata cross
    * join keeps the whole derivation in exact Int64 arithmetic — no
    * float argmin, no tie-break ambiguity — so the DuckDB oracle
    * reproduces the rates bit-for-bit (t = s contributes exactly
    * 10000, bounding every rate). Scale shape at 100 TB: one
    * partial-agg shuffle over ~#strata keys, a #strata² literal cross
    * join, then a broadcast join feeding the same map-only bucket
    * predicate as [[bernoulli]] — the corpus itself never shuffles.
    * Returns (rates, mixed): rates = (s, w, n, rate_bp) for
    * reporting, mixed = the filtered rows. */
  def mixToTarget(df: DataFrame, key: Column, stratum: Column,
      weight: Column): (DataFrame, DataFrame) = {
    val counts = df.groupBy(stratum.as("s"))
      .agg(count(lit(1)).as("n"), max(weight).cast("long").as("w"))
    // materialize the ~|strata|-row rate relation ONCE: it feeds both
    // the broadcast filter and any caller-side report join, and without
    // the checkpoint each consumer re-runs the corpus count pass
    // (EXPLAINS round 14 showed 3 hash exchanges over `source` — one
    // per consumer — for what is one tiny aggregate)
    val rates = counts.as("a")
      .crossJoin(counts.select(col("s").as("ts"), col("n").as("tn"),
        col("w").as("tw")))
      .groupBy(col("a.s"), col("a.w"), col("a.n"))
      .agg(min(expr(s"($Buckets * tn * w) div (tw * n)")).as("rate_bp"))
      .transform(graft.Staging.stage)
    val mixed = df.join(broadcast(rates.select(col("s"), col("rate_bp"))),
        stratum === col("s"))
      .filter(bucket(key) < col("rate_bp"))
      .drop("s", "rate_bp")
    (rates, mixed)
  }

  /** Deterministic train/val/test assignment: buckets [0, trainBp) →
    * "train", [trainBp, trainBp+valBp) → "val", rest → "test".
    * Partitions are disjoint and exhaustive BY CONSTRUCTION (one total
    * function of the key), and a row's split never changes as the
    * corpus grows — the property that keeps eval sets uncontaminated
    * across incremental ingests. */
  def assignSplit(df: DataFrame, key: Column,
      trainBp: Int = 8000, valBp: Int = 1000): DataFrame = {
    require(trainBp >= 0 && valBp >= 0 && trainBp + valBp <= Buckets,
      s"split rates out of range: train=$trainBp val=$valBp")
    val b = bucket(key)
    df.withColumn("split",
      when(b < lit(trainBp.toLong), lit("train"))
        .when(b < lit((trainBp + valBp).toLong), lit("val"))
        .otherwise(lit("test")))
  }
}
