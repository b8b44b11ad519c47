package graft.queries

import graft.Tables
import graft.ops.Sampler
import org.apache.spark.sql.functions._

/** q51 family — deterministic sampling & dataset splitting, the
  * curation step between dedup/quality-filtering (q41/q43) and a
  * training run. All three are keyed multiplicative-hash predicates
  * (see [[graft.ops.Sampler]]): row-stable under repartitioning and
  * re-runs, map-only at 100 TB, and exactly oracle-checkable because
  * the hash is plain Int64 arithmetic DuckDB evaluates identically.
  */
object Sampling {

  /** 10% deterministic Bernoulli sample of `orders`. Map-only: the
    * predicate is a codegen'd scalar inside the scan stage — no
    * shuffle, no RNG state (SamplerSpec pins the no-Exchange plan;
    * the orderBy here exists only for oracle determinism). */
  val q51 = QueryDef("q51_sample_bernoulli",
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
       |FROM orders WHERE ${Sampler.bucketSql("o_orderkey")} < 1000
       |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Sampler.bernoulli(Tables.orders(s, dir), col("o_orderkey"), rateBp = 1000)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Stratified rebalance of `documents`: downsample the dominant
    * language ('en', ~44% of the corpus) to 20% while keeping 50% of
    * every other stratum — the standard corpus-rebalancing move before
    * training. Per-stratum rates are a literal CASE chain, so the plan
    * stays a single map-only filter. */
  val q51b = QueryDef("q51b_sample_stratified",
    s"""SELECT doc_id, lang, source
       |FROM documents
       |WHERE ${Sampler.bucketSql("doc_id")} <
       |  CASE WHEN lang = 'en' THEN 2000 ELSE 5000 END
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Sampler.stratified(Tables.documents(s, dir), col("doc_id"), col("lang"),
      ratesBp = Map("en" -> 2000), defaultBp = 5000)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Deterministic 80/10/10 train/val/test split of `documents`,
    * reported as per-(split, lang) counts. The assignment is a total
    * function of doc_id, so splits are disjoint + exhaustive by
    * construction and a document's split never migrates as the corpus
    * grows (no eval-set contamination across incremental ingests).
    * The single hash-aggregate is the only shuffle. */
  val q51c = QueryDef("q51c_split_train_val_test",
    s"""SELECT CASE WHEN b < 8000 THEN 'train'
       |            WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
       |  lang, CAST(COUNT(*) AS BIGINT) AS n
       |FROM (SELECT lang, ${Sampler.bucketSql("doc_id")} AS b FROM documents)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Sampler.assignSplit(Tables.documents(s, dir), col("doc_id"),
      trainBp = 8000, valBp = 1000)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("split", "lang")
  }

  /** xxhash64 Bernoulli sample — the variant whose selection is
    * statistically independent of key structure (the multiplicative
    * permutation in q51 is systematic on sequential keys; see the
    * [[graft.ops.Sampler]] header). xxhash64 has no DuckDB twin →
    * rows-only, with the fraction band and structure-independence
    * pinned in SamplerSpec. */
  val q51d = QueryDef.rowsOnly("q51d_sample_xxhash") { (s, dir) =>
    Sampler.bernoulliHashed(Tables.orders(s, dir), col("o_orderkey"), rateBp = 1000)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Weighted (importance) sample of `lineitem`: keep probability
    * l_quantity/50 — the quality-weighted curation move (weight by a
    * score, sample one pass, no sort). The composite row key
    * (l_orderkey·8 + l_linenumber) is injective because
    * l_linenumber < 8; l_quantity is integral (1..50) so the cast
    * keeps every comparison in exact Int64 on both engines. */
  val q51e = QueryDef("q51e_sample_weighted",
    s"""SELECT l_orderkey, l_linenumber, l_quantity
       |FROM lineitem
       |WHERE ${Sampler.bucketSql("(l_orderkey * 8 + l_linenumber)")} * 50
       |  < CAST(l_quantity AS BIGINT) * 10000
       |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    Sampler.weighted(Tables.lineitem(s, dir),
      key = col("l_orderkey") * lit(8L) + col("l_linenumber"),
      weight = col("l_quantity").cast("long"), maxWeight = 50)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Domain mixing to TARGET proportions (q56): per-source keep rates
    * are DERIVED from the observed counts so the kept corpus hits the
    * target weight mix (weights 1..3 cycling by source number) at the
    * largest size the data allows — the binding source keeps 100%,
    * everything else downsamples proportionally. The whole rate
    * derivation is exact Int64 arithmetic over a #sources² cross join
    * (see [[Sampler.mixToTarget]]), so the oracle reproduces the rates
    * bit-for-bit; the corpus-side work is the same map-only bucket
    * predicate as q51. Output: per-source target weight, derived
    * rate, and kept count. */
  val q56 = QueryDef("q56_mix_to_target",
    s"""WITH c AS (
       |  SELECT source AS s,
       |    CAST(1 + CAST(substr(source, 4) AS BIGINT) % 3 AS BIGINT) AS w,
       |    COUNT(*) AS n
       |  FROM documents GROUP BY 1),
       |r AS (
       |  SELECT a.s, a.w, a.n, MIN((10000 * b.n * a.w) // (b.w * a.n)) AS rate_bp
       |  FROM c a CROSS JOIN c b GROUP BY 1, 2, 3)
       |SELECT d.source, r.w AS target_w, r.rate_bp,
       |  CAST(COUNT(*) AS BIGINT) AS kept
       |FROM documents d JOIN r ON d.source = r.s
       |WHERE ${Sampler.bucketSql("d.doc_id")} < r.rate_bp
       |GROUP BY 1, 2, 3 ORDER BY d.source""".stripMargin) { (s, dir) =>
    val d = Tables.documents(s, dir)
    val weight = expr("1 + CAST(substring(source, 4) AS BIGINT) % 3")
    val (rates, mixed) = Sampler.mixToTarget(d, col("doc_id"), col("source"), weight)
    val kept = mixed.groupBy(col("source")).agg(count(lit(1)).as("kept"))
    rates.select(col("s").as("source"), col("w").as("target_w"), col("rate_bp"))
      .join(kept, "source")
      .orderBy("source")
  }

  /** Fixed-quota stratified sample (q77): exactly min(10, members)
    * docs per (lang, source) stratum — the fixed-SIZE companion of
    * q51b's rate-based stratified sampling (a rate cannot promise "10
    * eval docs per stratum"; a quota can). Selection order inside a
    * stratum is a deterministic PRF rank (md5 of the id — every engine
    * agrees on the hex), so the sample is reproducible and
    * key-structure-independent, the reservoir-sampling equivalent
    * without randomness. Plan shape: one (lang, source) exchange;
    * Spark's WindowGroupLimit rewrites row_number ≤ k into a per-group
    * TOP-K that keeps only 10 rows per stratum ON EACH MAP SIDE before
    * and after the exchange — the stratum never sorts in full, which
    * is exactly what survives a billion-doc stratum (EXPLAINS shows
    * the WindowGroupLimit node). */
  val q77 = QueryDef("q77_stratum_quota_sample",
    """WITH r AS (
      |  SELECT doc_id, lang, source,
      |    ROW_NUMBER() OVER (PARTITION BY lang, source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT doc_id, lang, source, CAST(rk AS BIGINT) AS rk
      |FROM r WHERE rk <= 10 ORDER BY lang, source, rk""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang", "source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    Tables.documents(s, dir).select($"doc_id", $"lang", $"source")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 10)
      .orderBy("lang", "source", "rk")
  }

  /** GROUP-aware train/val/test split (q90): the split key is the
    * USER, not the row — every event of a user lands in the same
    * split. q51c's row-level split is correct for i.i.d. documents
    * but LEAKS for behavioral data: a user's history straddling
    * train and test lets the model memorize the user, inflating eval
    * (the group-leakage failure every ML-ops checklist warns about).
    * Same deterministic bucket machinery as q51c
    * ([[graft.ops.Sampler.assignSplit]]), keyed on user_id — map-only,
    * no shuffle for the assignment itself. The output publishes the
    * audit evidence: per split, the EVENT count and the DISTINCT USER
    * count — the user counts sum to the corpus's distinct-user total
    * precisely because no user straddles (disjointness by
    * construction, and the oracle re-derives it). */
  val q90 = QueryDef("q90_group_split",
    s"""SELECT CASE WHEN b < 8000 THEN 'train'
       |            WHEN b < 9000 THEN 'val' ELSE 'test' END AS split,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       |FROM (SELECT user_id, ${Sampler.bucketSql("user_id")} AS b FROM events)
       |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    Sampler.assignSplit(Tables.events(s, dir), col("user_id"),
      trainBp = 8000, valBp = 1000)
      .groupBy("split")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("split")
  }

  val defs: Seq[QueryDef] = Seq(q51, q51b, q51c, q51d, q51e, q56, q77, q90)
}
