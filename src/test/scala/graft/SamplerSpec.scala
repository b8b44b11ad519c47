package graft

import graft.ops.Sampler
import graft.queries.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling & splitting (q51 family). The properties
  * that make hash sampling the 100 TB answer — row-stability under
  * repartitioning, disjoint+exhaustive splits, map-only plans — are
  * pinned here; value-level exactness is the driver's DuckDB gate.
  */
class SamplerSpec extends SparkSpec {
  import spark.implicits._

  test("bernoulli sample is row-stable under repartitioning") {
    val orders = Tables.orders(spark, sf)
    val a = Sampler.bernoulli(orders, $"o_orderkey", 1000)
      .select("o_orderkey").as[Long].collect().sorted
    val b = Sampler.bernoulli(orders.repartition(13, $"o_custkey"), $"o_orderkey", 1000)
      .select("o_orderkey").as[Long].collect().sorted
    assert(a.nonEmpty, "sample came back empty — rate or hash broken")
    assert(a.toSeq == b.toSeq,
      "selected set changed with partitioning — sampling is not layout-deterministic")
  }

  test("bernoulli sample fraction lands near the requested rate") {
    val orders = Tables.orders(spark, sf)
    val total = orders.count().toDouble
    val kept = Sampler.bernoulli(orders, $"o_orderkey", 1000).count().toDouble
    val frac = kept / total
    assert(frac > 0.05 && frac < 0.15,
      s"10% request yielded ${frac}. multiplicative hash not equidistributing")
  }

  test("xxhash64 sample: rate band, layout determinism, key-structure independence") {
    val orders = Tables.orders(spark, sf)
    val total = orders.count().toDouble
    val a = Sampler.bernoulliHashed(orders, $"o_orderkey", 1000)
      .select("o_orderkey").as[Long].collect().sorted
    val b = Sampler.bernoulliHashed(orders.repartition(7, $"o_custkey"), $"o_orderkey", 1000)
      .select("o_orderkey").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq, "xxhash64 selection changed with partitioning")
    val frac = a.length / total
    assert(frac > 0.05 && frac < 0.15, s"10% request yielded $frac")
    // independence from key arithmetic: the multiplicative permutation
    // picks long runs of a single residue class (e.g. multiples of 7);
    // a PRF must not — no residue class mod 7 may dominate
    val byMod7 = a.groupBy(_ % 7).view.mapValues(_.length).toMap
    assert(byMod7.values.max < a.length / 2,
      s"selection clusters on a residue class: $byMod7")
  }

  test("stratified rates are honored per stratum") {
    val docs = Tables.documents(spark, sf)
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = Sampler.stratified(docs, $"doc_id", $"lang",
        Map("en" -> 2000), defaultBp = 5000)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val enFrac = kept.getOrElse("en", 0L).toDouble / totals("en")
    assert(enFrac > 0.05 && enFrac < 0.40, s"en kept at $enFrac, wanted ~0.20")
    val restKept = (kept - "en").values.sum.toDouble
    val restTotal = (totals - "en").values.sum.toDouble
    val restFrac = restKept / restTotal
    assert(restFrac > 0.30 && restFrac < 0.70, s"non-en kept at $restFrac, wanted ~0.50")
  }

  test("weighted sample keeps rows in proportion to their weight") {
    val li = Tables.lineitem(spark, sf)
    val key = $"l_orderkey" * lit(8L) + $"l_linenumber"
    val kept = Sampler.weighted(li, key, $"l_quantity".cast("long"), maxWeight = 50)
    // overall rate ≈ E[qty]/50 ≈ 0.5
    val frac = kept.count().toDouble / li.count()
    assert(frac > 0.40 && frac < 0.62, s"overall weighted rate $frac, wanted ~0.51")
    // monotone in weight: low-weight stratum kept far less often than high
    def rate(lo: Double, hi: Double): Double = {
      val all = li.filter($"l_quantity" >= lo && $"l_quantity" < hi).count().toDouble
      val k = kept.filter($"l_quantity" >= lo && $"l_quantity" < hi).count().toDouble
      k / all
    }
    val low = rate(1, 11); val high = rate(40, 51)
    assert(low < 0.35 && high > 0.65,
      s"keep rate not proportional to weight: qty<11 → $low, qty≥40 → $high")
    // layout determinism, same as the other samplers
    val a = kept.select($"l_orderkey" * 8 + $"l_linenumber").as[Long].collect().sorted
    val b = Sampler.weighted(li.repartition(11, $"l_suppkey"), key,
        $"l_quantity".cast("long"), maxWeight = 50)
      .select($"l_orderkey" * 8 + $"l_linenumber").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq, "weighted selection changed with partitioning")
  }

  test("train/val/test split is disjoint, exhaustive and growth-stable") {
    val docs = Tables.documents(spark, sf)
    val split = Sampler.assignSplit(docs, $"doc_id")
    // exhaustive: every row got a split; counts add up
    assert(split.filter($"split".isNull).count() == 0)
    assert(split.count() == docs.count())
    assert(split.select("split").distinct().as[String].collect().toSet
      .subsetOf(Set("train", "val", "test")))
    // growth-stable: assignment on a PREFIX of the corpus agrees with
    // assignment on the whole corpus row-for-row (no eval-set
    // contamination when the corpus grows)
    val whole = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    val prefix = Sampler.assignSplit(docs.filter($"doc_id" < 100), $"doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(prefix.forall { case (id, sp) => whole(id) == sp },
      "a document's split changed when the corpus grew")
  }

  test("sampling plans are map-only — no Exchange below the scan") {
    val orders = Tables.orders(spark, sf)
    for (df <- Seq(
        Sampler.bernoulli(orders, $"o_orderkey", 1000),
        Sampler.stratified(Tables.documents(spark, sf), $"doc_id", $"lang",
          Map("en" -> 2000), 5000))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"sampling introduced a shuffle:\n$plan")
    }
  }

  test("mixToTarget: binding stratum keeps 100%, rates match the exact-integer formula, mix approaches target") {
    val docs = Tables.documents(spark, sf)
    val weight = expr("1 + CAST(substring(source, 4) AS BIGINT) % 3")
    val (ratesDf, mixed) = Sampler.mixToTarget(docs, $"doc_id", $"source", weight)
    val rates = ratesDf.select("s", "w", "n", "rate_bp")
      .as[(String, Long, Long, Long)].collect()
    // reference rates computed independently in driver Scala
    val want = rates.map { case (s, w, n, _) =>
      s -> rates.map { case (_, tw, tn, _) => 10000L * tn * w / (tw * n) }.min
    }.toMap
    rates.foreach { case (s, w, n, got) =>
      assert(got == want(s), s"rate for $s: got $got, formula says ${want(s)}")
      assert(got <= 10000L, s"rate for $s exceeds 100%")
    }
    assert(rates.exists(_._4 == 10000L), "no binding stratum kept at 100%")
    // achieved mix: kept_s/w_s should be roughly equal across strata
    // (hash-sampling variance at ~25 docs/stratum is large — 3x band)
    val kept = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    val wMap = rates.map(r => r._1 -> r._2).toMap
    val perUnit = kept.map { case (s, k) => k.toDouble / wMap(s) }
    assert(perUnit.max <= 3.0 * perUnit.min,
      s"kept-per-weight-unit spread too wide: $perUnit")
    // corpus side stays map-only: the only join is a broadcast of the
    // tiny rates relation — no Exchange on the documents branch
    val plan = mixed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates join not broadcast:\n$plan")
  }

  test("declared q51 queries run and return plausible shapes") {
    for (d <- Sampling.defs) {
      val out = d.fn(spark, sf)
      assert(out.count() > 0, s"${d.name} returned no rows at $sf")
    }
  }

  test("q77 quota sample: per-stratum min(10, members), deterministic, rank-limit pushed") {
    val docs = Tables.documents(spark, sf)
    val out = Sampling.q77.fn(spark, sf).cache()
    val kept = out.groupBy("lang", "source").agg(count(lit(1)).as("k"))
    val sizes = docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
    assert(kept.join(sizes, Seq("lang", "source"))
      .filter($"k" =!= least($"n", lit(10L))).isEmpty,
      "each stratum must keep exactly min(10, members)")
    // reproducible: a second run selects the identical ids
    val again = Sampling.q77.fn(spark, sf).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(again == out.select("doc_id").as[Long].collect().sorted.toSeq)
    // the row_number ≤ k filter must become a rank-limit (top-k per
    // stratum on both sides of the exchange), not a full stratum sort
    val plan = Sampling.q77.fn(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank-limit pushdown missing — full stratum sort would not scale:\n$plan")
    out.unpersist()
  }
}
