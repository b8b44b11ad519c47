package graft

import graft.ops.Curation
import org.apache.spark.sql.functions._

/** Curation ops (q52–q54): decontamination semantics on a hand fixture,
  * redaction behavior on adversarial strings, and the packing
  * invariants (capacity, coverage, contiguity, layout determinism)
  * that the rows-only greedy entry relies on.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ─────────────────────── decontamination ───────────────────────

  private def fixture = Seq(
    // doc 0: the eval doc (0 % 41 == 0)
    (0L, "alpha beta gamma delta epsilon zeta"),
    // shares the 4-gram "beta gamma delta epsilon" (and one more)
    (1L, "x beta gamma delta epsilon zeta y"),
    // shares words but no 4 consecutive ones
    (2L, "alpha beta gamma X delta epsilon zeta"),
    // no overlap at all
    (3L, "one two three four five six"),
    // too short for any 4-gram
    (4L, "alpha beta gamma")
  ).toDF("doc_id", "text")

  test("contaminationScores flags exactly the docs sharing a 4-gram, with the right count") {
    val out = Curation.contaminationScores(fixture, $"doc_id" % 41 === 0, 4)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "beta gamma delta epsilon" and "gamma delta epsilon zeta"
    assert(out == Map(1L -> 2L),
      s"expected only doc 1 with 2 shared grams, got $out")
  }

  test("decontaminated = train docs minus contaminated; eval docs never leak in") {
    val clean = Curation.decontaminated(fixture, $"doc_id" % 41 === 0, 4)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L, 4L))
    // partition of the train set: contaminated ∪ clean, disjoint
    val bad = Curation.contaminationScores(fixture, $"doc_id" % 41 === 0, 4)
      .select("doc_id").as[Long].collect().toSet
    assert((clean & bad).isEmpty && (clean | bad) == Set(1L, 2L, 3L, 4L))
  }

  test("decontamination plan broadcasts the eval-gram side (corpus never shuffles into the join)") {
    val docs = Tables.documents(spark, sf)
    val plan = Curation.contaminationScores(docs, $"doc_id" % 41 === 0, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams not broadcast:\n$plan")
  }

  // ──────────────────────── PII redaction ────────────────────────

  test("repetitionMetrics: hand-computed fractions, keep verdict, single-word guard") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),        // dupw 3/4, bigrams "a a" x3 -> dup2 2/3
      (2L, "a b c d"),        // all distinct -> 0 / 0, keep
      (3L, "z"),              // single word: bigram branch must not eval
      (4L, "x y x y x")       // dupw 3/5; bigrams: x y, y x, x y, y x -> dup2 1/2
    ).toDF("doc_id", "text")
    val m = graft.ops.Curation.repetitionMetrics(docs, "doc_id", "text")
      .as[(Long, Long, Double, Double, Long)].collect().sortBy(_._1)
    assert(m(0) == ((1L, 4L, 0.75, 0.666667, 0L)))
    assert(m(1) == ((2L, 4L, 0.0, 0.0, 1L)))
    assert(m(2) == ((3L, 1L, 0.0, 0.0, 1L)))
    assert(m(3) == ((4L, 5L, 0.6, 0.5, 0L)))
    // map-only: no Exchange anywhere in the metric plan
    val plan = graft.ops.Curation
      .repetitionMetrics(Tables.documents(spark, sf), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition metrics shuffled:\n$plan")
  }

  test("redactPii scrubs emails, phones and long digit runs, leaves clean text alone") {
    val in = Seq(
      "reach me at jane.doe+x@sub.example.co or 555-0199 acct 12345678",
      "no pii here just words 123 and 55-44",
      "a@b.io then 9digits 987654321 end"
    ).toDF("s")
    val out = in.select(Curation.redactPii($"s").as("r")).as[String].collect()
    assert(out(0) == "reach me at <EMAIL> or <PHONE> acct <NUM>")
    assert(out(1) == "no pii here just words 123 and 55-44")
    assert(out(2) == "<EMAIL> then 9digits <NUM> end")
  }

  // ─────────────────────── sequence packing ───────────────────────

  test("packChunks: offsets are the per-shard prefix sum and chunks cover each doc's span") {
    val docs = Tables.documents(spark, sf)
    val rows = Curation.packChunks(docs, "doc_id", "text", 64, 128)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // per (doc) group: chunks are exactly firstChunk..lastChunk of the span
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val (_, _, n, off, _) = rs.head
      val expected = (off / 128) to ((off + n - 1) / 128)
      assert(rs.map(_._5).sorted.toSeq == expected.toSeq,
        s"doc $id span [$off, ${off + n}) → chunks ${rs.map(_._5).toSeq}")
    }
    // per shard: offsets tile the concatenated stream with no gaps
    rows.groupBy(_._2).foreach { case (g, rs) =>
      val docs = rs.groupBy(_._1).map(_._2.head).toSeq.sortBy(_._1)
      docs.foldLeft(0L) { case (expectOff, (_, _, n, off, _)) =>
        assert(off == expectOff, s"shard $g: gap at offset $off != $expectOff")
        expectOff + n
      }
    }
  }

  test("packGreedy: capacity, exactly-once coverage, contiguous packs, layout determinism") {
    val docs = Tables.documents(spark, sf)
    val out = Curation.packGreedy(docs, "doc_id", "text", 64, 128)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._1).distinct.length == out.length, "a doc packed twice")
    assert(out.length == docs.count(), "a doc was dropped")
    out.groupBy(r => (r._2, r._4)).foreach { case ((g, p), rs) =>
      val tot = rs.map(_._3).sum
      assert(tot <= 128 || rs.length == 1,
        s"pack ($g,$p) holds $tot tokens across ${rs.length} docs — over budget")
    }
    // packs are monotone in doc_id within a shard and start at 0
    out.groupBy(_._2).foreach { case (g, rs) =>
      val packs = rs.sortBy(_._1).map(_._4)
      assert(packs.head == 0L, s"shard $g first pack ${packs.head}")
      assert(packs.zip(packs.tail).forall { case (a, b) => b == a || b == a + 1 },
        s"shard $g pack ids not contiguous-monotone")
    }
    // same result under a different input layout
    val out2 = Curation.packGreedy(docs.repartition(7, $"lang"), "doc_id", "text", 64, 128)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq,
      "greedy packing changed with input partitioning")
  }

  test("selectUnderBudget: kept set is the maximal affordable prefix of the quality order") {
    val scored = graft.ops.TextAnalysis
      .qualityScore(Tables.documents(spark, sf), "text")
      .select($"doc_id", $"quality", $"n_tokens".cast("long").as("n_tokens"))
    val rows = scored.as[(Long, Double, Long)].collect()
      .sortBy { case (id, q, _) => (-q, id) }
    val total = rows.map(_._3).sum
    val budget = total / 4
    // driver-side reference: running sum over the total order
    val expected = rows.scanLeft((0L, 0L)) { case ((_, acc), (id, _, n)) =>
      (id, acc + n) }.tail.takeWhile(_._2 <= budget).toMap
    val got = Curation.selectUnderBudget(scored, "doc_id", "quality",
        "n_tokens", budget)
      .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toMap
    assert(got == expected, s"kept set diverged: ${got.size} vs ${expected.size} docs")
    assert(got.nonEmpty && got.values.max <= budget)
    // the NEXT doc in quality order must not have been affordable
    // (maximality — nothing was dropped early)
    val next = rows.drop(expected.size).headOption
    next.foreach { case (_, _, n) =>
      assert(got.values.max + n > budget, "a affordable doc was left out") }
  }

  test("selectUnderBudget: partition-count independent, and edge budgets behave") {
    val scored = graft.ops.TextAnalysis
      .qualityScore(Tables.documents(spark, sf), "text")
      .select($"doc_id", $"quality", $"n_tokens".cast("long").as("n_tokens"))
    val total = scored.agg(sum($"n_tokens")).head().getLong(0)
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def run(): Set[Long] = Curation.selectUnderBudget(scored, "doc_id",
      "quality", "n_tokens", total / 4).select("doc_id").as[Long].collect().toSet
    try {
      spark.conf.set(key, "1")
      val one = run()
      spark.conf.set(key, "13")
      val many = run()
      assert(one == many, "kept set changed with the range partition count")
    } finally spark.conf.set(key, prev)
    // budget 0 keeps nothing; budget >= total keeps everything
    assert(Curation.selectUnderBudget(scored, "doc_id", "quality",
      "n_tokens", 0L).count() == 0)
    assert(Curation.selectUnderBudget(scored, "doc_id", "quality",
      "n_tokens", total).count() == scored.count())
  }

  test("global rank is a permutation consistent with the total order") {
    val d = Tables.documents(spark, sf).select($"doc_id",
      size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
    val n = d.count()
    val ranked = graft.ops.Ranking.globalRank(d, "rk",
      $"n_tokens".desc, $"doc_id".asc).cache()
    assert(ranked.select("rk").distinct().count() == n, "ranks must be unique")
    val mm = ranked.agg(min("rk"), max("rk")).head()
    assert(mm.getLong(0) == 1L && mm.getLong(1) == n, "ranks must be 1..n")
    // rank order must agree with the declared sort everywhere
    val disorder = ranked.as("a").join(ranked.as("b"),
        col("a.rk") === col("b.rk") - 1)
      .filter(col("a.n_tokens") < col("b.n_tokens") ||
        (col("a.n_tokens") === col("b.n_tokens") &&
          col("a.doc_id") > col("b.doc_id")))
    assert(disorder.isEmpty, "adjacent ranks out of sort order")
    ranked.unpersist()
  }

  test("balanced shards: token totals within 5% of each other") {
    val d = Tables.documents(spark, sf).select($"doc_id",
      size(split(trim($"text"), "\\s+")).cast("long").as("n_tokens"))
    val totals = graft.ops.Ranking.balancedShards(d, "n_tokens", "doc_id", 8)
      .groupBy("shard").agg(sum("n_tokens").as("t"))
      .select("t").as[Long].collect()
    assert(totals.length == 8)
    assert(totals.max.toDouble / totals.min <= 1.05,
      s"shard imbalance ${totals.max}/${totals.min}")
  }

  test("percentile rank (q78): [0,1] bounds, extremes, anti-monotone in the score") {
    val out = graft.queries.Curation5x.q78.fn(spark, sf)
      .select("doc_id", "n_chars", "pctl")
      .as[(Long, Long, Double)].collect()
    assert(out.forall { case (_, _, p) => p >= 0.0 && p <= 1.0 })
    val best = out.minBy(r => (-r._2, r._1)) // longest doc, smallest id
    val worst = out.maxBy(r => (-r._2, r._1)) // shortest doc, largest id
    assert(best._3 == 0.0, "the top-quality doc must sit at percentile 0")
    val sorted = out.sortBy(r => (-r._2, r._1)).map(_._3)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
      "pctl must be non-decreasing as quality decreases")
    assert(math.abs(worst._3 - 1.0) < 1e-9)
  }

  test("winsorize (q76): clamp laws — band membership, flag iff outside, ~90% untouched") {
    val out = graft.queries.Curation5x.q76.fn(spark, sf).cache()
    // clamped value always inside the band; equals raw iff unflagged
    assert(out.filter($"clamped" < $"lo" || $"clamped" > $"hi").isEmpty)
    assert(out.filter(($"was_clamped" === 0) =!=
      ($"clamped" === $"n_chars".cast("double"))).isEmpty)
    assert(out.filter(($"was_clamped" === 1) =!=
      ($"n_chars" < $"lo" || $"n_chars" > $"hi")).isEmpty)
    // p05/p95 band ⇒ at most ~10% + interpolation slack clamped
    val n = out.count().toDouble
    val flagged = out.filter($"was_clamped" === 1).count().toDouble
    assert(flagged / n <= 0.12, s"flag rate ${flagged / n} exceeds the p05/p95 band")
    out.unpersist()
  }

  test("curriculum bins (q95): NTILE laws — k bins, ≤1 spread, corpus partitioned, ordered extents") {
    val out = graft.queries.Curation5x.q95.fn(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L), "exactly bins 1..10")
    val pops = out.map(_.getLong(1))
    assert(pops.max - pops.min <= 1, s"NTILE spread must be ≤ 1: ${pops.toSeq}")
    val total = graft.Tables.documents(spark, sf).count()
    assert(pops.sum == total, "bins must partition the corpus")
    // curriculum order: bin i's max length ≤ bin i+1's min length
    val exts = out.map(r => (r.getLong(2), r.getLong(3)))
    exts.zip(exts.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi <= lo2, "length extents must be non-overlapping in bin order")
    }
  }

  // ─────────── hashed linear classifier / DSIR selection ───────────

  test("q98 hashed classifier: fused kernel score equals the hand-computed hashing-trick logit") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = Seq((1L, "hello world"), (2L, "  "), (3L, "one")).toDF("doc_id", "text")
    val out = Curation.hashedLinearScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "logit_micro", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    def wpos(tok: String): Long = {
      val b = graft.functions.TextHashes.portableBase(
        UTF8String.fromString(tok)) % Curation.HashDim
      (1664525L * b + 1013904223L) % 2001L
    }
    def logit(toks: String*): Long =
      toks.map(wpos).sum * 1000L / toks.length - 1000000L
    val l1 = logit("hello", "world")
    val l3 = logit("one")
    // whitespace-only doc 2 contributes no token → dropped entirely
    assert(out == Seq((1L, 2L, l1, l1 > 0), (3L, 1L, l3, l3 > 0)), s"got $out")
  }

  test("q99 DSIR: target-distribution docs outrank off-target docs and fill the kept quarter") {
    // 4 'en' docs made of the target token, 12 off-target docs of a
    // disjoint token: importance = Σ log(p_t/p_r) must rank every en
    // doc above every zh doc, and the kept quarter (⌈16/4⌉ = 4) is
    // exactly the en slice.
    val docs = ((1L to 4L).map(i => (i, "alpha alpha alpha", "en")) ++
      (5L to 16L).map(i => (i, "beta beta beta", "zh")))
      .toDF("doc_id", "text", "lang")
    val out = Curation.dsirSelect(docs, "doc_id", "text", $"lang" === "en")
    val kept = out.filter($"keep").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L), s"kept $kept")
    val worstEn = out.filter($"lang" === "en").agg(max($"rnk")).as[Long].head()
    val bestZh = out.filter($"lang" === "zh").agg(min($"rnk")).as[Long].head()
    assert(worstEn < bestZh, "every target doc must outrank every off-target doc")
    // ranks are a permutation of 1..n (total order, no ties)
    assert(out.select("rnk").as[Long].collect().sorted.toSeq == (1L to 16L))
  }
}
