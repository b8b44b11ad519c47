package graft

import graft.ops.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dedup operator semantics: exact keeps the smallest id; MinHash/LSH
  * and SimHash must surface every true duplicate pair (identical
  * texts → identical signatures → guaranteed candidates). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def dupCorpus = {
    val d = Tables.documents(spark, sf).select("doc_id", "text")
    d.unionByName(d.filter($"doc_id" % 10 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000))
  }

  test("exact dedup keeps the smallest id per text") {
    val out = Dedup.exact(dupCorpus, "doc_id", "text")
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter($"doc_id" >= 1000000).count() == 0) // originals kept
  }

  test("incremental dedup: copies die against the corpus, one v2 per source survives within batch") {
    val d = Tables.documents(spark, sf).select("doc_id", "text")
    val sevenths = d.filter($"doc_id" % 7 === 0)
    val batch = sevenths.withColumn("doc_id", $"doc_id" + 2000000)
      .unionByName(sevenths.select(($"doc_id" + 3000000).as("doc_id"),
        concat($"text", lit(" v2")).as("text")))
      .unionByName(sevenths.select(($"doc_id" + 4000000).as("doc_id"),
        concat($"text", lit(" v2")).as("text")))
    val keep = Dedup.incremental(d, batch, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    val want = sevenths.select(($"doc_id" + 3000000).as("doc_id"))
      .as[Long].collect().sorted.toSeq
    assert(keep == want,
      s"survivors != one v2 per source doc (got ${keep.length}, want ${want.length})")
    // surviving ROWS carry the batch text, not the corpus text
    val rows = Dedup.incremental(d, batch, "doc_id", "text")
    assert(rows.filter(!$"text".endsWith(" v2")).count() == 0)
  }

  test("bloom-prefiltered incremental dedup is bit-identical to the exact operator and actually prefilters") {
    val d = Tables.documents(spark, sf).select("doc_id", "text")
    val sevenths = d.filter($"doc_id" % 7 === 0)
    val batch = sevenths.withColumn("doc_id", $"doc_id" + 2000000)
      .unionByName(sevenths.select(($"doc_id" + 3000000).as("doc_id"),
        concat($"text", lit(" v2")).as("text")))
      .unionByName(sevenths.select(($"doc_id" + 4000000).as("doc_id"),
        concat($"text", lit(" v2")).as("text")))
    val exact = Dedup.incrementalKeepIds(d, batch, "doc_id", "text")
      .as[Long].collect().sorted.toSeq
    val bloomed = Dedup.incrementalKeepIdsBloom(d, batch, "doc_id", "text")
      .as[Long].collect().sorted.toSeq
    assert(bloomed == exact, "bloom path diverged from the exact operator")
    // the prefilter must actually prefilter: the unseen (v2) hashes are
    // 2/3 of the batch; allowing generous false positives, well under
    // half of the batch may reach the exact anti-join
    val bloom = d.select(org.apache.spark.sql.functions.call_function(
      "graft_bloom_agg", xxhash64(md5($"text"))).as("bf")).head().getAs[Array[Byte]]("bf")
    val maybe = batch.select(md5($"text").as("_h"))
      .filter(org.apache.spark.sql.functions.call_function(
        "graft_might_contain", lit(bloom), xxhash64($"_h")))
      .count()
    val total = batch.count()
    assert(maybe < total / 2,
      s"bloom passed $maybe of $total batch rows — not filtering (FPP blowout?)")
  }

  test("bloom-prefiltered incremental dedup: EMPTY corpus falls back to within-batch dedup") {
    // bloom_filter_agg over zero rows is NULL and might_contain(NULL,h)
    // is NULL — without the guard both maybe-branches drop every row
    // and the whole batch silently vanishes (round-14 advice).
    val d = Tables.documents(spark, sf).select("doc_id", "text")
    val empty = d.filter(lit(false))
    val batch = d.limit(5)
      .unionByName(d.limit(5).withColumn("doc_id", $"doc_id" + 2000000))
    val got = Dedup.incrementalKeepIdsBloom(empty, batch, "doc_id", "text")
      .as[Long].collect().sorted.toSeq
    val want = Dedup.incrementalKeepIds(empty, batch, "doc_id", "text")
      .as[Long].collect().sorted.toSeq
    assert(got.nonEmpty, "empty-corpus bloom path discarded the whole batch")
    assert(got == want, "empty-corpus fallback diverged from the exact operator")
  }

  test("minhash LSH finds every identical pair") {
    val sigs = Dedup.minHashSignatures(
      Dedup.wordShingles(dupCorpus, "doc_id", "text", 2), 32)
    val pairs = Dedup.minHashNearDups(sigs, bands = 8, rowsPer = 4, threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = Tables.documents(spark, sf).filter($"doc_id" % 10 === 0)
      .select($"doc_id").as[Long].collect()
      .map(id => (id, id + 1000000)).toSet
    assert(expected.subsetOf(pairs), s"missing: ${expected -- pairs}")
  }

  test("fused minhash/simhash kernels are bit-identical to the composed forms") {
    val composedSigs = Dedup.minHashSignatures(
      Dedup.wordShingles(dupCorpus, "doc_id", "text", 2), 32)
    val fusedSigs = Dedup.minHashSignaturesFast(dupCorpus, "doc_id", "text", 2, 32)
    assert(fusedSigs.exceptAll(composedSigs).isEmpty &&
      composedSigs.exceptAll(fusedSigs).isEmpty,
      "MinHashSigs diverges from minHashSignatures∘wordShingles")
    val composedSim = Dedup.simHash(dupCorpus, "doc_id", "text")
    val fusedSim = Dedup.simHashFast(dupCorpus, "doc_id", "text")
    assert(fusedSim.exceptAll(composedSim).isEmpty &&
      composedSim.exceptAll(fusedSim).isEmpty,
      "SimHash64 diverges from simhash_agg over exploded tokens")
  }

  test("round-16 fused kernels are bit-identical to their composed column forms") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // WordShingles ≡ array_distinct(transform(sequence, i -> concat_ws(slice)))
    val tokens = split(lower($"text"), "\\s+")
    val composedSh = docs.select($"doc_id".as("doc"),
        explode(array_distinct(when(size(tokens) >= 2,
          transform(sequence(lit(1), size(tokens) - 1),
            i => concat_ws(" ", slice(tokens, i, lit(2)))))
          .otherwise(array().cast("array<string>")))).as("shingle"))
      .filter($"shingle" =!= "")
    val fusedSh = Dedup.wordShingles(docs, "doc_id", "text", 2)
    assert(fusedSh.exceptAll(composedSh).isEmpty &&
      composedSh.exceptAll(fusedSh).isEmpty,
      "WordShingles diverges from the composed transform form")
    // PortableHash ≡ the HOF Horner fold (fingerprint)
    val hashes = docs.select($"doc_id",
      graft.functions.PortableHash(lower(trim($"text"))).as("a"),
      graft.ops.TextAnalysis.fingerprint($"text").as("b"))
    assert(hashes.filter($"a" =!= $"b").isEmpty,
      "PortableHash diverges from the HOF fold")
    // BucketWeightSum ≡ explode + per-bucket weight formula sum
    val weights = graft.ops.Curation.lcgWeights()
    val fusedBw = graft.ops.Curation.hashedLinearScore(docs, "doc_id", "text")
      .select($"doc_id", $"n_tokens", $"logit_micro")
    val d = graft.ops.Curation.HashDim
    val composedBw = docs.select($"doc_id",
        explode(array_remove(split(lower($"text"), "\\s+"), "")).as("t"))
      .withColumn("b", graft.functions.PortableHash($"t") % d)
      .withColumn("wpos", (lit(1664525L) * $"b" + 1013904223L) % 2001L)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"wpos").as("sw"))
      .withColumn("logit_micro", expr("(sw * 1000) div n_tokens") - 1000000L)
      .select($"doc_id", $"n_tokens", $"logit_micro")
    assert(fusedBw.exceptAll(composedBw).isEmpty &&
      composedBw.exceptAll(fusedBw).isEmpty,
      "BucketWeightSum diverges from the explode formulation")
  }

  test("portable minhash/simhash: kernels match composed column forms; every true dup found") {
    // composed portable minhash: wordShingles → TWO Horner folds →
    // per-lane (A_i·b1 + C_i·b2) mod p mins — the column-function
    // restatement of MinHashSigsPortable's round-17 two-fold family
    // (mirrors the xxhash64 fused-vs-composed pin)
    val P = 1000000007L
    val th = graft.functions.TextHashes
    // NOT TextAnalysis.fingerprint: that trims+lowers before folding,
    // while the fused kernel (and the DuckDB oracle) fold the shingle
    // VERBATIM — a leading-whitespace shingle would diverge. Both
    // folds here are raw, differing only in seed/multiplier.
    def foldCol(c: Column, seed: Long, mult: Long): Column = aggregate(
      transform(filter(split(c, ""), ch => ch =!= ""), ch => ascii(ch).cast("long")),
      lit(seed), (acc, x) => (acc * mult + x) % P)
    def fold1Col(c: Column): Column = foldCol(c, 7L, 31L)
    def fold2Col(c: Column): Column = foldCol(c, th.Seed2, th.Mult2)
    val sh = Dedup.wordShingles(dupCorpus, "doc_id", "text", 2)
      .withColumn("b1", fold1Col($"shingle"))
      .withColumn("b2", fold2Col($"shingle"))
    val laneMins = (0 until 32).map(i =>
      min((lit(th.mhA(i)) * $"b1" + lit(th.mhC(i)) * $"b2") % P).as(s"m$i"))
    val composed = sh.groupBy("doc").agg(laneMins.head, laneMins.tail: _*)
      .select($"doc", array((0 until 32).map(i => col(s"m$i")): _*).as("sig"))
    val fused = Dedup.minHashSignaturesPortable(dupCorpus, "doc_id", "text", 2, 32)
    assert(fused.exceptAll(composed).isEmpty && composed.exceptAll(fused).isEmpty,
      "MinHashSigsPortable diverges from the composed portable formulation")
    // composed portable simhash: per-token folds, 64 parity votes, pack
    val tok = dupCorpus.select($"doc_id".as("doc"),
        explode(split(lower($"text"), "\\s+")).as("t"))
      .filter($"t" =!= "")
      .withColumn("b1", fold1Col($"t"))
      .withColumn("b2", fold2Col($"t"))
    val voteCols = (0 until 64).map(bb =>
      sum(when(((lit(th.shA(bb)) * $"b1" + lit(th.shC(bb)) * $"b2") % P) % 2 === 1, 1)
        .otherwise(-1)).as(s"v$bb"))
    val packed = tok.groupBy("doc").agg(voteCols.head, voteCols.tail: _*)
      .select($"doc", (0 until 64).map(bb =>
        when(col(s"v$bb") > 0, lit(1L << bb)).otherwise(0L))
        .reduce(_.bitwiseOR(_)).as("simhash"))
    val fusedSim = Dedup.simHashPortable(dupCorpus, "doc_id", "text")
    assert(fusedSim.exceptAll(packed).isEmpty && packed.exceptAll(fusedSim).isEmpty,
      "SimHash64Portable diverges from the composed portable formulation")
    // identical texts → identical signatures → every true pair surfaces
    val pairs = Dedup.minHashNearDupsPortable(fused, bands = 8, rowsPer = 4,
        threshold = 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = Tables.documents(spark, sf).filter($"doc_id" % 10 === 0)
      .select($"doc_id").as[Long].collect().map(id => (id, id + 1000000)).toSet
    assert(expected.subsetOf(pairs), s"missing: ${expected -- pairs}")
    val simPairs = Dedup.simHashNearDups(fusedSim, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(expected.subsetOf(simPairs), s"simhash missing: ${expected -- simPairs}")
  }

  test("ngram jaccard: stopword-heavy fixture — correct pairs, pair-bounded enumeration") {
    // 40 docs ALL sharing a 8-token stopword prefix (7 hot bigrams,
    // df = 40 > maxDf — blocked from candidate generation). Docs 2i and
    // 2i+1 share a pair-private 5-token tail differing in the last
    // token: 11 of 12 bigrams common → jaccard 11/13 ≈ 0.846154.
    val docs = (0 until 40).map { i =>
      val p = i / 2
      val last = if (i % 2 == 0) s"epsilon$p" else s"zeta$p"
      (i.toLong, s"the of and to in is on for alpha$p beta$p gamma$p delta$p $last")
    }.toDF("doc_id", "text")
    val (cand, shc, result) =
      Dedup.ngramJaccardStages(docs, "doc_id", "text", k = 2, maxDf = 20, threshold = 0.2)
    // correctness: exactly the 20 sibling pairs, each at 11/13
    val rows = result.orderBy("da", "db")
      .as[(Long, Long, Double)].collect()
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      (0 until 20).map(p => (2L * p, 2L * p + 1)))
    assert(rows.forall(r => math.abs(r._3 - 11.0 / 13.0) < 1e-5))
    // scale shape: the common-count enumeration must be bounded by
    // Σ_pairs |shingles(da)| + matches — here 20 pairs × 12 shingles
    // + 20 × 11 matches = 460 rows. A hot-shingle self-join of the
    // candidate-doc sliver would emit ≥ 7 × 40·39/2 = 5460 rows for
    // the stopword bigrams alone. Assert the implemented enumeration
    // (same code path: cand ⋈ shc(da) ⋈ shc(db, sh)) stays at the
    // pair-bounded size.
    val enumRows = cand
      .join(shc.as("s1"), $"s1.doc" === $"da")
      .join(shc.as("s2"), $"s2.doc" === $"db" && $"s2.sh" === $"s1.sh")
      .count()
    assert(enumRows == 220, s"pair-bounded enumeration emitted $enumRows rows")
    // and the blocked hot shingles never became candidates
    assert(cand.count() == 20)
  }

  test("scaled edit-distance: subset of block-join pairs, full recall on exact dups") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "n_chars")
    val dup = docs.unionByName(docs.filter($"doc_id" % 10 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000))
    val scaled = Dedup.editDistanceNearDupsScaled(dup,
      "doc_id", "text", "lang", "n_chars")
      .select("da", "db").as[(Long, Long)].collect().toSet
    // the plain (lang, length-bucket) block join — q41e's exact relation
    val plain = Dedup.editDistanceNearDupsBlocked(dup,
        "doc_id", "text", "lang", "n_chars")
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(scaled.subsetOf(plain),
      s"scaled emitted pairs outside the blocked relation: ${(scaled -- plain).take(5)}")
    // Recall on a corpus where rare shingles EXIST per doc (the
    // documented limit of rare-shingle blocking: a doc whose every
    // shingle is hot has no candidate — same tradeoff as q41d): 50
    // distinct-vocabulary docs, each with a same-length 1-char-edit
    // copy. Every pair must be found at distance 1.
    val words = (0 until 2000).map(i => f"w$i%04d")
    val base = (0 until 50).map { i =>
      (i.toLong, (0 until 8).map(j => words(i * 8 + j)).mkString(" "))
    }
    val copies = base.map { case (i, t) =>
      val ws = t.split(" "); ws(3) = "x" + ws(3).drop(1)
      (i + 1000L, ws.mkString(" "))
    }
    val fixture = (base ++ copies).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text"))
    val got = Dedup.editDistanceNearDupsScaled(fixture,
      "doc_id", "text", "lang", "n_chars")
      .as[(Long, Long, Int)].collect().toSet
    val want = (0 until 50).map(i => (i.toLong, i + 1000L, 1)).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("scaled edit-distance: full recall on known-distance 1..20 pairs, all-hot docs included") {
    // Quantifies q41g's near-miss recall (SCALING.md "q41g near-miss
    // recall"). Two doc families:
    //  - VOCAB (the near-miss probe): 60 base docs of 40 doc-unique
    //    words; each copy mutates exactly d = (i mod 20)+1 chars inside
    //    the 60-char prefix (never a word's FIRST char, so the
    //    substitutions are independent and banded levenshtein == d
    //    exactly) plus three tail words — mutations spread through the
    //    whole doc, and the intact remainder still shares rare
    //    (df <= 20) shingles. These pairs must ALL come back, at the
    //    exact distance.
    //  - HOT (round 10's measured miss class, closed in round 11):
    //    stopword-cycle docs whose every bigram is common (df > maxDf
    //    20), so the rare-shingle generator cannot see them. The
    //    sorted-neighborhood secondary generator must recover every
    //    base-copy pair: the copy's single char-1 edit leaves the
    //    REVERSED prefix ordering adjacent, whatever the forward sort
    //    does.
    def mutated(text: String, d: Int): String = {
      val ws = text.split(" ")
      def hit(wi: Int, ci: Int): Unit = {
        val a = ws(wi).toCharArray; a(ci) = if (a(ci) == 'z') 'q' else 'z'
        ws(wi) = new String(a)
      }
      for (wi <- 0 until math.min(d, 10)) hit(wi, 2)   // prefix, 1 char
      for (wi <- 0 until d - 10) hit(wi, 3)            // prefix, 2nd char
      for (wi <- Seq(15, 25, 35)) hit(wi, 2)           // tail spread
      ws.mkString(" ")
    }
    // pseudo-random 5-letter words (hash-derived, deterministic): two
    // DIFFERENT docs' prefixes then differ in ~55 of 60 chars, so no
    // cross-doc pair sneaks under the dist<=20 band (sequential ids
    // like "w1520 w1521" differed from "w1920 w1921" by 1 char/word)
    def word(i: Int, j: Int): String = {
      val h = scala.util.hashing.MurmurHash3.productHash((i, j))
      (0 until 5).map(k => ('a' + ((h >>> (k * 5)) & 31) % 26).toChar).mkString
    }
    val vocabBase = (0 until 60).map { i =>
      (i.toLong, (0 until 40).map(j => word(i, j)).mkString(" "))
    }
    val vocabCopies = vocabBase.map { case (i, t) =>
      (10000L + i, mutated(t, (i % 20).toInt + 1))
    }
    val stops = Seq("the", "of", "and", "to", "in")
    // 3-word length steps keep distinct hot docs in distinct length
    // buckets (>= 10 chars apart), so the miss set is exactly the 25
    // base-copy pairs, not a cloud of phase-shifted cross pairs
    val hotBase = (0 until 25).map { m =>
      (5000L + m, (0 until 30 + 3 * m).map(j => stops((j + m) % 5)).mkString(" "))
    }
    val hotCopies = hotBase.map { case (id, t) =>
      val a = t.toCharArray; a(1) = 'z' // 1-char edit in the first word
      (id + 10000L, new String(a))
    }
    val fixture = (vocabBase ++ vocabCopies ++ hotBase ++ hotCopies)
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text"))
    val got = Dedup.editDistanceNearDupsScaled(fixture,
      "doc_id", "text", "lang", "n_chars")
      .as[(Long, Long, Int)].collect().toSet
    // ground truth: q41e's exact (lang, length-bucket) block join
    val truth = Dedup.editDistanceNearDupsBlocked(fixture,
        "doc_id", "text", "lang", "n_chars")
      .as[(Long, Long, Int)].collect().toSet
    // fixture sanity: every vocab pair is in the block-join truth at
    // its constructed distance
    val vocabWant = (0 until 60).map(i => (i.toLong, 10000L + i, (i % 20) + 1)).toSet
    assert(vocabWant.subsetOf(truth),
      s"fixture broken, truth lacks: ${(vocabWant -- truth).take(5)}")
    // FULL near-miss recall: every known-distance pair recovered, at
    // the exact banded-levenshtein distance
    assert(vocabWant.subsetOf(got),
      s"scaled path missed near-miss pairs: ${(vocabWant -- got).take(5)}")
    // no false positives vs the blocked relation
    assert(got.subsetOf(truth),
      s"pairs outside the blocked relation: ${(got -- truth).take(5)}")
    // round 10's miss class: every hot base-copy pair (the docs whose
    // shingles are ALL common) must now arrive via the sorted-
    // neighborhood generator, at its constructed distance 1
    val hotWant = (0 until 25).map(m => (5000L + m, 15000L + m, 1)).toSet
    assert(hotWant.subsetOf(truth), "fixture broken: hot pairs not in block-join truth")
    assert(hotWant.subsetOf(got),
      s"neighborhood pass missed hot pairs: ${(hotWant -- got).take(5)}")
    val missed = truth -- got
    val recall = (truth.size - missed.size).toDouble / truth.size
    info(f"q41g recall vs block join: $recall%.3f (${truth.size - missed.size}/${truth.size})")
    assert(recall >= 0.9, f"recall floor breached: $recall%.3f")
  }

  test("edit-distance auto-guard picks the exact join at low occupancy, generators above it") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "n_chars")
    // driver scales sit far under the threshold: exact block join runs
    val (outLow, scaledLow) = Dedup.editDistanceNearDupsAutoWithPath(
      docs, "doc_id", "text", "lang", "n_chars")
    assert(!scaledLow, "auto-guard switched to generators at low occupancy")
    val blocked = Dedup.editDistanceNearDupsBlocked(
        docs, "doc_id", "text", "lang", "n_chars")
      .as[(Long, Long, Int)].collect().toSet
    assert(outLow.as[(Long, Long, Int)].collect().toSet == blocked,
      "auto(blocked) diverged from the plain block join")
    // a forced threshold of 0 exercises the scaled branch on the same
    // corpus; its answer must equal the scaled entry point's
    val (outHi, scaledHi) = Dedup.editDistanceNearDupsAutoWithPath(
      docs, "doc_id", "text", "lang", "n_chars", maxPairsPerDoc = 0)
    assert(scaledHi, "threshold 0 must force the scaled branch")
    val scaled = Dedup.editDistanceNearDupsScaled(
        docs, "doc_id", "text", "lang", "n_chars")
      .as[(Long, Long, Int)].collect().toSet
    assert(outHi.as[(Long, Long, Int)].collect().toSet == scaled,
      "auto(scaled) diverged from editDistanceNearDupsScaled")
  }

  test("near-dup components collapse transitive chains to min-id clusters") {
    // chain 1-2-3-4 (diameter 3, exercises multiple propagation
    // rounds), pair 10-11, triangle 20-21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("da", "db")
    val got = Dedup.nearDupComponents(pairs)
      .orderBy("doc").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L)))
  }

  test("near-dup components fail loudly when the iteration budget is exhausted") {
    // a 30-link chain cannot converge in a single star round —
    // partially-converged edges must throw, never flow downstream as
    // silently split components (smallGraphEdges = 0 forces the
    // distributed path; the fast path has no rounds to exhaust)
    val chain = (0 until 30).map(i => (i.toLong, i + 1L)).toDF("da", "db")
    val ex = intercept[IllegalArgumentException] {
      Dedup.nearDupComponents(chain, maxIters = 1, smallGraphEdges = 0)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("a budget ending exactly on the converging round passes") {
    // chain 1-2-3-4: one star round produces the star forest, and the
    // STRUCTURAL convergence check observes it on that same round —
    // maxIters=1 must succeed, not throw spuriously (under hash-to-min
    // this needed a separate confirming round; the star check doesn't).
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("da", "db")
    val got = Dedup.nearDupComponents(chain, maxIters = 1, smallGraphEdges = 0)
      .orderBy("doc").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L)))
  }

  test("near-dup components match a reference union-find on random graphs") {
    for (seed <- Seq(7, 41, 97)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val edges = Seq.fill(50) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(e => e._1 != e._2).distinct
      // reference: classic union-find over the same edges
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        .map(d => (d, find(d.toInt).toLong))
      val got = Dedup.nearDupComponents(edges.toDF("da", "db"))
        .orderBy("doc").select("doc", "comp")
        .as[(Long, Long)].collect().toSeq
      assert(got == expected, s"seed $seed: component mismatch")
    }
  }

  test("star CC needs no more rounds than hash-to-min on chain AND basin fixtures, same answer") {
    // The round-17 verdict's #1 perf item: hash-to-min label
    // propagation crawls basin-shaped giant components (local-minima
    // label forests make pointer jumps no-ops; the global min moves
    // one basin-hop per round — 13 rounds on the sf0.1 SemDeDup
    // graph). The Kiveris large-star/small-star rewrite must win — or
    // at worst tie — on BOTH adversarial topologies.
    //
    // chain: 64 docs in a line (diameter 63 — pointer jumping's best
    // case). basin: 10 star clusters bridged in a line, hub ids
    // DECREASING along the line so the global min (hub 0) sits at the
    // far end and hash-to-min must crawl cluster by cluster.
    val chainEdges = (0 until 63).map(i => (i.toLong, i + 1L))
    val basinEdges = (0 until 10).flatMap { c =>
      val hub = (9 - c) * 100L
      val leaves = (1L to 9L).map(l => (hub, hub + l))
      val bridge = if (c < 9) Seq(((9 - c) * 100L + 9L, (8 - c) * 100L + 9L))
        else Seq.empty
      leaves ++ bridge
    }
    for ((name, edges) <- Seq(("chain", chainEdges), ("basin", basinEdges))) {
      val df = edges.toDF("da", "db")
      val (star, starRounds) =
        Dedup.nearDupComponentsWithRounds(df, smallGraphEdges = 0)
      val (htm, htmRounds) = Dedup.nearDupComponentsHashToMinWithRounds(df)
      val s = star.orderBy("doc").as[(Long, Long, Long)].collect().toSeq
      val h = htm.orderBy("doc").as[(Long, Long, Long)].collect().toSeq
      assert(s == h, s"$name: star and hash-to-min components diverge")
      info(s"$name: star $starRounds rounds vs hash-to-min $htmRounds")
      assert(starRounds <= htmRounds,
        s"$name: star CC took $starRounds rounds vs hash-to-min's $htmRounds")
      // the small-sliver union-find fast path (what these fixtures take
      // under the default guard) must produce the identical labels
      val (fast, fastRounds) = Dedup.nearDupComponentsWithRounds(df)
      assert(fastRounds == 0, s"$name: expected the fast path under the guard")
      val f = fast.orderBy("doc").as[(Long, Long, Long)].collect().toSeq
      assert(f == s, s"$name: fast-path union-find diverges from star CC")
    }
  }

  test("component rounds stay flat at 10x corpus — the O(log diameter) claim, measured") {
    // q41f's cost driver is the round count x per-round join cost.
    // Rounds depend on component DIAMETER, not corpus size: a 10x
    // corpus of id-shifted shards (ScaleData's shape — same component
    // structures, 10x as many of them) must converge in at most one
    // extra round, with per-round cost growing ~linearly. A linear
    // round count would read as rounds10 ~ 10x here.
    def shard(shift: Long): Seq[(Long, Long)] = {
      val chains = (0 until 60).flatMap { c =>
        val base = shift + c * 10L
        (0 until 7).map(i => (base + i, base + i + 1)) // 8-doc chains
      }
      val pairs = (0 until 100).map(p => (shift + 1000 + 2L * p, shift + 1001 + 2L * p))
      val tris = (0 until 40).flatMap { t =>
        val b = shift + 2000 + 3L * t
        Seq((b, b + 1), (b + 1, b + 2), (b, b + 2))
      }
      chains ++ pairs ++ tris
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val e1 = shard(0).toDF("da", "db")
    val e10 = (0 until 10).flatMap(s => shard(s * 1000000L)).toDF("da", "db")
    val ((out1, rounds1), wall1) = timed {
      val (df, r) = Dedup.nearDupComponentsWithRounds(e1, smallGraphEdges = 0); (df.count(), r)
    }
    val ((out10, rounds10), wall10) = timed {
      val (df, r) = Dedup.nearDupComponentsWithRounds(e10, smallGraphEdges = 0); (df.count(), r)
    }
    assert(out10 == 10 * out1, s"shifted shards must be disjoint: $out1 -> $out10")
    info(f"CC rounds $rounds1 -> $rounds10, wall $wall1%.2f s -> $wall10%.2f s (${wall10 / wall1}%.1fx) at 10x")
    assert(rounds10 <= rounds1 + 1,
      s"round count grew with corpus size ($rounds1 -> $rounds10) — pointer jumping broken")
    // wall ratio band is INFO-first: the real measured ratio lives in
    // SCALING.md's isolated-bench table, and a load-contended shared
    // JVM can inflate this one spuriously (round-11 advice) — the hard
    // pin above (rounds10 <= rounds1 + 1) is the O(log diameter) law
    if (wall10 > 6.0 * math.max(wall1, 0.5))
      info(f"NOTE: CC wall ratio above 6x here ($wall1%.2f s -> $wall10%.2f s)" +
        " — check SCALING.md's isolated bench before reading this as a regression")
    // ...but a GROSS blow-up still fails even here (round-12 advice):
    // shared-JVM jitter has measured ~1.2-3x; a quadratic per-round
    // regression reads 10x+ and must not hide behind the info note
    assert(wall10 <= 20.0 * math.max(wall1, 0.5),
      f"CC wall ratio ${wall10 / math.max(wall1, 0.5)}%.1fx at 10x exceeds the " +
        f"20x gross-regression ceiling ($wall1%.2f s -> $wall10%.2f s)")
  }

  test("simhash: identical texts at distance 0, all true pairs found") {
    val pairs = Dedup.simHashNearDups(
      Dedup.simHash(dupCorpus, "doc_id", "text"), maxHamming = 3)
    val exact = pairs.filter($"doc_b" === $"doc_a" + 1000000)
    assert(exact.filter($"dist" =!= 0).count() == 0)
    val expected = Tables.documents(spark, sf).filter($"doc_id" % 10 === 0).count()
    assert(exact.count() == expected)
  }

  test("cross-corpus near-dup: every prefix-copy caught, no fresh doc flagged") {
    // q41k's construction: 'copy '-prefixed near-copies must all match
    // their originals (generator 2 covers the docs whose only rare
    // shingle is the NOVEL prefix bigram — rare-blocking alone missed
    // 20/50 of them before the unpaired-doc fallback); vowel-swapped
    // fresh docs must not match anything.
    val d = Tables.documents(spark, sf).select("doc_id", "text")
    val batch = d.filter($"doc_id" % 10 === 3)
      .select(($"doc_id" + 2000000L).as("doc_id"),
        concat(lit("copy "), $"text").as("text"))
      .unionByName(d.filter($"doc_id" % 10 === 4)
        .select(($"doc_id" + 3000000L).as("doc_id"),
          translate($"text", "aeiou", "xyzwv").as("text")))
    val v = Dedup.incrementalNearDup(d, batch, "doc_id", "text").cache()
    assert(v.count() == batch.count(), "one verdict per batch doc")
    val copies = v.filter($"batch_id" < 3000000L)
    val fresh = v.filter($"batch_id" >= 3000000L)
    assert(copies.filter($"matched" === 0).isEmpty,
      "a prefix-copy escaped the near-dup check")
    assert(fresh.filter($"matched" === 1).isEmpty,
      "a genuinely-new doc was falsely flagged")
    assert(v.filter($"best_jaccard" < 0 || $"best_jaccard" > 1).isEmpty)
    v.unpersist()
  }

  test("substring dedup: repeated 8-gram spans merge by interval union, unique text stays clean") {
    // doc 1/2 share the 8-token phrase a..h (different positions);
    // doc 3 is fully unique; doc 4 repeats "a..h i" TWICE internally —
    // overlapping grams (a..h, b..i) at both sites must merge to two
    // disjoint 9-token intervals, not 4·8 double-counted tokens.
    val docs = Seq(
      (1L, "a b c d e f g h x1 x2"),
      (2L, "z1 a b c d e f g h z2"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
      (4L, "p1 a b c d e f g h i p2 a b c d e f g h i")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupStats(docs, "doc_id", "text", L = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "dup_tokens", "n_dup_grams", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      // doc 1: span [1,8] of 10 → 8 dup tokens, 1 dup gram, 16 ≥ 10 → drop
      (1L, 10L, 8L, 1L, false),
      (2L, 10L, 8L, 1L, false),
      (3L, 10L, 0L, 0L, true),
      // doc 4: grams (a..h, b..i) × 2 sites → union [2,10] ∪ [12,20] =
      // 18 of 20 tokens, 4 dup-gram occurrences
      (4L, 20L, 18L, 4L, false)), s"got $out")
  }

  test("substring dedup: a gram repeated only WITHIN the hash stage's candidate set still needs the exact-string count") {
    // Two docs with entirely different grams: nothing repeats, so even
    // though every occurrence enters the hash aggregate, no span may
    // survive the exact verify.
    val docs = Seq(
      (1L, "q1 q2 q3 q4 q5 q6 q7 q8 q9"),
      (2L, "r1 r2 r3 r4 r5 r6 r7 r8 r9")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupStats(docs, "doc_id", "text", L = 8)
    assert(out.filter($"dup_tokens" > 0).isEmpty)
    assert(out.filter(!$"keep").isEmpty)
  }

  test("substring dedup matches a brute-force reference on random small-vocab corpora") {
    val L = 3
    for (seed <- Seq(11, 53, 89)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array("aa", "bb", "cc", "dd") // tiny vocab → repeats guaranteed
      val docs = (1L to 12L).map { id =>
        (id, Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length)))
          .mkString(" "))
      }
      // brute-force reference: count every L-gram occurrence corpus-
      // wide, mark covered positions, union trivially via a boolean
      // array per doc
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
      val occ = toks.flatMap { case (id, l) =>
        (0 to l.length - L).map(s => (id, s, l.slice(s, s + L).mkString(" ")))
      }
      val freq = occ.groupBy(_._3).map { case (g, os) => g -> os.size }
      val expected = toks.map { case (id, l) =>
        val covered = Array.fill(l.length)(false)
        occ.filter(o => o._1 == id && freq(o._3) >= 2)
          .foreach(o => (o._2 until o._2 + L).foreach(covered(_) = true))
        val dup = covered.count(identity).toLong
        (id, l.length.toLong, dup, (2 * dup < l.length))
      }.sortBy(_._1)
      val got = Dedup.substringDupStats(docs.toDF("doc_id", "text"),
          "doc_id", "text", L)
        .orderBy("doc_id")
        .select("doc_id", "n_tokens", "dup_tokens", "keep")
        .as[(Long, Long, Long, Boolean)].collect().toSeq
      assert(got == expected, s"seed $seed: substring-dedup mismatch")
    }
  }

  test("substring strip: duplicated spans removed byte-exactly, clean docs untouched, empty docs survive") {
    val docs = Seq(
      (1L, "a b c d e f g h x1 x2"),
      (2L, "z1 a b c d e f g h z2"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
      (4L, "a b c d e f g h")  // exactly one fully-duplicated span
    ).toDF("doc_id", "text")
    val out = Dedup.substringStrip(docs, "doc_id", "text", L = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "kept_tokens", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 10L, 2L, "x1 x2"),
      (2L, 10L, 2L, "z1 z2"),
      (3L, 10L, 10L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
      (4L, 8L, 0L, "")), s"got $out")
  }
}
