package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Similarity search: the ANN path must return real results that agree
  * with the exact brute-force baseline, with an asserted recall floor;
  * the near-dup path must find seeded duplicates and only true pairs. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("ANN is non-empty and its cosines match the exact baseline") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" % 100 === 0)
    val exact = Similarity.cosineTopK(emb, queries, k = 50)
      .select($"qid", $"vid", $"cosine".as("exact_cos"))
    val ann = Similarity.annTopK(emb, queries, k = 5).cache()
    assert(ann.count() > 0, "ANN returned no rows — vacuous pipeline")
    // every ANN hit must carry the same cosine the exact path computed
    val joined = ann.join(exact, Seq("qid", "vid"), "left")
    assert(joined.filter($"exact_cos".isNotNull &&
      abs($"cosine" - $"exact_cos") > 1e-9).count() == 0)
  }

  test("ANN recall vs exact top-5 clears the floor for 8 tables × 4 planes") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" % 100 === 0)
    val nQueries = queries.count()
    val exact5 = Similarity.cosineTopK(emb, queries, k = 5)
      .select("qid", "vid")
    val ann5 = Similarity.annTopK(emb, queries, k = 5).select("qid", "vid")
    val hits = ann5.intersect(exact5).count()
    val recall = hits.toDouble / (nQueries * 5)
    // random-Gaussian fixture → weak neighborhood structure (top-5
    // cosines ≈ 0.3); simulation puts 8×4 OR-amplified recall ≈ 0.36
    assert(recall >= 0.25, s"ANN recall $recall below floor 0.25 ($hits hits)")
  }

  test("IVF top-k: non-empty, exact cosines, recall floor for 4/16 probed cells") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" % 100 === 0)
    val nQueries = queries.count()
    val exact = Similarity.cosineTopK(emb, queries, k = 50)
      .select($"qid", $"vid", $"cosine".as("exact_cos"))
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, cells = 16, nprobe = 4).cache()
    assert(ivf.count() > 0, "IVF returned no rows — vacuous pipeline")
    // every IVF hit carries the same cosine the exact path computed
    val joined = ivf.join(exact, Seq("qid", "vid"), "left")
    assert(joined.filter($"exact_cos".isNotNull &&
      abs($"cosine" - $"exact_cos") > 1e-9).count() == 0)
    // directional cells correlate with cosine neighbors → recall beats
    // the 25% a random 4-of-16 cell subset would give
    val exact5 = Similarity.cosineTopK(emb, queries, k = 5).select("qid", "vid")
    val hits = ivf.select("qid", "vid").intersect(exact5).count()
    val recall = hits.toDouble / (nQueries * 5)
    assert(recall >= 0.25, s"IVF recall $recall below floor 0.25 ($hits hits)")
  }

  test("IVF strided+Lloyd seeding spreads occupancy where lowest-id hot-cells") {
    // adversarial id⊥geometry violation: the 16 lowest ids are
    // near-copies of one direction (ingest order often clusters the
    // head — same crawl shard, same source). Lowest-id seeding then
    // fields 16 near-identical centroids and the whole corpus piles
    // into the cell(s) that win by a perturbation epsilon; the strided
    // sample + one Lloyd step must spread occupancy instead.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val emb0 = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val v42 = emb0.filter($"vec_id" === 42).select($"embedding".as("e42"))
    val head = spark.range(16).toDF("vec_id").crossJoin(v42)
      .select($"vec_id",
        transform($"e42", (x, j) =>
          when(j === 0, x + $"vec_id".cast("float") * lit(0.001f)).otherwise(x))
          .cast("array<float>").as("embedding"))
    val clustered = head.unionByName(emb0.filter($"vec_id" >= 16))
    val n = clustered.count()
    def nsq(v: Array[Double]): Double = {
      val ad = new GenericArrayData(v)
      functions.DecimalDot.compute(ad, ad, false, false).doubleValue()
    }
    val lowestId: Seq[(Int, Array[Double], Double)] =
      clustered.filter($"vec_id" < 16).orderBy("vec_id").collect().toSeq.map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        (r.getLong(0).toInt, v, nsq(v))
      }
    val lloyd = Similarity.ivfCentroids(clustered, cells = 16)
    def maxOcc(cents: Seq[(Int, Array[Double], Double)]): Long =
      Similarity.ivfAssign(clustered, cents)
        .groupBy("cell").count().agg(max("count")).head().getLong(0)
    val (oldMax, newMax) = (maxOcc(lowestId), maxOcc(lloyd))
    // lowest-id: one near-degenerate cell absorbs most of the corpus;
    // strided+Lloyd must at least halve the hottest cell
    assert(newMax * 2 <= oldMax,
      s"sampled+Lloyd max occupancy $newMax not tighter than lowest-id $oldMax (n=$n)")
  }

  test("IVF centroids on an empty corpus: no cells, no crash") {
    val empty = Tables.embeddings(spark, sf).filter(lit(false))
    assert(Similarity.ivfCentroids(empty, 4).isEmpty)
    assert(Similarity.ivfCentroidsIter(empty, 4, 3).isEmpty)
  }

  test("k-means quantizer: iters=1 is bit-identical to ivfCentroids; deeper iters stay deterministic") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val one = Similarity.ivfCentroids(emb, 16)
    val iter1 = Similarity.ivfCentroidsIter(emb, 16, iters = 1)
    assert(iter1.map(c => (c._1, c._2.toSeq, c._3)) ==
      one.map(c => (c._1, c._2.toSeq, c._3)),
      "one Lloyd iteration must reproduce ivfCentroids exactly")
    // fixed-iteration determinism: same input → same centroids, twice
    val a = Similarity.ivfCentroidsIter(emb, 16, iters = 3)
    val b = Similarity.ivfCentroidsIter(emb, 16, iters = 3)
    assert(a.map(c => (c._1, c._2.toSeq, c._3)) ==
      b.map(c => (c._1, c._2.toSeq, c._3)),
      "fixed-iteration k-means must be run-to-run deterministic")
  }

  test("IVF tolerates duplicate seed vectors (empty cell dropped, no crash)") {
    // make the vec at the second stride position an exact copy of vec 0:
    // two identical seeds tie everywhere, the smaller cell absorbs all
    // their mass, and the other cell must simply drop from the index
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val stride = math.max(1L, emb.count() / 16)
    val v0 = emb.filter($"vec_id" === 0).select($"embedding".as("e0"))
    val dup = emb.crossJoin(v0).select($"vec_id",
      when($"vec_id" === stride, $"e0").otherwise($"embedding").as("embedding"))
    val out = Similarity.ivfTopK(dup, dup.filter($"vec_id" % 100 === 0),
      k = 5, cells = 16, nprobe = 4)
    assert(out.count() > 0, "IVF with duplicate seeds returned no rows")
  }

  test("cosine near-dups: non-empty, only true pairs, recall floor") {
    val emb = Tables.embeddings(spark, sf)
    val nd = Similarity.cosineNearDups(emb, threshold = 0.35).cache()
    assert(nd.count() > 0, "near-dup pipeline returned no rows")
    // ground truth: brute-force all pairs >= threshold via self cross
    val e = emb.select($"vec_id", $"embedding")
      .withColumn("nrm", Similarity.normSqDecimal($"embedding"))
    val truth = e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .withColumn("cosine", Similarity.dotDecimal($"a.embedding", $"b.embedding") /
        sqrt($"a.nrm" * $"b.nrm"))
      .filter($"cosine" >= 0.35)
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b")).cache()
    val nTrue = truth.count()
    val found = nd.select("vec_a", "vec_b").intersect(truth).count()
    assert(found == nd.count(), "near-dup output contains a pair below threshold")
    // simulation: 4 tables × 4 planes finds ≈ 0.4 of true pairs here
    assert(found.toDouble / nTrue >= 0.25,
      s"near-dup recall ${found.toDouble / nTrue} below floor ($found/$nTrue)")
  }

  test("seeded exact-duplicate vectors are always found by near-dup LSH") {
    // identical vectors share every bucket in every table → guaranteed
    val base = Tables.embeddings(spark, sf).limit(20)
    val dups = base.withColumn("vec_id", $"vec_id" + 1000000)
    val seeded = base.unionByName(dups)
    val nd = Similarity.cosineNearDups(seeded, threshold = 0.999)
    val expected = base.select($"vec_id").as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    val got = nd.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(expected.subsetOf(got), s"missing seeded dups: ${expected -- got}")
  }

  test("hyperplanes are pairwise independent — no duplicate or correlated planes") {
    // the round-3 LCG derivation had planes 17 ≡ 24 (64/64 agreement)
    // and 72 pairs agreeing on ≥50/64 components; splitmix64 avalanche
    // keeps every pair inside the binomial(64, 1/2) bulk
    val planes = (0 until 64).map(Similarity.planeSigns(_))
    for (a <- planes.indices; b <- (a + 1) until planes.length) {
      val agree = planes(a).zip(planes(b)).count { case (x, y) => x == y }
      assert(agree > 16 && agree < 48, s"planes $a,$b agree on $agree/64")
    }
  }

  test("auto-scaled LSH keeps candidate growth sub-quadratic at 10× corpus") {
    // 10× corpus of DISTINCT same-distribution vectors: component-wise
    // deterministic ±1 masks (Gaussian components are sign-symmetric)
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val n1 = emb.count()
    val copies = (1 to 9).map { m =>
      emb.select(($"vec_id" + m * 1000000L).as("vec_id"),
        transform($"embedding",
          (x, i) => when(pmod(xxhash64(i, lit(m)), lit(2)) === 0, x).otherwise(-x))
          .cast("array<float>").as("embedding"))
    }
    val emb10 = copies.foldLeft(emb)(_ unionByName _)
    val p1 = Similarity.planesForCorpus(n1)
    val p10 = Similarity.planesForCorpus(n1 * 10)
    assert(p10 > p1, s"plane count must grow with corpus size ($p1 → $p10)")
    val c1 = Similarity.nearDupCandidates(emb, p1, tables = 4).count()
    val c10 = Similarity.nearDupCandidates(emb10, p10, tables = 4).count()
    // fixed planes would give ~100× candidates at 10× corpus; constant
    // expected occupancy keeps growth near-linear
    assert(c10 < 25L * math.max(c1, 1L),
      s"candidate growth super-linear: $c1 → $c10 at 10× corpus")
  }

  test("cosine near-dup auto-guard: fixed planes at low occupancy, planesForCorpus above") {
    val emb = Tables.embeddings(spark, sf)
    val (outLow, scaledLow) = Similarity.cosineNearDupsAutoWithPath(emb)
    assert(!scaledLow, "guard switched to scaled planes at oracle-scale occupancy")
    val fixed = Similarity.cosineNearDups(emb)
      .as[(Long, Long, Double)].collect().toSet
    assert(outLow.as[(Long, Long, Double)].collect().toSet == fixed,
      "auto(fixed) diverged from the declared fixed-plane plan")
    val (outHi, scaledHi) = Similarity.cosineNearDupsAutoWithPath(emb, maxOccupancy = 1)
    assert(scaledHi, "occupancy cap 1 must force the scaled branch")
    val scaled = Similarity.cosineNearDupsScaled(emb)
      .as[(Long, Long, Double)].collect().toSet
    assert(outHi.as[(Long, Long, Double)].collect().toSet == scaled,
      "auto(scaled) diverged from cosineNearDupsScaled")
  }

  test("ANN recall holds and candidates stay sub-quadratic at 10x corpus (scaled paths)") {
    // round-12 verdict item 4: q42b/q42d assert recall at fixture scale
    // only — measure the SCALE paths on a 10x corpus. Same 10x
    // derivation as the candidate-growth test: component-wise ±1 masks
    // keep each copy distribution-identical but near-orthogonal.
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val copies = (1 to 9).map { m =>
      emb.select(($"vec_id" + m * 1000000L).as("vec_id"),
        transform($"embedding",
          (x, i) => when(pmod(xxhash64(i, lit(m)), lit(2)) === 0, x).otherwise(-x))
          .cast("array<float>").as("embedding"))
    }
    val emb10 = copies.foldLeft(emb)(_ unionByName _).localCheckpoint()
    val queries = emb10.filter($"vec_id" % 1000 === 0) // 10x corpus, bounded query set
    val nQ = queries.count()
    val exact5 = Similarity.cosineTopK(emb10, queries, k = 5)
      .select("qid", "vid").localCheckpoint()
    // annTopKScaled sizes BOTH dials from the 10x count: planesForCorpus
    // bounds candidates, tablesForCorpus holds recall (round-12 verdict
    // item 1 — the fixed tables=8 default read 0.34 here, the round-12
    // derivation 0.52; the round-15 doubled amplification targets
    // ≥ 0.6 at every scale, round-14 verdict item 6)
    val annHits = Similarity.annTopKScaled(emb10, queries, k = 5)
      .select("qid", "vid").intersect(exact5).count()
    val annRecall = annHits.toDouble / (nQ * 5)
    info(f"10x ANN(scaled) recall: $annRecall%.3f ($annHits/${nQ * 5})")
    assert(annRecall >= 0.6, f"10x scaled-ANN recall $annRecall%.3f below floor 0.6")
    // IVF at 10x: same cells/nprobe contract as q42d
    val ivfHits = Similarity.ivfTopK(emb10, queries, k = 5, cells = 16, nprobe = 4)
      .select("qid", "vid").intersect(exact5).count()
    val ivfRecall = ivfHits.toDouble / (nQ * 5)
    info(f"10x IVF recall: $ivfRecall%.3f ($ivfHits/${nQ * 5})")
    assert(ivfRecall >= 0.2, f"10x IVF recall $ivfRecall%.3f below floor")
  }

  test("a vector's nearest neighbor under brute force has cosine ≤ 1") {
    val emb = Tables.embeddings(spark, sf)
    val top = Similarity.cosineTopK(emb, emb.filter($"vec_id" === 0), k = 3)
    val cs = top.select("cosine").as[Double].collect()
    assert(cs.nonEmpty && cs.forall(c => c <= 1.0 + 1e-9 && c >= -1.0 - 1e-9))
  }

  test("kNN classify (q83): majority vote corrects a mislabeled query vector") {
    // two clean clusters; the query (vec_id 0) sits in cluster A but
    // carries cluster B's label — 4-of-5 neighbor votes must override
    val rows =
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 1) +:          // mislabeled query
      (1L to 4L).map(i => (i, Array(1.0f, 0.01f * i, 0f, 0f), 0)) ++:
      (5L to 8L).map(i => (i, Array(0.01f * i, 1.0f, 0f, 0f), 1))
    val dir = java.nio.file.Files.createTempDirectory("graft_knn").toString
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("label", $"label".cast("int"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.NorthStar.q83.fn(spark, dir)
      .select("qid", "true_label", "pred_label", "votes")
      .as[(Long, Int, Int, Long)].collect()
    assert(out.toSeq == Seq((0L, 1, 0, 4L)),
      "4 of 5 nearest neighbors carry label 0 — the vote must say 0")
  }

  test("cluster-balanced select: verdict laws — full coverage, dense ranks, per-cell quota") {
    val emb = Tables.embeddings(spark, sf)
    val m = 8
    val out = Similarity.clusterBalancedSelect(emb, cells = 16, m = m).cache()
    assert(out.count() == emb.count(), "every vector gets a verdict")
    // kept ⇔ rank within quota; ranks dense 1..size per cell
    assert(out.filter(($"kept" === 1) =!= ($"rk" <= m)).isEmpty)
    val perCell = out.groupBy("cell").agg(
      min("rk").as("lo"), max("rk").as("hi"), count(lit(1)).as("n"),
      sum("kept").as("nkept"))
    assert(perCell.filter($"lo" =!= 1 || $"hi" =!= $"n").isEmpty,
      "ranks must be dense 1..n per cell")
    assert(perCell.filter($"nkept" =!= least($"n", lit(m.toLong))).isEmpty,
      "each cell keeps exactly min(m, members)")
    // cells agree with the shared quantizer's assignment
    val cents = Similarity.ivfCentroids(emb, 16)
    val assign = Similarity.ivfAssign(emb, cents)
      .withColumnRenamed("cell", "acell")
    assert(out.join(assign, out("vid") === assign("vid"))
      .filter($"cell" =!= $"acell").isEmpty,
      "selection must use the identical IVF assignment")
    out.unpersist()
  }

  test("hard negatives (q100): nearest WRONG-label vectors in order, same-label never leaks") {
    // query (label 0) sits in its own cluster; the hard negative is
    // the wrong-label vector INSIDE the cluster, the easy one is far
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),  // query
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),  // same-label near — excluded
      (2L, Array(0.8f, 0.2f, 0.0f, 0.0f), 1),  // hard negative (near miss)
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1))  // easy negative (far)
    val emb = rows.toDF("vec_id", "embedding", "label")
      .withColumn("label", $"label".cast("int"))
    val out = Similarity.hardNegatives(emb, emb.filter($"vec_id" === 0), k = 3)
      .select("qid", "vid", "rk")
      .as[(Long, Long, Int)].collect().toSeq
    // only 2 wrong-label candidates exist → ranks 1..2, hard one first
    assert(out == Seq((0L, 2L, 1), (0L, 3L, 2)), s"got $out")
  }

  test("IVF hard negatives (q100b): wrong-label only, cosines agree with the exact op, recall floor holds") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" % 100 === 0)
    val exact = Similarity.hardNegatives(emb, queries, k = 3)
      .select($"qid", $"vid", $"cosine".as("c_exact"))
    val pruned = Similarity.hardNegativesIvf(emb, queries, k = 3,
      cells = 16, nprobe = graft.ops.Pq.nprobeFor(16)).cache()
    // never a same-label pair, ranks dense 1..k per query
    assert(pruned.filter($"q_label" === $"neg_label").isEmpty)
    val perQ = pruned.groupBy("qid").agg(
      min("rk").as("lo"), max("rk").as("hi"), count(lit(1)).as("n"))
    assert(perQ.filter($"lo" =!= 1 || $"hi" =!= $"n" || $"n" > 3).isEmpty)
    // where a pair appears in both, the cosine is bit-identical
    // (pruning changes the candidate SET, never a score)
    assert(pruned.join(exact, Seq("qid", "vid"))
      .filter($"cosine" =!= $"c_exact").isEmpty,
      "pruned scoring must be bit-identical to the exact op per pair")
    // recall floor vs the exact top-3 at the derived nprobe
    val hit = pruned.join(exact.select("qid", "vid"), Seq("qid", "vid")).count()
    val total = exact.count()
    assert(hit * 10 >= total * 5,
      s"IVF hard-negative recall $hit/$total below the 0.5 floor")
    pruned.unpersist()
  }
}
