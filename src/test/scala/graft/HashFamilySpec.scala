package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Statistical pins for the v2 portable two-fold hash family
  * (TextHashes.scala). The family's design claims — zero spurious
  * MinHash band collisions and a SimHash min-Hamming floor between
  * UNRELATED documents — previously lived only in a code comment
  * backed by an off-repo simulation; this spec makes them
  * reproducible from the repo.
  *
  * Fixture: 300 documents of 30 tokens each, drawn from a SHARED
  * 500-word vocabulary with a seeded RNG (java.util.Random — the
  * sequence is pinned by the JDK spec, so the fixture is
  * deterministic across JVMs). Shared vocabulary matters: disjoint
  * vocabularies would make the test trivially easy; here unrelated
  * docs still collide on individual tokens/shingles, which is
  * exactly the regime where the v1 affine-lane family produced false
  * positives (unrelated docs at SimHash Hamming ≤ 3 and spurious
  * est_jaccard ≈ 1 band collisions).
  */
class HashFamilySpec extends SparkSpec {
  import spark.implicits._

  private lazy val unrelated = {
    val rng = new java.util.Random(42L)
    val docs = (0 until 300).map { i =>
      (i.toLong, (0 until 30).map(_ => s"w${rng.nextInt(500)}").mkString(" "))
    }
    docs.toDF("doc_id", "text")
  }

  test("v2 minhash: unrelated docs produce ZERO band collisions (8 bands x 4 rows)") {
    val sigs = Dedup.minHashSignaturesPortable(unrelated, "doc_id", "text", 2, 32)
    // candidate pairs BEFORE the jaccard threshold — any row here is a
    // band collision; with 300 unrelated 30-token docs there must be none
    val cands = Dedup.minHashNearDupsPortable(sigs, bands = 8, rowsPer = 4,
      threshold = 0.0)
    assert(cands.count() == 0, "unrelated docs collided in an LSH band")
  }

  test("v2 simhash: unrelated docs keep a min-Hamming floor >= 13") {
    val sigs = Dedup.simHashPortable(unrelated, "doc_id", "text")
      .as[(Long, Long)].collect()
    var minH = 64
    var i = 0
    while (i < sigs.length) {
      var j = i + 1
      while (j < sigs.length) {
        val h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
        if (h < minH) minH = h
        j += 1
      }
      i += 1
    }
    // 300 docs → 44 850 pairs; unrelated 64-bit signatures concentrate
    // at Hamming ~32 (sd ~4). On THIS fixture (shared vocabulary, so
    // doc pairs genuinely share ~2 tokens — mild true similarity) the
    // measured min is exactly 13; the off-repo simulation's
    // disjoint-vocab shape measured 17. The fixture is deterministic,
    // so 13 is a hard floor, not a flaky band. v1's correlated
    // bit-lanes put ~15% of unrelated pairs at ≤ 3 — any v1-style
    // regression craters this floor.
    assert(minH >= 13, s"min pairwise Hamming $minH < 13 — lanes correlated?")
  }

  test("v2 minhash: identical docs estimate exactly 1.0; estimator concentrates on near-dups") {
    // 100 base docs, each with an identical copy and a one-token-edit
    // copy: identical copies MUST estimate 1.0 (all lane-mins equal);
    // near-identical copies (1 of 30 tokens changed → true bigram
    // jaccard ≈ 0.88–0.94) must estimate high, never bimodally low —
    // v1's correlated lanes put sd ≈ 0.46 here, v2 ≈ 0.09.
    val rng = new java.util.Random(7L)
    val base = (0 until 100).map { i =>
      (i.toLong, (0 until 30).map(_ => s"w${rng.nextInt(500)}").mkString(" "))
    }
    val rows = base.flatMap { case (id, t) =>
      val toks = t.split(" ")
      toks(rng.nextInt(30)) = "edited"
      Seq((id, t), (id + 1000, t), (id + 2000, toks.mkString(" ")))
    }
    val sigs = Dedup.minHashSignaturesPortable(
      rows.toDF("doc_id", "text"), "doc_id", "text", 2, 32)
      .as[(Long, Array[Long])].collect().toMap
    (0 until 100).foreach { i =>
      val (a, cp, ed) = (sigs(i.toLong), sigs(i + 1000L), sigs(i + 2000L))
      assert(a.sameElements(cp), s"identical copy of $i not at est 1.0")
      val est = a.zip(ed).count { case (x, y) => x == y } / 32.0
      assert(est >= 0.5, s"near-dup of $i estimated $est — bimodal v1-style miss")
    }
  }
}
