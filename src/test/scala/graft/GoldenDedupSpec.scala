package graft

import graft.queries.NorthStar

/** Engine-external pins for q41b minhash / q41c simhash. Since round
  * 16 both run on the PORTABLE hash family and are duck-oracled, so
  * the primary cross-engine check is the driver's; these goldens stay
  * as a fast in-suite drift pin (banding arithmetic, lane constants,
  * hash seeding) that fails without needing DuckDB.
  *
  * Re-pinned in round 18 to the round-17 v2 TWO-FOLD family
  * (TextHashes.scala — per-lane (A_i·B1 + C_i·B2) mod p) after
  * adjudicating the delta from the v1 affine-lane pins:
  *  - q41c: 291 → 86 pairs. The 205 dropped pairs were the v1
  *    correlated-lane false positives (unrelated docs at Hamming ≤ 3);
  *    all 50 identical-copy pairs (doc_b = doc_a + 1000000) remain at
  *    Hamming 0 in both pin sets.
  *  - q41b: 94 rows in both; only est_jaccard values move (e.g.
  *    (0,50): doc 0 = doc 50 + " dup", ONE differing bigram out of a
  *    ~22-shingle union → all 32 v2 lane-mins agree, est 1.0 — a
  *    plausible estimator draw, independently replicated outside the
  *    JVM). Values regenerated AFTER the v2 outputs hash-matched the
  *    DuckDB oracle at sf0.01 (CORRECTNESS_r17) — the pins inherit
  *    the oracle's authority. Regenerate via `graft.tools.GoldenGen`.
  */
class GoldenDedupSpec extends SparkSpec {

  private def golden(resource: String): Seq[(Long, Long, Double)] = {
    val in = getClass.getResourceAsStream(s"/golden/$resource")
    assert(in != null, s"missing test resource golden/$resource")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    in.close()
    lines.drop(1).map { l =>
      val Array(a, b, v) = l.split(",")
      (a.toLong, b.toLong, v.toDouble)
    }
  }

  private def collected(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1),
      r.get(2) match { case d: Double => d; case i: Int => i.toDouble; case l: Long => l.toDouble }))

  test("q41b minhash pairs match the pinned golden file exactly") {
    val got = collected(NorthStar.q41b.fn(spark, sf))
    val want = golden("q41b_sf0001.csv")
    assert(got.size == want.size, s"row count ${got.size} != ${want.size}")
    // est_jaccard = matches/32: exactly representable, so == is sound
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }

  test("q41c simhash pairs match the pinned golden file exactly") {
    val got = collected(NorthStar.q41c.fn(spark, sf))
    val want = golden("q41c_sf0001.csv")
    assert(got.size == want.size, s"row count ${got.size} != ${want.size}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
  }
}
