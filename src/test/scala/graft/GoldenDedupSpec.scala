package graft

import graft.queries.NorthStar

/** Engine-external pins for the two rows-only queries (q41b minhash,
  * q41c simhash — xxhash64-based, so no DuckDB twin exists). DedupSpec
  * proves internal consistency (fused ≡ composed, property tests);
  * these golden files catch the remaining failure mode: a change that
  * consistently alters the emitted pairs (banding arithmetic, salt
  * scheme, hash seeding) while preserving row counts and internal
  * invariants. The pins were produced by the round-9 engine at
  * sf0.001 and committed; any drift in the pair lists fails here.
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
