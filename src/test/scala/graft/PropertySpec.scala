package graft

import graft.sources.polygonscan.FixturePageSource
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws (SURVEY.md §5.2-4): pagination completeness,
  * wei-rescale precision vs the BigDecimal model. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("pagination covers the block range exactly once, any page size") {
    check(Prop.forAll(Gen.choose(0, 20), Gen.choose(1, 250),
        Gen.choose(0L, 400L), Gen.choose(0L, 400L)) { (w, offset, a, b) =>
      val (lo, hi) = (a.min(b), a.max(b))
      val n = FixturePageSource.totalTxs(w, offset)
      val got = Iterator.from(1)
        .map(p => FixturePageSource.fetch(s"0xw$w", lo, hi, p, offset))
        .takeWhile(_.nonEmpty)
        .flatten.map(_.blockNumber).toVector
      val expected = (lo.max(0) to hi.min(n - 1)).toVector
      got == expected && got.distinct.size == got.size
    })
  }

  test("wei rescale: double path within 1e-15 relative of exact rational") {
    check(Prop.forAll(Gen.choose(1L, 9006999999999999999L),
        Gen.oneOf(0, 6, 8, 18)) { (v, d) =>
      val got = v.toDouble / math.pow(10.0, d.toDouble)
      val exact = BigDecimal(v) / BigDecimal(10).pow(d)
      (BigDecimal(got) - exact).abs <= exact * 1e-15
    })
  }

  test("Fixed14.round14 is bit-identical to BigDecimal.valueOf.setScale(14, HALF_UP)") {
    def ref(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(14, java.math.RoundingMode.HALF_UP).unscaledValue().longValue()
    // dense random sweep across embedding-product magnitudes
    check(Prop.forAll(Gen.choose(-1000.0, 1000.0)) { v =>
      graft.functions.Fixed14.round14(v) == ref(v)
    })
    // float-product values (what DecimalDot actually rounds)
    check(Prop.forAll(Gen.choose(-6.0f, 6.0f), Gen.choose(-6.0f, 6.0f)) { (a, b) =>
      val v = a.toDouble * b.toDouble
      graft.functions.Fixed14.round14(v) == ref(v)
    })
    // adversarial half-boundary cases: k.5 × 10^-14 grid points
    check(Prop.forAll(Gen.choose(-2000000L, 2000000L)) { k =>
      val v = (k.toDouble + 0.5) * 1e-14
      graft.functions.Fixed14.round14(v) == ref(v)
    })
    // exhaustive tiny magnitudes incl. ±0.0 and subnormals
    for (v <- Seq(0.0, -0.0, 1e-300, -1e-300, 4.9e-324, 0.5e-14, -0.5e-14,
        1.5e-14, 999.99999999999994, -999.99999999999994))
      assert(graft.functions.Fixed14.round14(v) == ref(v), s"mismatch at $v")
  }

  test("union-all accumulation (R8) is associative on row multisets") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 100)), Gen.listOf(Gen.choose(0, 100)),
        Gen.listOf(Gen.choose(0, 100))) { (a, b, c) =>
      ((a ++ b) ++ c).sorted == (a ++ (b ++ c)).sorted
    })
  }
}
