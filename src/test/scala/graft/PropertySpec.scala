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

  test("wallet partition pruning == SQL filter semantics on random filter trees") {
    import org.apache.spark.sql.sources._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.sources.polygonscan.{PolygonscanScanBuilder, WalletPartition}
    val pool = (0 to 9).map(w => s"0xw$w")
    val walletLeaf: Gen[Filter] = Gen.oneOf(
      Gen.oneOf(pool :+ "0xNOPE").map(v => EqualTo("wallet_address", v)),
      // null-safe equality: `<=> NULL` is a legal leaf (matches only
      // null wallets, i.e. nothing the connector emits)
      Gen.oneOf((pool :+ "0xNOPE") :+ (null: String))
        .map(v => EqualNullSafe("wallet_address", v)),
      Gen.listOf(Gen.oneOf[Any](Gen.oneOf(pool :+ "0xNOPE"), Gen.const(null)))
        .map(vs => In("wallet_address", vs.toArray)))
    val otherLeaf: Gen[Filter] =
      Gen.choose(0L, 300L).map(v => GreaterThan("block_number", v))
    def tree(depth: Int): Gen[Filter] =
      if (depth == 0) Gen.frequency(4 -> walletLeaf, 1 -> otherLeaf)
      else Gen.frequency(
        3 -> walletLeaf, 1 -> otherLeaf,
        2 -> (for { l <- tree(depth - 1); r <- tree(depth - 1) } yield Or(l, r)))
    // Three-valued SQL evaluation of a wallet-only filter for rows of
    // wallet w (every row of the partition agrees — the filter touches
    // only the partition-constant column). A WHERE clause keeps a row
    // only on TRUE, so NULL (null IN-element, no match) prunes too.
    def eval(f: Filter, w: String): Option[Boolean] = f match {
      case EqualTo("wallet_address", v) => Some(w == v)
      // <=> is never NULL; partition wallets are never null, so a
      // null literal is simply FALSE
      case EqualNullSafe("wallet_address", v) => Some(w == v)
      case In("wallet_address", vs) =>
        if (vs.contains(w)) Some(true)
        else if (vs.contains(null)) None // null IN-element: non-match is NULL
        else Some(false)
      case Or(l, r) => (eval(l, w), eval(r, w)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case other => sys.error(s"not wallet-only: $other")
    }
    def fullyWalletBased(g: Filter): Boolean = g match {
      case EqualTo("wallet_address", _) => true
      case EqualNullSafe("wallet_address", _) => true
      case In("wallet_address", _) => true
      case Or(l, r) => fullyWalletBased(l) && fullyWalletBased(r)
      case _ => false
    }
    check(Prop.forAll(tree(2)) { f =>
      val builder = new PolygonscanScanBuilder(new CaseInsensitiveStringMap(
        java.util.Map.of("wallets", pool.mkString(","), "source", "fixture")))
      val residual = builder.pushFilters(Array(f))
      val planned = builder.build().toBatch.planInputPartitions()
        .map(_.asInstanceOf[WalletPartition].wallet).toSet
      if (fullyWalletBased(f))
        // pruning must be EXACT: keep precisely the wallets where the
        // predicate is TRUE (FALSE and NULL rows are dropped anyway),
        // and consume the filter completely
        residual.isEmpty &&
          planned == pool.filter(w => eval(f, w).contains(true)).toSet
      else
        // a block-range leaf makes the outcome row-dependent: nothing
        // may be pruned, and an untranslatable Or must stay residual
        // (standalone block ranges are consumed as [startblock,endblock])
        planned == pool.toSet &&
          (residual.contains(f) || !f.isInstanceOf[Or])
    })
  }

  test("union-all accumulation (R8) is associative on row multisets") {
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 100)), Gen.listOf(Gen.choose(0, 100)),
        Gen.listOf(Gen.choose(0, 100))) { (a, b, c) =>
      ((a ++ b) ++ c).sorted == (a ++ (b ++ c)).sorted
    })
  }
}
