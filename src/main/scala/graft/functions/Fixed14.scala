package graft.functions

/** Fixed-point decimal(·,14) kernel shared by DecimalDot and
  * LshBuckets: unscaled-long arithmetic with HALF_UP rounding that is
  * BIT-IDENTICAL to `java.math.BigDecimal.valueOf(v).setScale(14,
  * HALF_UP)` (the rounding Spark's `Cast` to decimal and the DuckDB
  * oracle apply) while avoiding the Double.toString + parse + scale +
  * add allocations that made the BigDecimal path ~300 ns/term.
  *
  * Semantics note: `valueOf` rounds the SHORTEST decimal repr `r` of
  * the double, not its exact binary expansion. The fast path works on
  * `w = |v|·1e14` and proves the HALF_UP decision for `r` from `w`
  * alone: `|w_computed − r·1e14| ≤ ulp(w)/2 + ulp(|v|)·1e14/2`, so
  * whenever the fractional part of `w` is farther than that slack
  * from the 0.5 boundary, floor/round-up on `w` equals HALF_UP on
  * `r`. Ambiguous half-boundary terms (a ~1–3% tail at embedding
  * magnitudes) take the exact BigDecimal path. PropertySpec asserts
  * agreement against the reference on millions of samples.
  */
object Fixed14 {

  /** |v| bound for long fixed-point: unscaled |v|·1e14 ≤ 1e17 keeps a
    * 64-term accumulation well inside Long range (6.4e18 < 2^63). */
  val MaxSafe = 1e3

  /** Unscaled decimal(·,14) HALF_UP rounding of v (|v| ≤ MaxSafe). */
  def round14(v: Double): Long = {
    val av = Math.abs(v)
    val w = av * 1e14
    val k = Math.floor(w)
    val fr = w - k
    // conservative (doubled) error bound; beyond it the boundary
    // decision is provable from the double alone
    val slack = Math.ulp(w) + Math.ulp(av) * 1e14
    if (Math.abs(fr - 0.5) > slack) {
      val l = (if (fr > 0.5) k + 1 else k).toLong
      if (v < 0) -l else l
    } else {
      java.math.BigDecimal.valueOf(v)
        .setScale(14, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValue()
    }
  }

  /** Exact double of an unscaled(14) accumulator — one BigDecimal per
    * RESULT instead of several per term. */
  def toDouble(unscaled: Long): Double =
    java.math.BigDecimal.valueOf(unscaled, 14).doubleValue()
}
