package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) key construction — bit-interleaving two bounded
  * integer dimensions into one sort key whose contiguous ranges are
  * compact in BOTH dimensions. Writing files in z-order is the
  * multi-dimensional clustering primitive (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`): per-file min/max stay tight on every
  * interleaved column, so data-skipping prunes on any of them. All
  * arithmetic is integer shifts/masks — exact and identical across
  * engines, which is what lets q89's oracle hash-check the layout
  * key itself.
  */
object Zorder {

  /** Interleave `x` (low `xBits` bits) and `y` (low `yBits` bits):
    * x-bit b lands at position 2b, y-bit b at 2b+1. Inputs must be
    * non-negative and within their bit budgets (the caller masks —
    * q89 uses `user_id % 256` and `day-1`). */
  def zValue(x: Column, y: Column, xBits: Int, yBits: Int): Column = {
    val xs = (0 until xBits).map(b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1)), 2 * b))
    val ys = (0 until yBits).map(b =>
      shiftleft(shiftright(y, b).bitwiseAND(lit(1)), 2 * b + 1))
    (xs ++ ys).reduce(_ + _)
  }
}
