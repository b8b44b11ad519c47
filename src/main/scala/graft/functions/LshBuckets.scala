package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All LSH table buckets of an embedding in ONE pass, as a native
  * codegen Expression returning `array<bigint>` (one bucket id per
  * hash table, index = table).
  *
  * Semantics per table are IDENTICAL to OR-ing
  * `when(decimal_dot(emb, plane_p_signs) > 0, 1 << p)` over the
  * table's planes (the formulation the DuckDB oracle mirrors
  * literally): each plane dot accumulates per-term decimal(23,14)
  * HALF_UP roundings exactly, the final dot is double, sign bit from
  * `> 0`. Because every sign is ±1 — `x * ±1.0` is exact in IEEE and
  * HALF_UP commutes with negation — the kernel rounds each component
  * ONCE and adds/subtracts it into every plane's accumulator, instead
  * of `tables × planesPerTable` independent dot expressions each
  * re-rounding all components (32× fewer BigDecimal roundings for the
  * 8×4 configuration, and one array traversal instead of 32).
  *
  * Anomaly handling matches the composed form: length mismatch, null
  * element, or decimal overflow nulls every plane dot, and
  * `when(null > 0, …).otherwise(0)` makes every bucket 0 — so the
  * kernel returns all-zero buckets in those cases.
  */
case class LshBuckets(child: Expression, signs: Array[Array[Int]],
    planesPerTable: Int) extends UnaryExpression {

  require(signs.nonEmpty && signs.length % planesPerTable == 0,
    "signs must hold planesPerTable signs-rows per table")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloatArr(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"lsh_buckets expects array<float|double>, got $other")
  }

  @transient private lazy val cF = isFloatArr(child.dataType)

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      LshBuckets.compute(a.asInstanceOf[ArrayData], signs, planesPerTable, cF))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cf = isFloatArr(child.dataType)
    val ref = ctx.addReferenceObj("lshSigns", signs, "int[][]")
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.LshBuckets.compute($x, $ref, $planesPerTable, $cf));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
  override def prettyName: String = "lsh_buckets"
}

object LshBuckets {
  def apply(emb: Column, signs: Array[Array[Int]], planesPerTable: Int): Column =
    GraftBridge.column(
      LshBuckets(GraftBridge.expression(emb), signs, planesPerTable))

  /** One-pass kernel: round each component to decimal(·,14) once
    * (Fixed14 unscaled long), accumulate ±term into every plane's
    * long accumulator, emit per-table sign-bit buckets. `signs` is
    * plane-major: signs(p)(j) ∈ {-1, +1}. The final `dot > 0` test on
    * the exact unscaled sum equals the composed form's
    * `decimal_sum.doubleValue > 0` (a positive decimal's double is
    * positive). Components with |x| > Fixed14.MaxSafe (never hit by
    * real embeddings; decimal overflow ⇒ null dots ⇒ bucket 0 in the
    * composed form could only occur further out still) fall back to
    * the all-zero outcome via the same guard. */
  def compute(x: ArrayData, signs: Array[Array[Int]], planesPerTable: Int,
      isFloat: Boolean): Array[Long] = {
    val totalPlanes = signs.length
    val tables = totalPlanes / planesPerTable
    val dim = signs(0).length
    val out = new Array[Long](tables) // zeros = the all-dots-null outcome
    if (x.numElements() != dim) return out
    val acc = new Array[Long](totalPlanes)
    var j = 0
    while (j < dim) {
      if (x.isNullAt(j)) return out
      val v = if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)
      if (!(Math.abs(v) <= Fixed14.MaxSafe)) return computeExact(
        x, signs, planesPerTable, isFloat)
      val t = Fixed14.round14(v)
      var p = 0
      while (p < totalPlanes) {
        acc(p) += (if (signs(p)(j) > 0) t else -t)
        p += 1
      }
      j += 1
    }
    var tb = 0
    while (tb < tables) {
      var b = 0L
      var p = 0
      while (p < planesPerTable) {
        if (acc(tb * planesPerTable + p) > 0) b |= 1L << p
        p += 1
      }
      out(tb) = b
      tb += 1
    }
    out
  }

  /** Exact BigDecimal path for out-of-range components — keeps the
    * composed form's decimal-overflow → all-zero-buckets semantics. */
  private def computeExact(x: ArrayData, signs: Array[Array[Int]],
      planesPerTable: Int, isFloat: Boolean): Array[Long] = {
    val totalPlanes = signs.length
    val tables = totalPlanes / planesPerTable
    val dim = signs(0).length
    val out = new Array[Long](tables)
    val acc = new Array[java.math.BigDecimal](totalPlanes)
    java.util.Arrays.fill(acc.asInstanceOf[Array[AnyRef]], java.math.BigDecimal.ZERO)
    var j = 0
    while (j < dim) {
      if (x.isNullAt(j)) return out
      val v = if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)
      val t = java.math.BigDecimal.valueOf(v)
        .setScale(14, java.math.RoundingMode.HALF_UP)
      if (t.precision > 23) return out
      val nt = t.negate()
      var p = 0
      while (p < totalPlanes) {
        acc(p) = acc(p).add(if (signs(p)(j) > 0) t else nt)
        p += 1
      }
      j += 1
    }
    var tb = 0
    while (tb < tables) {
      var b = 0L
      var p = 0
      while (p < planesPerTable) {
        if (acc(tb * planesPerTable + p).doubleValue() > 0) b |= 1L << p
        p += 1
      }
      out(tb) = b
      tb += 1
    }
    out
  }
}
