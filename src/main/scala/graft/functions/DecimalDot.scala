package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact decimal dot product of two numeric-array columns, as a native
  * Catalyst Expression with whole-stage codegen.
  *
  * Semantics are IDENTICAL to the declarative formulation
  * `aggregate(zip_with(a, b, (x,y) => (x*y).cast(DECIMAL(23,14))), 0d37_14, _+_)`
  * — each term is the IEEE double product rounded to decimal(23,14)
  * with HALF_UP (the rounding Spark's `Decimal.changePrecision` and
  * DuckDB's `CAST(x AS DECIMAL(23,14))` both apply), the sum is exact
  * (order-independent), and only the final value is double. That is
  * exactly what the DuckDB oracle computes via
  * `list_sum(list_transform(..., CAST(x*y AS DECIMAL(23,14))))`, so
  * results bit-match across engines.
  *
  * Why an Expression and not the HOF chain: Catalyst evaluates HOF
  * lambdas interpreted, one tree-walk per element. Here `doGenCode`
  * keeps the operator inside whole-stage codegen: the generated Java
  * calls one static monomorphic loop per row (primitive array reads,
  * one decimal rounding per term, no boxing of elements) — this
  * matters when an LSH verify stage scores hundreds of thousands of
  * candidate pairs. Null element or length mismatch → null, matching
  * zip_with's padding semantics.
  */
case class DecimalDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // null can also arise from length mismatch / null element / decimal
  // overflow, independent of child nullability
  override def nullable: Boolean = true

  private def isFloatArr(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"decimal_dot expects array<float|double>, got $other")
  }

  @transient private lazy val lF = isFloatArr(left.dataType)
  @transient private lazy val rF = isFloatArr(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], lF, rF)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lf, rf) = (isFloatArr(left.dataType), isFloatArr(right.dataType))
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val r = ctx.freshName("dot")
      s"""
         |java.lang.Double $r = graft.functions.DecimalDot.compute($x, $y, $lf, $rf);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "decimal_dot"
}

object DecimalDot {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DecimalDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Shared kernel for interpreted eval and generated code. Per term:
    * `BigDecimal.valueOf(x*y).setScale(14, HALF_UP)` semantics —
    * bit-identical to Spark's `Decimal(x*y).changePrecision(23, 14)`
    * (same Double.toString conversion, same rounding mode) — computed
    * through the Fixed14 long fixed-point fast path (one BigDecimal
    * per RESULT, not per term). Any term with |x·y| > Fixed14.MaxSafe
    * reruns the whole dot on the exact BigDecimal path instead (the
    * long accumulator could overflow there). Returns null (boxed) on
    * length mismatch, null element, or decimal(23,14) overflow. */
  def compute(x: ArrayData, y: ArrayData,
      lFloat: Boolean, rFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val v = xv * yv
      if (!(Math.abs(v) <= Fixed14.MaxSafe)) // NaN/Inf land here too
        return computeExact(x, y, lFloat, rFloat)
      acc += Fixed14.round14(v)
      i += 1
    }
    java.lang.Double.valueOf(Fixed14.toDouble(acc))
  }

  /** Exact BigDecimal path for out-of-range terms (identical result,
    * plus the decimal(23,14) overflow → null check that can only
    * trigger out there). */
  private def computeExact(x: ArrayData, y: ArrayData,
      lFloat: Boolean, rFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val t = java.math.BigDecimal.valueOf(xv * yv)
        .setScale(14, java.math.RoundingMode.HALF_UP)
      if (t.precision > 23) return null
      acc = acc.add(t)
      i += 1
    }
    java.lang.Double.valueOf(acc.doubleValue())
  }
}
