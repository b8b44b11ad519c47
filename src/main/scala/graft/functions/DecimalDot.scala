package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact decimal dot product of two numeric-array columns, as a native
  * Catalyst Expression.
  *
  * Semantics are IDENTICAL to the declarative formulation
  * `aggregate(zip_with(a, b, (x,y) => (x*y).cast(DECIMAL(23,14))), 0d37_14, _+_)`
  * — each term is the IEEE double product rounded to decimal(23,14)
  * with Spark's own cast (`Decimal.changePrecision`, HALF_UP), the sum
  * is exact (order-independent), and only the final value is double.
  * That is also exactly what the DuckDB oracle computes via
  * `list_sum(list_transform(..., CAST(x*y AS DECIMAL(23,14))))`, so
  * results bit-match across engines.
  *
  * Why an Expression and not the HOF chain: Catalyst evaluates HOF
  * lambdas interpreted, one tree-walk per element — this loop runs
  * ~100× cheaper per row, which matters when an LSH verify stage
  * scores hundreds of thousands of candidate pairs. Null element or
  * length mismatch → null, matching zip_with's padding semantics.
  */
case class DecimalDot(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  private def elemGetter(t: DataType): (ArrayData, Int) => Double = t match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
    case other => throw new IllegalArgumentException(
      s"decimal_dot expects array<float|double>, got $other")
  }

  @transient private lazy val getL = elemGetter(left.dataType)
  @transient private lazy val getR = elemGetter(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < x.numElements()) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = Decimal(getL(x, i) * getR(y, i))
      if (!d.changePrecision(23, 14)) return null
      acc = acc.add(d.toJavaBigDecimal)
      i += 1
    }
    acc.doubleValue()
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecimalDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "decimal_dot"
}

object DecimalDot {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(DecimalDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
