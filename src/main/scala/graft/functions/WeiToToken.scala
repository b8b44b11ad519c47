package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the reference's wei rescale
  * (walletDataConsumer.py:103): `value / 10^decimals` as double.
  *
  * A first-class `Expression` with `doGenCode` stays inside
  * whole-stage codegen (no UDF boxing, no serialization) — the hot
  * path compiles to `((double) value) / Math.pow(10, dec)` in the
  * generated Java, identical to the builtin-composed form.
  */
case class WeiToToken(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "wei_to_token"

  override protected def nullSafeEval(value: Any, dec: Any): Any =
    value.asInstanceOf[Long].toDouble / math.pow(10.0, dec.asInstanceOf[Int].toDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, d) =>
      s"((double) $v) / java.lang.Math.pow(10.0d, (double) $d)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeiToToken =
    copy(left = newLeft, right = newRight)
}

object WeiToToken {
  /** Register `wei_to_token` in the session's function registry so SQL
    * text and `expr()` resolve it (FunctionRegistry surface, Q40). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wei_to_token", (exprs: Seq[Expression]) => WeiToToken(exprs(0), exprs(1)),
      "scala_udf")
}
