package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom `Generator` UDTF (Q40): explode a string into its
  * character n-grams — one output row per gram. Used by the near-dup
  * shingling pipeline (Q41) and declared directly as an operator.
  */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = new StructType().add("gram", StringType)
  override def prettyName: String = "char_ngrams"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val s = v.asInstanceOf[UTF8String].toString
      if (s.length < n) Nil
      else (0 to s.length - n).map(i =>
        InternalRow(UTF8String.fromString(s.substring(i, i + n))))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams", (exprs: Seq[Expression]) => {
        val n = exprs(1).eval(null).asInstanceOf[Int]
        CharNGrams(exprs(0), n)
      }, "scala_udf")
}
