package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `TypedImperativeAggregate` (Q40 surface): space-saving heavy
  * hitters over a string column. The mutable-map buffer lives outside
  * Tungsten rows and is explicitly serialized between partial and
  * final aggregation — the imperative-buffer contract sketches
  * (HLL, CMS, quantile digests) build on.
  *
  * With `capacity >= |distinct values|` the summary is EXACT, which is
  * how the declared query oracle-checks it; under pressure it evicts
  * the current minimum (the classic space-saving bound). Returns the
  * top-k as a sorted array of (value, cnt) structs — deterministic
  * order (cnt desc, value asc).
  */
case class TopKFreq(
    child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("value", StringType).add("cnt", LongType))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => add(buf, s, c) }
    buf
  }

  private def add(buf: mutable.HashMap[String, Long], s: String, c: Long): Unit = {
    buf.get(s) match {
      case Some(cur) => buf.update(s, cur + c)
      case None =>
        if (buf.size < capacity) buf.update(s, c)
        else { // space-saving eviction: replace the current minimum
          val (minK, minV) = buf.minBy(_._2)
          buf.remove(minK)
          buf.update(s, minV + c)
        }
    }
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (s, c) => (-c, s) }.take(k)
    new GenericArrayData(top.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKFreq =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKFreq =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKFreq =
    copy(child = c.head)
  override def prettyName: String = "topk_freq"
}

object TopKFreq {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_freq", (exprs: Seq[Expression]) => TopKFreq(
        exprs(0),
        k = exprs(1).eval(null).asInstanceOf[Int],
        capacity = exprs(2).eval(null).asInstanceOf[Int]),
      "scala_udf")
}
