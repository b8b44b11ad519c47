package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: Spark co-partitions both sides on the key
  * (ClusteredDistribution → one shuffle each) and sorts them
  * (key asc, time asc; right side additionally tieBreak desc). The
  * merge then streams both iterators once per partition:
  *
  *   - advance the right cursor while (rKey, rTime) ≤ (lKey, lTime),
  *     remembering only the LAST right row per key — tie rows arrive
  *     tieBreak-descending, so the last one at a timestamp is the
  *     smallest tieBreak (the declared semantics);
  *   - emit left row + remembered payload (nulls before any match).
  *
  * O(n+m) per partition after sort, constant memory (one buffered
  * payload row) — no per-key grouping, no window state, no candidate
  * pairs. This is the plan shape a 100 TB as-of needs.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightPayload: Seq[Attribute], tieBreak: Expression,
    output: Seq[Attribute])
  extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(tieBreak, Descending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val payloadExprs =
      rightPayload.map(a => BindReferences.bindReference(a: Expression, right.output))
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val nPayload = rightPayload.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadExprs)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        private var matchKey: Any = _
        private var matchPayload: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKey.eval(l)
          val lt = lTime.eval(l)
          // A null left key/time can never match (SQL comparison
          // semantics); emit the null payload without advancing.
          if (lk == null || lt == null) return joined(l, nullPayload)
          // advance right cursor through every row at or before (lk, lt)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKey.eval(r)
            if (rk == null) rBuf.next() // null-keyed right rows match nothing
            else {
              val kc = keyOrd.compare(rk, lk)
              if (kc < 0) rBuf.next()   // stale key: drain without matching
              else if (kc == 0) {
                val rt = rTime.eval(r)
                if (rt == null) rBuf.next() // null time: unusable as-of point
                else if (timeOrd.compare(rt, lt) <= 0) {
                  // copy BOTH: the sort iterator reuses row buffers, so
                  // non-primitive keys (UTF8String/Decimal) must not
                  // retain pointers into the recycled row
                  matchKey = InternalRow.copyValue(rk)
                  matchPayload = payloadProj(r).copy()
                  rBuf.next()
                } else advancing = false
              } else advancing = false
            }
          }
          val p =
            if (matchPayload != null && keyOrd.compare(matchKey, lk) == 0) matchPayload
            else nullPayload
          joined(l, p)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
