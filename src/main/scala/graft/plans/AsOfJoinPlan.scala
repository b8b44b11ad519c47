package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join (SURVEY.md Q14 as a first-class operator):
  * for each left row, attach the right row with the largest
  * `rightTime <= leftTime` within the same key; time ties resolve to
  * the smallest `tieBreak`. Matched payload columns are nullable.
  *
  * Planned by [[AsOfJoinStrategy]] into [[AsOfJoinExec]] — a
  * co-partitioned sort-merge: ONE shuffle per side, no candidate-pair
  * materialization (the naive range join is quadratic in per-key
  * density; a sorted merge is linear — the difference between a sort
  * and an explosion at 100 TB).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightPayload: Seq[Attribute], tieBreak: Expression)
  extends BinaryNode {

  // payload attributes keep their exprIds (like a join's right side)
  // but become nullable: unmatched left rows carry nulls. Aliases are
  // NOT held here — CleanupAliases strips them from non-Project nodes;
  // callers rename after materializing (AsOf.joinNative).
  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
