package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy turning the logical as-of join into its
  * sort-merge physical operator. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ AsOfJoinPlan(l, r, lk, rk, lt, rt, payload, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload, tie,
        p.output) :: Nil
    case _ => Nil
  }
}

/** Optimizer rule (Rule[LogicalPlan] surface): strength-reduce
  * `wei_to_token(v, 0)` — dividing by 10^0 — to a bare double cast,
  * removing the pow from the generated code. Constant folding handles
  * fully-literal calls; this handles the literal-decimals case the
  * reference hits for whole-valued tokens. */
object SimplifyWeiToToken
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
  import org.apache.spark.sql.types.DoubleType
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case graft.functions.WeiToToken(v, Literal(0, _)) => Cast(v, DoubleType)
    }
}

/** Session extension hook: register with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => SimplifyWeiToToken)
  }
}
