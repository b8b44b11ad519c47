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
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ExpressionInfo}
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => SimplifyWeiToToken)
    // Spark's Bloom-filter expressions exist for the runtime-filter
    // optimizer but are NOT registered as SQL functions; exposing them
    // makes the 100 TB dedup pre-filter shape (build a bloom over the
    // existing corpus's fingerprints, drop clean rows map-side before
    // any shuffle) expressible in one codegen'd pipeline — q41i.
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        args match {
          case Seq(c)       => new BloomFilterAggregate(c).toAggregateExpression()
          case Seq(c, n)    => new BloomFilterAggregate(c, n).toAggregateExpression()
          case Seq(c, n, b) => new BloomFilterAggregate(c, n, b).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_bloom_agg(hash[, expectedItems[, numBits]])")
        }))
    e.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        args match {
          case Seq(bloom, v) => BloomFilterMightContain(bloom, v)
          case _ => throw new IllegalArgumentException(
            "graft_might_contain(bloom, hash)")
        }))
  }
}
