package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Opt-in approximate-query-processing rewrite: when
  * `spark.graft.approxCountDistinct=true`, every single-column exact
  * `count(DISTINCT x)` in the plan is replaced by HyperLogLog++ (the same
  * sketch behind `approx_count_distinct`, default 5% relative error).
  *
  * Why an optimizer rule rather than "just call approx_count_distinct":
  * the swap becomes a *session policy* — existing queries, SQL text, and
  * downstream tools don't change, and flipping the conf trades exactness
  * for a one-pass, fixed-memory aggregate. At 100 TB an exact distinct is
  * a full shuffle of every distinct key; the sketch is a few KB per group
  * and combines map-side. Filtered (`FILTER (WHERE …)`) and multi-column
  * distincts are left untouched.
  *
  * Registered by [[graft.GraftExtensions]] (both the `withExtensions` path
  * and post-hoc via `experimental.extraOptimizations`).
  */
object ApproxCountDistinctRewrite extends Rule[LogicalPlan] {
  val confKey = "spark.graft.approxCountDistinct"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!SQLConf.get.getConfString(confKey, "false").toBoolean) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(Count(Seq(child)), _, true, None, _) =>
        ae.copy(aggregateFunction = HyperLogLogPlusPlus(child),
          isDistinct = false)
    }
}
