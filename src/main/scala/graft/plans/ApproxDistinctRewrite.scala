package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in approximate-query-processing rewrite (the one `Rule[LogicalPlan]`
  * the engine injects): with `graft.approx.distinct = true` in the session
  * conf, every `COUNT(DISTINCT x)` in a logical plan is rewritten to
  * Spark's native `approx_count_distinct(x)` (HyperLogLog++, the black-box
  * sibling of the relational register sketch in
  * [[graft.operators.Sketches]]).
  *
  * Why a rule and not a query rewrite by hand: dashboards and ad-hoc SQL
  * ship `COUNT(DISTINCT …)` — at 100 TB the exact form shuffles every
  * distinct value (its partial state is a SET, unbounded), while the HLL++
  * form's partial state is a fixed register block, turning the pass into
  * one map-side-combinable aggregate. Flipping the conf gives every
  * existing query the cheap plan without touching its text — and because
  * it changes RESULTS (estimates for exact counts), it is strictly opt-in
  * and off by default, per session, re-checked at every invocation.
  *
  * Scope guards: only single-argument COUNT DISTINCT rewrites (multi-arg
  * distinct tuples and FILTER-clause forms keep exact semantics), and
  * DISTINCT-ness is dropped in the replacement (HLL++ absorbs duplicates
  * by construction). */
case class ApproxDistinctRewrite(enabled: () => Boolean) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled()) plan
    else plan.transformWithPruning(_.containsPattern(
      org.apache.spark.sql.catalyst.trees.TreePattern.AGGREGATE)) {
      case agg: Aggregate => agg.transformExpressions {
        case ae @ AggregateExpression(c: Count, _, true, None, _)
            if c.children.size == 1 =>
          ae.copy(
            aggregateFunction = HyperLogLogPlusPlus(c.children.head),
            isDistinct = false)
      }
    }
}
