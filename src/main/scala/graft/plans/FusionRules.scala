package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** GROUP-bag elision (SURVEY §4.3 #1 — Pig's combiner equivalence, the
  * CombinerOptimizerUtil rewrite): `size(collect_list(e))` inside an
  * aggregate becomes `count(e)`. At scale this is the difference between
  * shuffling EVERY input row into per-group arrays and shuffling one
  * pre-aggregated long per group — collect_list has no partial-aggregation
  * benefit (its partial state IS the data), count does.
  *
  * `count(e)` skips nulls exactly like collect_list does, so the rewrite
  * is unconditionally sound. By the time extra optimizations run,
  * CollapseProject has folded the size() projection into the Aggregate,
  * so the match is expression-local within aggregateExpressions.
  *
  * The DSL avoids this shape by construction (GroupedRelation.agg vs
  * .bag), but the Pig Latin frontend and hand-written code can still
  * produce it; this rule catches it in Catalyst. Registered via
  * `spark.experimental.extraOptimizations` in GraftSession.tune.
  */
object FuseBagSizeToCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      agg.copy(aggregateExpressions = agg.aggregateExpressions.map { ne =>
        ne.transform {
          case Size(ae: AggregateExpression, _)
              if ae.aggregateFunction.isInstanceOf[CollectList] &&
                 !ae.isDistinct && ae.filter.isEmpty =>
            val collected =
              ae.aggregateFunction.asInstanceOf[CollectList].child
            Cast(ae.copy(aggregateFunction = Count(collected),
              resultId = NamedExpression.newExprId), IntegerType)
        }.asInstanceOf[NamedExpression]
      })
  }
}
