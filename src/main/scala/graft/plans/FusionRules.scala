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

  private def plainCollect(ae: AggregateExpression): Boolean =
    ae.aggregateFunction.isInstanceOf[CollectList] &&
      !ae.isDistinct && ae.filter.isEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      agg.copy(aggregateExpressions = agg.aggregateExpressions.map { ne =>
        ne.transform {
          case Size(ae: AggregateExpression, _) if plainCollect(ae) =>
            val collected =
              ae.aggregateFunction.asInstanceOf[CollectList].child
            Cast(ae.copy(aggregateFunction = Count(collected),
              resultId = NamedExpression.newExprId), IntegerType)
          // size(array_distinct(collect_list(x))): collect_list drops
          // nulls, so the distinct bag's size IS count(DISTINCT x) —
          // the PigMix L4 nested-DISTINCT shape. Without this the whole
          // bag materializes per group (memory ∝ group size); with it
          // both stages partial-aggregate.
          case Size(ArrayDistinct(ae: AggregateExpression), _)
              if plainCollect(ae) =>
            val collected =
              ae.aggregateFunction.asInstanceOf[CollectList].child
            Cast(ae.copy(aggregateFunction = Count(collected),
              isDistinct = true,
              resultId = NamedExpression.newExprId), IntegerType)
          // size(array_distinct(collect_list(struct(...)).f)): the bag
          // holds structs (never null), so extracting f CAN surface
          // nulls and array_distinct keeps one — count(DISTINCT f)
          // (null-skipping) plus a max(f IS NULL) term reproduces the
          // null-counting semantics exactly, and both terms
          // partial-aggregate where the bag form cannot.
          case Size(ArrayDistinct(
              GetArrayStructFields(ae: AggregateExpression,
                _, ordinal, _, _)), _)
              if plainCollect(ae) &&
                ae.aggregateFunction.asInstanceOf[CollectList].child
                  .isInstanceOf[CreateNamedStruct] =>
            val field = ae.aggregateFunction
              .asInstanceOf[CollectList].child
              .asInstanceOf[CreateNamedStruct].valExprs(ordinal)
            val distinctCount = ae.copy(aggregateFunction = Count(field),
              isDistinct = true, resultId = NamedExpression.newExprId)
            val nullSeen = ae.copy(
              aggregateFunction = Max(CaseWhen(
                Seq((IsNull(field), Literal(1L))), Literal(0L))),
              resultId = NamedExpression.newExprId)
            Cast(Add(distinctCount, nullSeen), IntegerType)
        }.asInstanceOf[NamedExpression]
      })
  }
}
