package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Delay FLATTEN past a join (SURVEY §4.1 — the reference's
  * `PushDownForEachFlatten`, `P/newplan/logical/rules/
  * PushDownForEachFlatten.java`, re-expressed for Spark): Catalyst never
  * reorders a `Generate` (explode) against a `Join`, so
  * `FOREACH a GENERATE k, FLATTEN(bag)` followed by `JOIN ... BY k` joins
  * the MULTIPLIED rows — every bag element is sorted/shuffled/matched
  * separately even though the join key is per-row. Moving the explode
  * above the join shuffles and matches the original (narrower, fewer)
  * rows once, then fans out after — the same output multiset, since each
  * exploded copy carries the same join key.
  *
  * Sound when:
  *  - the join condition references none of the generator's outputs
  *    (elements can't influence matching);
  *  - the generator is deterministic;
  *  - the Generate is the DIRECT left child of an Inner/Cross/LeftOuter/
  *    LeftSemi/LeftAnti join (or symmetrically the right child of an
  *    Inner/Cross/RightOuter one). Pushing past the null-padding side of
  *    an outer join would change semantics: a null-padded array must NOT
  *    explode into matches, so those shapes are left alone.
  *
  * Inner (non-outer) explode of an empty bag deletes the row on either
  * side of the join, and outer explode null-pads it on either side, so
  * both flavors commute. Output column ORDER changes (generated columns
  * move after the other side's) — a restoring Project keeps the rewritten
  * plan's output identical to the original's.
  *
  * Registered via `spark.experimental.extraOptimizations` (GraftSession
  * .tune), after the main batches: column pruning has already run, so a
  * Generate directly under a Join is exactly the "flatten feeding a join"
  * shape, not an artifact awaiting cleanup.
  */
object PushFlattenPastJoin extends Rule[LogicalPlan] {

  private def movable(g: Generate, cond: Option[Expression]): Boolean =
    g.generator.deterministic &&
      cond.forall(_.references.intersect(AttributeSet(g.generatorOutput)).isEmpty)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // explode on the LEFT of a left-preserving join
    case j @ Join(g: Generate, right, jt, cond, hint)
        if (jt == Inner || jt == Cross || jt == LeftOuter ||
            jt == LeftSemi || jt == LeftAnti) && movable(g, cond) =>
      // join output for semi/anti = left only; unrequiredChildIndex keeps
      // pointing at the same positions because the pushed join's output
      // starts with g.child.output either way
      val pushed = g.copy(child = Join(g.child, right, jt, cond, hint))
      if (pushed.output == j.output) pushed
      else Project(j.output, pushed)

    // explode on the RIGHT of a right-preserving join; the generate's
    // child columns shift by left.output.size in the pushed join's output,
    // so the unrequired indexes shift with them
    case j @ Join(left, g: Generate, jt, cond, hint)
        if (jt == Inner || jt == Cross || jt == RightOuter) &&
           movable(g, cond) =>
      val pushed = g.copy(
        unrequiredChildIndex = g.unrequiredChildIndex.map(_ + left.output.size),
        child = Join(left, g.child, jt, cond, hint))
      if (pushed.output == j.output) pushed
      else Project(j.output, pushed)
  }
}
