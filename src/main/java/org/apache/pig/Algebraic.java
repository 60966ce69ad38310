package org.apache.pig;

/**
 * API facade (reference: Algebraic.java) — an EvalFunc that can run as
 * a distributed combine: {@code getInitial()} names an EvalFunc applied
 * per input tuple, {@code getIntermed()} one that folds bags of partial
 * results (may run any number of times — the combiner contract), and
 * {@code getFinal()} one that folds the last partials into the result.
 * The engine maps the trio onto a Spark Aggregator, so the grouped bag
 * is never materialized (graft.functions.AlgebraicAgg).
 */
public interface Algebraic {

    /** Class name of the per-record initial EvalFunc. */
    String getInitial();

    /** Class name of the combine-step EvalFunc. */
    String getIntermed();

    /** Class name of the finalization EvalFunc. */
    String getFinal();
}
