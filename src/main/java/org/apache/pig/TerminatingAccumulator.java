package org.apache.pig;

/**
 * API facade (reference: TerminatingAccumulator.java:30) — an
 * Accumulator that may declare itself done before the whole group
 * streams through (e.g. IsEmpty needs one tuple). The streaming
 * execution path (graft.functions.AccumulatorStream) checks
 * {@link #isFinished()} between chunks and stops feeding the group —
 * a "first match in a billion-row group" accumulator pays only the
 * rows up to the match.
 */
public interface TerminatingAccumulator<T> extends Accumulator<T> {
    boolean isFinished();
}
