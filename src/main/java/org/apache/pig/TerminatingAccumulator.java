package org.apache.pig;

/**
 * API facade (reference: TerminatingAccumulator.java:30) — an
 * Accumulator that may declare itself done before the whole group
 * streams through (e.g. IsEmpty needs one tuple). This engine delivers
 * the group bag in one exec() call, so {@link #isFinished()} is only
 * an optimization hint the adapter may consult, never a correctness
 * requirement.
 */
public interface TerminatingAccumulator<T> extends Accumulator<T> {
    boolean isFinished();
}
