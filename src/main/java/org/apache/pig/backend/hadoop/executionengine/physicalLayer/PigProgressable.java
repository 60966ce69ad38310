package org.apache.pig.backend.hadoop.executionengine.physicalLayer;

/**
 * API facade (reference: physicalLayer/PigProgressable.java:32) — the
 * progress-reporting hook long-running UDFs/comparators may call. In
 * this engine progress is Spark's concern; both calls are no-op-able
 * and implementations may ignore them.
 */
public interface PigProgressable {

    /** Report progress (keep-alive). */
    void progress();

    /** Report progress with a message. */
    void progress(String msg);
}
