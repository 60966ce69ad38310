package org.apache.pig.backend.hadoop.executionengine.mapReduceLayer;

import org.apache.hadoop.mapreduce.InputSplit;

/**
 * API facade (reference: mapReduceLayer/PigSplit.java) — the split
 * handle LoadFunc.prepareToRead receives. This engine's line bridge
 * drives the reader itself, so the split carries no state; the wrapped
 * split is absent (null) like the reference's in-memory cases.
 */
public class PigSplit {
    public PigSplit() {}

    public InputSplit getWrappedSplit() { return null; }

    public int getSplitIndex() { return 0; }
}
