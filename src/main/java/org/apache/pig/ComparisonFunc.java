package org.apache.pig;

import org.apache.hadoop.io.WritableComparable;
import org.apache.hadoop.io.WritableComparator;

import org.apache.pig.backend.hadoop.executionengine.physicalLayer.PigProgressable;
import org.apache.pig.data.Tuple;

/**
 * API facade for user sort comparators (reference: ComparisonFunc.java:61,
 * deprecated there too): `ORDER r BY keys USING comparatorClass` calls
 * {@link #compare(Tuple, Tuple)} with the BY-key tuples of two rows.
 * The reference routes Hadoop's raw-comparator path through the same
 * method; this engine calls the Tuple overload directly from its
 * sort, so the WritableComparable bridge below only exists for binary
 * compatibility with sources that override it.
 */
@Deprecated
public abstract class ComparisonFunc extends WritableComparator {

    /** Progress hook for slow comparators (no-op here: Spark tracks
     *  task liveness itself). */
    protected PigProgressable reporter = new PigProgressable() {
        public void progress() {}
        public void progress(String msg) {}
    };

    protected ComparisonFunc() {
        super();
    }

    @Override
    @SuppressWarnings("rawtypes")
    public int compare(WritableComparable a, WritableComparable b) {
        throw new UnsupportedOperationException(
            "raw-comparator path is not used by this engine");
    }

    /**
     * Compare two tuples of ORDER BY keys. The tuples contain the BY
     * expressions in order (`BY *` passes the whole row).
     */
    public abstract int compare(Tuple t1, Tuple t2);

    public void setReporter(PigProgressable p) {
        this.reporter = p;
    }
}
