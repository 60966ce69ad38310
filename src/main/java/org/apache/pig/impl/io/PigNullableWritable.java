package org.apache.pig.impl.io;

import java.io.DataInput;
import java.io.DataOutput;
import java.io.IOException;

import org.apache.hadoop.io.WritableComparable;

/**
 * API facade for the reference's nullable key wrapper
 * (reference: impl/io/PigNullableWritable.java:43) — the type a custom
 * {@code PARTITION BY} partitioner receives as its map-output key:
 * {@code Partitioner<PigNullableWritable, Writable>.getPartition(key,
 * value, n)}. User partitioner classes compile against this class and
 * call {@link #getValueAsPigType()} (reference :174) to read the
 * grouping key as a Pig-typed object (Integer, Long, String, Tuple,
 * ...), plus {@link #isNull()} and {@link #hashCode()}.
 *
 * This facade carries the pig-typed value directly instead of a nested
 * WritableComparable: the engine never serializes keys through Hadoop
 * IO, so {@code write}/{@code readFields} — dead weight here — throw.
 * hashCode() is 0 for null keys (the reference's rule) and the value's
 * own hashCode otherwise; the reference hashes the Writable wrapper,
 * whose hash for primitives equals the boxed value's. Routing built on
 * it keeps the contract that matters: equal keys always land in the
 * partition the user's partitioner picks.
 */
public abstract class PigNullableWritable
        implements WritableComparable<PigNullableWritable>, Cloneable {

    /** multiquery-optimized map index flag (reference :50) */
    public static final byte mqFlag = (byte) 0x80;
    /** regular group/cogroup index space (reference :56) */
    public static final byte idxSpace = (byte) 0x7F;

    private boolean mNull;
    private byte mIndex;

    /** The wrapped value as a pig type, not as a WritableComparable. */
    public abstract Object getValueAsPigType();

    public boolean isNull() { return mNull; }

    public void setNull(boolean isNull) { mNull = isNull; }

    public byte getIndex() { return mIndex; }

    public void setIndex(byte index) { mIndex = index; }

    @Override
    @SuppressWarnings({"unchecked", "rawtypes"})
    public int compareTo(PigNullableWritable w) {
        // null sorts first; both-null falls back to index order
        // (reference :88-123, minus the MR multiquery flag path)
        if (!mNull && !w.isNull()) {
            Object a = getValueAsPigType(), b = w.getValueAsPigType();
            if (a instanceof Comparable && b != null
                    && a.getClass() == b.getClass())
                return ((Comparable) a).compareTo(b);
            return String.valueOf(a).compareTo(String.valueOf(b));
        } else if (mNull && w.isNull()) {
            return Byte.compare((byte) (mIndex & idxSpace),
                                (byte) (w.getIndex() & idxSpace));
        }
        return mNull ? -1 : 1;
    }

    @Override
    public int hashCode() {
        // nulls hash to 0 (reference :180-189)
        Object v = mNull ? null : getValueAsPigType();
        return v == null ? 0 : v.hashCode();
    }

    @Override
    public boolean equals(Object o) {
        return o instanceof PigNullableWritable
                && compareTo((PigNullableWritable) o) == 0;
    }

    @Override
    public String toString() {
        return "Null: " + mNull + " index: " + mIndex
                + (mNull ? "" : " " + getValueAsPigType());
    }

    @Override
    public void write(DataOutput out) throws IOException {
        throw new UnsupportedOperationException(
                "facade keys are not Hadoop-serialized");
    }

    @Override
    public void readFields(DataInput in) throws IOException {
        throw new UnsupportedOperationException(
                "facade keys are not Hadoop-serialized");
    }
}
