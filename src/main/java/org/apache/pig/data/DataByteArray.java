package org.apache.pig.data;

import java.nio.charset.StandardCharsets;
import java.util.Arrays;

/**
 * API facade (reference: data/DataByteArray.java) — Pig's bytearray
 * runtime value. Loaders produce these for untyped fields; the engine
 * surfaces them as UTF-8 text (the engine-wide bytearray-as-string
 * rule), so toString() is the load-boundary conversion.
 */
public class DataByteArray implements Comparable<Object> {
    byte[] mData;

    public DataByteArray() {}

    public DataByteArray(byte[] b) { mData = b; }

    public DataByteArray(byte[] b, int start, int end) {
        mData = Arrays.copyOfRange(b, start, end);
    }

    public DataByteArray(String s) {
        mData = s.getBytes(StandardCharsets.UTF_8);
    }

    public int size() { return mData == null ? 0 : mData.length; }

    public byte[] get() { return mData; }

    public void set(byte[] b) { mData = b; }

    public void set(String s) { mData = s.getBytes(StandardCharsets.UTF_8); }

    public void append(DataByteArray b) {
        byte[] other = b.get();
        byte[] out = Arrays.copyOf(mData, mData.length + other.length);
        System.arraycopy(other, 0, out, mData.length, other.length);
        mData = out;
    }

    @Override
    public String toString() {
        return mData == null ? "" : new String(mData, StandardCharsets.UTF_8);
    }

    @Override
    public int compareTo(Object other) {
        if (!(other instanceof DataByteArray)) return -1;
        return Arrays.compare(mData, ((DataByteArray) other).mData);
    }

    @Override
    public boolean equals(Object other) {
        return other instanceof DataByteArray && compareTo(other) == 0;
    }

    @Override
    public int hashCode() { return Arrays.hashCode(mData); }
}
