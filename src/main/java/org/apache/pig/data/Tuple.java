package org.apache.pig.data;

import java.util.List;
import org.apache.pig.backend.executionengine.ExecException;

/**
 * API-compatibility facade for the reference's Tuple (reference:
 * src/org/apache/pig/data/Tuple.java) — the methods user EvalFuncs
 * actually call on their input.
 */
public interface Tuple
        extends java.io.Serializable, Iterable<Object>, Comparable<Object> {
    int size();
    Object get(int fieldNum) throws ExecException;
    List<Object> getAll();
    void set(int fieldNum, Object val) throws ExecException;
    void append(Object val);
    boolean isNull(int fieldNum) throws ExecException;
    byte getType(int fieldNum) throws ExecException;
}
