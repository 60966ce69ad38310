package org.apache.pig.data;

import java.util.List;

/**
 * API-compatibility facade (reference: src/org/apache/pig/data/
 * DefaultTupleFactory.java — deprecated alias of TupleFactory that old
 * UDFs still reference).
 */
public class DefaultTupleFactory extends TupleFactory {
    public static TupleFactory getInstance() { return TupleFactory.getInstance(); }
    public Tuple newTuple() { return TupleFactory.getInstance().newTuple(); }
    public Tuple newTuple(int size) { return TupleFactory.getInstance().newTuple(size); }
    @SuppressWarnings("rawtypes")
    public Tuple newTuple(List c) { return TupleFactory.getInstance().newTuple(c); }
    public Tuple newTuple(Object datum) { return TupleFactory.getInstance().newTuple(datum); }
}
