package org.apache.pig;

import java.io.IOException;
import java.util.ArrayList;
import java.util.Iterator;
import java.util.List;
import org.apache.pig.data.DataBag;
import org.apache.pig.data.Tuple;

/**
 * API-compatibility facade (reference: src/org/apache/pig/
 * IteratingAccumulatorEvalFunc.java): subclasses implement
 * {@code exec(Iterator<Tuple>)} over the group's tuples. The reference
 * pumps chunks through a background thread; here the full bag is
 * available per call, so exec(Tuple) simply unwraps the bag argument and
 * hands over its iterator — same contract, no thread.
 */
public abstract class IteratingAccumulatorEvalFunc<T> extends EvalFunc<T>
        implements Accumulator<T> {

    public abstract T exec(Iterator<Tuple> iterator) throws IOException;

    @Override
    public T exec(Tuple input) throws IOException {
        Object bag = input == null || input.size() == 0 ? null : input.get(0);
        if (bag == null) return exec(new ArrayList<Tuple>().iterator());
        return exec(((DataBag) bag).iterator());
    }

    // accumulator path: buffer chunks, run exec over them at getValue
    private final List<Tuple> buffered = new ArrayList<Tuple>();
    private T value;

    @Override
    public void accumulate(Tuple b) throws IOException {
        Object bag = b == null || b.size() == 0 ? null : b.get(0);
        if (bag != null)
            for (Tuple t : (DataBag) bag) buffered.add(t);
    }

    @Override
    public T getValue() {
        try { value = exec(buffered.iterator()); }
        catch (IOException e) { throw new RuntimeException(e); }
        return value;
    }

    @Override
    public void cleanup() { buffered.clear(); value = null; }
}
