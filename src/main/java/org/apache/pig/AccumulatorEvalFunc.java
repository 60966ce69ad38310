package org.apache.pig;

import java.io.IOException;
import org.apache.pig.data.Tuple;

/**
 * API-compatibility facade (reference: src/org/apache/pig/
 * AccumulatorEvalFunc.java): an EvalFunc implemented purely through the
 * Accumulator interface; exec drives one accumulate/getValue/cleanup
 * cycle over the full input.
 */
public abstract class AccumulatorEvalFunc<T> extends EvalFunc<T>
        implements Accumulator<T> {
    @Override
    public T exec(Tuple input) throws IOException {
        accumulate(input);
        T result = getValue();
        cleanup();
        return result;
    }
}
