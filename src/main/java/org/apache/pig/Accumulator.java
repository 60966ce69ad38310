package org.apache.pig;

import java.io.IOException;
import org.apache.pig.data.Tuple;

/**
 * API-compatibility facade (reference: src/org/apache/pig/Accumulator.java)
 * — the streamed-group contract. On this engine the whole group bag
 * arrives in one exec() call (Catalyst streams groups inside its own
 * aggregate machinery), so the adapter drives accumulate/getValue/cleanup
 * once per call for implementations that only fill exec via the
 * accumulator path.
 */
public interface Accumulator<T> {
    void accumulate(Tuple b) throws IOException;
    T getValue();
    void cleanup();
}
