package org.apache.pig;

import java.io.IOException;

/**
 * API facade (reference: CollectableLoadFunc.java) — marker a loader
 * implements to promise all instances of a key arrive in one split,
 * enabling `GROUP ... USING 'collected'` (map-side grouping). This
 * engine treats 'collected' as a physical hint with identical
 * semantics, so the promise is accepted and not re-verified.
 */
public interface CollectableLoadFunc {
    void ensureAllKeyInstancesInSameSplit() throws IOException;
}
