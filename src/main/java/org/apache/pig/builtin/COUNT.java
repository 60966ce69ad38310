package org.apache.pig.builtin;

import java.io.IOException;
import org.apache.pig.EvalFunc;
import org.apache.pig.data.DataBag;
import org.apache.pig.data.Tuple;

/**
 * API-compatibility facade of the reference's COUNT builtin for user UDF
 * jars that delegate to it (reference: src/org/apache/pig/builtin/
 * COUNT.java — counts tuples whose FIRST field is non-null; the engine's
 * native COUNT path lives in graft.functions.Builtins and never routes
 * through this class).
 */
public class COUNT extends EvalFunc<Long> {
    @Override
    public Long exec(Tuple input) throws IOException {
        Object o = input == null || input.size() == 0 ? null : input.get(0);
        if (o == null) return null;
        long cnt = 0;
        for (Tuple t : (DataBag) o)
            if (t != null && t.size() > 0 && t.get(0) != null) cnt++;
        return cnt;
    }
}
