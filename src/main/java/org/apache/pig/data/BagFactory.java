package org.apache.pig.data;

import java.util.ArrayList;
import java.util.Iterator;
import java.util.List;

/**
 * API-compatibility facade (reference: src/org/apache/pig/data/
 * BagFactory.java). The reference's default bag spills to disk; on this
 * engine a UDF-built bag is a plain in-heap list — bag-valued columns at
 * scale flow through Spark arrays, never through this shim.
 */
public abstract class BagFactory {
    private static final BagFactory INSTANCE = new BagFactory() {
        public DataBag newDefaultBag() { return new ListBag(); }
        public DataBag newDefaultBag(List<Tuple> listOfTuples) {
            ListBag b = new ListBag();
            for (Tuple t : listOfTuples) b.add(t);
            return b;
        }
    };

    public static BagFactory getInstance() { return INSTANCE; }

    public abstract DataBag newDefaultBag();
    public abstract DataBag newDefaultBag(List<Tuple> listOfTuples);

    public static final class ListBag implements DataBag {
        private final List<Tuple> tuples = new ArrayList<>();
        public long size() { return tuples.size(); }
        public void add(Tuple t) { tuples.add(t); }
        public Iterator<Tuple> iterator() { return tuples.iterator(); }
        /** Pig literal form `{(…),(…)}` (reference DefaultAbstractBag
         *  .toString) — UDFs stringify bags and expect this syntax. */
        @Override public String toString() {
            StringBuilder sb = new StringBuilder("{");
            for (int i = 0; i < tuples.size(); i++) {
                if (i > 0) sb.append(',');
                sb.append(tuples.get(i));
            }
            return sb.append('}').toString();
        }
    }
}
