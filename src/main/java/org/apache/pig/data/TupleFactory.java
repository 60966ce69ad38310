package org.apache.pig.data;

import java.util.ArrayList;
import java.util.Arrays;
import java.util.Iterator;
import java.util.List;
import org.apache.pig.backend.executionengine.ExecException;

/**
 * API-compatibility facade (reference: src/org/apache/pig/data/
 * TupleFactory.java). The factory returns this engine's ArrayList-backed
 * tuple — user UDF jars obtain tuples only through this entry point.
 */
public abstract class TupleFactory {
    private static final TupleFactory INSTANCE = new TupleFactory() {
        public Tuple newTuple() { return new ListTuple(new ArrayList<>()); }
        public Tuple newTuple(int size) {
            ArrayList<Object> l = new ArrayList<>(size);
            for (int i = 0; i < size; i++) l.add(null);
            return new ListTuple(l);
        }
        public Tuple newTuple(List c) {
            return new ListTuple(new ArrayList<Object>(c));
        }
        public Tuple newTuple(Object datum) {
            return new ListTuple(new ArrayList<>(Arrays.asList(datum)));
        }
    };

    public static TupleFactory getInstance() { return INSTANCE; }

    public abstract Tuple newTuple();
    public abstract Tuple newTuple(int size);
    @SuppressWarnings("rawtypes")
    public abstract Tuple newTuple(List c);
    public abstract Tuple newTuple(Object datum);

    /** This engine's tuple: a thin wrapper over an ArrayList. */
    public static final class ListTuple implements Tuple {
        private final List<Object> fields;
        public ListTuple(List<Object> fields) { this.fields = fields; }
        public int size() { return fields.size(); }
        public Object get(int i) throws ExecException {
            if (i < 0 || i >= fields.size())
                throw new ExecException("index " + i + " out of range in tuple of size " + fields.size());
            return fields.get(i);
        }
        public List<Object> getAll() { return fields; }
        public void set(int i, Object v) throws ExecException {
            if (i < 0 || i >= fields.size())
                throw new ExecException("index " + i + " out of range in tuple of size " + fields.size());
            fields.set(i, v);
        }
        public void append(Object v) { fields.add(v); }
        public boolean isNull(int i) throws ExecException { return get(i) == null; }
        public byte getType(int i) throws ExecException { return DataType.findType(get(i)); }
        public Iterator<Object> iterator() { return fields.iterator(); }
        /** Reference DefaultTuple.compareTo: size first, then
         *  field-by-field under DataType.compare. */
        public int compareTo(Object o) {
            if (!(o instanceof Tuple)) return -1;
            Tuple t = (Tuple) o;
            if (fields.size() != t.size())
                return fields.size() < t.size() ? -1 : 1;
            List<Object> other = t.getAll();
            for (int i = 0; i < fields.size(); i++) {
                int c = DataType.compare(fields.get(i), other.get(i));
                if (c != 0) return c;
            }
            return 0;
        }
        @Override public boolean equals(Object o) { return compareTo(o) == 0; }
        @Override public int hashCode() { return fields.hashCode(); }
        /** Pig literal form `(f1,f2,…)` with nested `{}`/`[]` syntax
         *  (reference DefaultTuple.toString) — UDFs stringify tuples
         *  (StringStore-style storers) and expect this exact shape. */
        @Override public String toString() {
            StringBuilder sb = new StringBuilder("(");
            for (int i = 0; i < fields.size(); i++) {
                if (i > 0) sb.append(',');
                sb.append(render(fields.get(i)));
            }
            return sb.append(')').toString();
        }
        private static String render(Object v) {
            if (v == null) return "";
            if (v instanceof java.util.Map) {
                StringBuilder sb = new StringBuilder("[");
                boolean first = true;
                for (java.util.Map.Entry<?, ?> e
                        : ((java.util.Map<?, ?>) v).entrySet()) {
                    if (!first) sb.append(',');
                    first = false;
                    sb.append(e.getKey()).append('#')
                      .append(render(e.getValue()));
                }
                return sb.append(']').toString();
            }
            return v.toString(); // tuples/bags render themselves
        }
    }
}
