package org.apache.pig.impl.logicalLayer.schema;

import java.util.ArrayList;
import java.util.List;
import org.apache.pig.data.DataType;

/**
 * API-compatibility facade (reference: src/org/apache/pig/impl/
 * logicalLayer/schema/Schema.java) — the subset user EvalFuncs build in
 * their outputSchema override. The engine reads alias + type code back
 * out to pick the Spark result DataType.
 */
public class Schema implements java.io.Serializable {

    public static class FieldSchema implements java.io.Serializable {
        public String alias;
        public byte type;
        public Schema schema;
        public FieldSchema(String alias, byte type) {
            this.alias = alias; this.type = type;
        }
        public FieldSchema(String alias, Schema schema) {
            this.alias = alias; this.schema = schema; this.type = DataType.TUPLE;
        }
        public FieldSchema(String alias, Schema schema, byte type) {
            this.alias = alias; this.schema = schema; this.type = type;
        }
    }

    private final List<FieldSchema> fields;

    public Schema() { this.fields = new ArrayList<>(); }
    public Schema(FieldSchema fieldSchema) {
        this.fields = new ArrayList<>();
        this.fields.add(fieldSchema);
    }
    public Schema(List<FieldSchema> fields) {
        this.fields = new ArrayList<>(fields);
    }

    public void add(FieldSchema f) { fields.add(f); }
    public int size() { return fields.size(); }
    public FieldSchema getField(int i) { return fields.get(i); }
    public List<FieldSchema> getFields() { return fields; }

    /** A nested one-field schema (reference Schema.java:1763) —
     *  `generateNestedSchema(BAG, NULL)` builds a bag with an untyped
     *  inner schema, the TOBAG-style fallback shape. */
    public static Schema generateNestedSchema(byte topLevelType,
            byte... innerTypes)
            throws org.apache.pig.impl.logicalLayer.FrontendException {
        Schema inner = new Schema();
        for (byte t : innerTypes) inner.add(new FieldSchema(null, t));
        return new Schema(new FieldSchema(null, inner, topLevelType));
    }

    /** Structural equality on (alias, type, nested schema) — UDF
     *  outputSchema implementations compare argument schemas. */
    @Override
    public boolean equals(Object o) {
        if (!(o instanceof Schema)) return false;
        Schema s = (Schema) o;
        if (s.size() != size()) return false;
        for (int i = 0; i < size(); i++) {
            FieldSchema a = getField(i), b = s.getField(i);
            if (a.type != b.type) return false;
            if (a.alias == null ? b.alias != null
                    : !a.alias.equals(b.alias)) return false;
            if (a.schema == null ? b.schema != null
                    : !a.schema.equals(b.schema)) return false;
        }
        return true;
    }

    @Override
    public int hashCode() {
        int h = 17;
        for (FieldSchema f : fields)
            h = h * 31 + f.type + (f.alias == null ? 0 : f.alias.hashCode());
        return h;
    }

    /** Reference Schema.toString shape: `{alias: typename,...}` —
     *  unnamed fields print the bare type; tuple/bag/map nest with
     *  ()/{}/[] syntax. UDFs stringify schemas (UDFContext round
     *  trips), so the spelling matters. */
    @Override
    public String toString() {
        StringBuilder sb = new StringBuilder("{");
        for (int i = 0; i < fields.size(); i++) {
            if (i > 0) sb.append(',');
            FieldSchema f = fields.get(i);
            if (f.alias != null) sb.append(f.alias).append(": ");
            if (f.type == DataType.TUPLE && f.schema != null) {
                String inner = f.schema.toString();
                sb.append('(')
                  .append(inner, 1, inner.length() - 1).append(')');
            } else if (f.type == DataType.BAG && f.schema != null) {
                sb.append(f.schema.toString());
            } else if (f.type == DataType.MAP) {
                sb.append("map[]");
            } else {
                sb.append(DataType.findTypeName(f.type));
            }
        }
        return sb.append('}').toString();
    }
}
