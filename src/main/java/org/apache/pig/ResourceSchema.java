package org.apache.pig;

import java.io.Serializable;
import java.util.List;

import org.apache.pig.impl.logicalLayer.schema.Schema;
import org.apache.pig.impl.logicalLayer.schema.Schema.FieldSchema;

/**
 * API facade (reference: ResourceSchema.java:47) — the schema a
 * self-describing loader returns from LoadMetadata.getSchema. Carries
 * the surface user loaders actually touch: construction from a Schema
 * and per-field name + type code.
 */
public class ResourceSchema implements Serializable {

    public static class ResourceFieldSchema implements Serializable {
        private String name;
        private byte type = org.apache.pig.data.DataType.BYTEARRAY;
        private ResourceSchema schema;

        public ResourceFieldSchema() {}

        public ResourceFieldSchema(FieldSchema f) {
            this.name = f.alias;
            this.type = f.type;
            if (f.schema != null) this.schema = new ResourceSchema(f.schema);
        }

        public String getName() { return name; }
        public ResourceFieldSchema setName(String n) { name = n; return this; }
        public byte getType() { return type; }
        public ResourceFieldSchema setType(byte t) { type = t; return this; }
        public ResourceSchema getSchema() { return schema; }
        public ResourceFieldSchema setSchema(ResourceSchema s) {
            schema = s; return this;
        }
    }

    private ResourceFieldSchema[] fields = new ResourceFieldSchema[0];

    public ResourceSchema() {}

    public ResourceSchema(Schema pigSchema) {
        List<FieldSchema> fs = pigSchema.getFields();
        fields = new ResourceFieldSchema[fs.size()];
        for (int i = 0; i < fs.size(); i++)
            fields[i] = new ResourceFieldSchema(fs.get(i));
    }

    public ResourceFieldSchema[] getFields() { return fields; }

    public ResourceSchema setFields(ResourceFieldSchema[] f) {
        fields = f; return this;
    }
}
