package org.apache.pig.data;

/**
 * API-compatibility facade: the public type-code constants user UDFs
 * reference in outputSchema declarations (reference:
 * src/org/apache/pig/data/DataType.java:60-92 — the byte values are
 * public wire-level API and must match for binary compatibility).
 */
public class DataType {
    public static final byte UNKNOWN    = 0;
    public static final byte NULL       = 1;
    public static final byte BOOLEAN    = 5;
    public static final byte INTEGER    = 10;
    public static final byte LONG       = 15;
    public static final byte FLOAT      = 20;
    public static final byte DOUBLE     = 25;
    public static final byte DATETIME   = 30;
    public static final byte BYTEARRAY  = 50;
    public static final byte CHARARRAY  = 55;
    public static final byte BIGINTEGER = 65;
    public static final byte BIGDECIMAL = 70;
    public static final byte MAP        = 100;
    public static final byte TUPLE      = 110;
    public static final byte BAG        = 120;
    public static final byte ERROR      = -1;

    /** Type code of a runtime value, for UDFs that branch on input type. */
    public static byte findType(Object o) {
        if (o == null) return NULL;
        if (o instanceof DataByteArray) return BYTEARRAY;
        if (o instanceof Boolean) return BOOLEAN;
        if (o instanceof Integer) return INTEGER;
        if (o instanceof Long) return LONG;
        if (o instanceof Float) return FLOAT;
        if (o instanceof Double) return DOUBLE;
        if (o instanceof String) return CHARARRAY;
        if (o instanceof byte[]) return BYTEARRAY;
        if (o instanceof java.math.BigInteger) return BIGINTEGER;
        if (o instanceof java.math.BigDecimal) return BIGDECIMAL;
        if (o instanceof org.joda.time.DateTime) return DATETIME;
        if (o instanceof java.util.Map) return MAP;
        if (o instanceof Tuple) return TUPLE;
        if (o instanceof DataBag) return BAG;
        return ERROR;
    }

    /** Type-code → Pig type name (reference DataType.findTypeName). */
    public static String findTypeName(byte t) {
        switch (t) {
            case NULL:       return "NULL";
            case BOOLEAN:    return "boolean";
            case INTEGER:    return "int";
            case LONG:       return "long";
            case FLOAT:      return "float";
            case DOUBLE:     return "double";
            case DATETIME:   return "datetime";
            case BYTEARRAY:  return "bytearray";
            case CHARARRAY:  return "chararray";
            case BIGINTEGER: return "biginteger";
            case BIGDECIMAL: return "bigdecimal";
            case MAP:        return "map";
            case TUPLE:      return "tuple";
            case BAG:        return "bag";
            default:         return "Unknown";
        }
    }

    public static String findTypeName(Object o) {
        return findTypeName(findType(o));
    }

    /** Pig's value ordering (reference DataType.compare): null sorts
     *  first; values of DIFFERENT types order by type code; same-type
     *  values order naturally. The rule Tuple.compareTo and custom
     *  ComparisonFuncs build on. */
    @SuppressWarnings({"unchecked", "rawtypes"})
    public static int compare(Object a, Object b) {
        byte ta = findType(a), tb = findType(b);
        if (ta != tb) return ta < tb ? -1 : 1;
        if (a == null) return 0; // both null
        if (a instanceof byte[])
            return java.util.Arrays.compare((byte[]) a, (byte[]) b);
        if (a instanceof Comparable)
            return ((Comparable) a).compareTo(b);
        // maps/bags: size first, then a stable textual fallback
        return String.valueOf(a).compareTo(String.valueOf(b));
    }
}
