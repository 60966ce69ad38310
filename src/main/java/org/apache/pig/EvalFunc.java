package org.apache.pig;

import java.io.IOException;
import java.lang.reflect.ParameterizedType;
import java.lang.reflect.Type;
import org.apache.pig.data.Tuple;
import org.apache.pig.impl.logicalLayer.schema.Schema;

/**
 * API-compatibility facade for the reference's EvalFunc contract
 * (reference: src/org/apache/pig/EvalFunc.java) — the base class user
 * UDF jars extend. A REGISTER'd jar's subclasses are adapted to Spark
 * udfs by graft.functions.JarUdfs: the engine calls {@link #exec} per
 * row and derives the Spark result type from {@link #getReturnType}
 * (or the {@link #outputSchema} override when present).
 */
public abstract class EvalFunc<T> {

    /** Reference EvalFunc.java:70 — UDFs log through this field
     *  (routed via jcl-over-slf4j here). Part of the binary surface. */
    protected org.apache.commons.logging.Log log =
            org.apache.commons.logging.LogFactory.getLog(getClass());

    /** One invocation: the call's arguments arrive as one tuple. */
    public abstract T exec(Tuple input) throws IOException;

    /**
     * Declared result schema; null (the default) means "derive from the
     * generic return type" — same contract as the reference.
     */
    public Schema outputSchema(Schema input) { return null; }

    /** Per-call-site signature (reference EvalFunc.setUDFContextSignature
     *  — the key UDFs use in UDFContext property names; the engine
     *  passes the same value at plan time and on executors). */
    public void setUDFContextSignature(String signature) {}

    protected Schema inputSchema;

    /** The input schema of this call site, set by the engine before
     *  outputSchema (reference EvalFunc.setInputSchema). */
    public void setInputSchema(Schema input) { this.inputSchema = input; }

    public Schema getInputSchema() { return inputSchema; }

    /**
     * The T of EvalFunc&lt;T&gt;, resolved by walking the class hierarchy
     * with type-variable substitution (an intermediate base like
     * IteratingAccumulatorEvalFunc&lt;Long&gt; passes its argument
     * through EvalFunc's type parameter).
     */
    public Type getReturnType() {
        java.util.Map<java.lang.reflect.TypeVariable<?>, Type> bindings =
            new java.util.HashMap<>();
        Class<?> c = getClass();
        while (c != null && c != Object.class) {
            Type sup = c.getGenericSuperclass();
            if (sup instanceof ParameterizedType) {
                ParameterizedType p = (ParameterizedType) sup;
                Class<?> raw = (Class<?>) p.getRawType();
                java.lang.reflect.TypeVariable<?>[] vars = raw.getTypeParameters();
                Type[] actual = p.getActualTypeArguments();
                for (int i = 0; i < vars.length && i < actual.length; i++) {
                    Type a = actual[i];
                    while (a instanceof java.lang.reflect.TypeVariable
                           && bindings.containsKey(a))
                        a = bindings.get(a);
                    bindings.put(vars[i], a);
                }
                if (raw == EvalFunc.class) {
                    Type t = actual[0];
                    while (t instanceof java.lang.reflect.TypeVariable
                           && bindings.containsKey(t))
                        t = bindings.get(t);
                    return t;
                }
                c = raw;
            } else {
                c = c.getSuperclass();
            }
        }
        return Object.class;
    }

    /** Reference API hook used by outputSchema overrides to derive a
     * field alias; the adapter only reads type codes, so the plain name
     * suffices. */
    protected String getSchemaName(String name, Schema input) { return name; }

    /** Reference API hook: progress heartbeats are a no-op here (Spark
     * tasks have their own liveness machinery). */
    /** Distributed-cache surface (reference: EvalFunc.java:286/:297):
     *  'path#link' entries the framework materializes at ./link in the
     *  task working directory before exec runs — lookup tables shipped
     *  beside the UDF. Default null (nothing to ship). */
    public java.util.List<String> getCacheFiles() { return null; }

    public java.util.List<String> getShipFiles() { return null; }

    public void progress() { }

    /** Reference API hook: warnings go to stderr, once per message. */
    private final java.util.Set<String> warned = new java.util.HashSet<>();
    public void warn(String msg, Enum<?> warningEnum) {
        if (warned.add(msg)) System.err.println("[udf warn] " + msg);
    }
}
