package org.apache.pig.impl.util;

import java.util.Arrays;
import java.util.HashMap;
import java.util.Map;
import java.util.Properties;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.hadoop.conf.Configuration;

/**
 * API facade (reference: impl/util/UDFContext.java) — the channel a
 * UDF uses to pass state computed at PLAN time (outputSchema, ctor)
 * to its EXECUTION-time instances: per-class Properties bags plus the
 * job configuration.
 *
 * The reference keeps one context per thread and serializes it into
 * the job conf for shipping; here the context is one JVM-global store
 * (front-end and local executors share it directly), and the engine's
 * jar-UDF invoker snapshots it at plan time per call site and merges
 * it back on executors ({@link #snapshotForShipping} /
 * {@link #mergeFromShipping}) — the cluster path's equivalent of the
 * reference's conf-serialized UDFContext.
 */
public class UDFContext {

    private static final UDFContext ctx = new UDFContext();
    private static final Configuration conf = new Configuration(false);

    private final ConcurrentHashMap<String, Properties> udfConfs =
            new ConcurrentHashMap<>();

    private UDFContext() {}

    public static UDFContext getUDFContext() { return ctx; }

    public Properties getUDFProperties(Class<?> c) {
        return udfConfs.computeIfAbsent(c.getName(), k -> new Properties());
    }

    public Properties getUDFProperties(Class<?> c, String[] args) {
        return udfConfs.computeIfAbsent(
            c.getName() + Arrays.toString(args), k -> new Properties());
    }

    /** Non-null in both phases (divergence: the reference returns null
     *  on the pure front end — code that only NULL-CHECKS it behaves
     *  the same, code reading job keys sees an empty conf there). */
    public Configuration getJobConf() { return conf; }

    public Properties getClientSystemProps() {
        return System.getProperties();
    }

    public boolean isFrontend() { return false; }

    /** Engine hook: copy the current per-class bags for shipping
     *  inside a serialized invoker (values must be Serializable). */
    public static HashMap<String, Properties> snapshotForShipping() {
        HashMap<String, Properties> out = new HashMap<>();
        ctx.udfConfs.forEach((k, v) -> {
            Properties p = new Properties();
            p.putAll(v);
            out.put(k, p);
        });
        return out;
    }

    /** Engine hook: merge a shipped snapshot into this JVM's context
     *  (executor side; existing keys keep their newer local values). */
    public static void mergeFromShipping(Map<String, Properties> m) {
        if (m == null) return;
        m.forEach((k, v) -> {
            Properties p = ctx.udfConfs
                .computeIfAbsent(k, kk -> new Properties());
            v.forEach(p::putIfAbsent);
        });
    }
}
