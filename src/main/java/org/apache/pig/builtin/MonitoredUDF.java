package org.apache.pig.builtin;

import java.lang.annotation.ElementType;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import java.util.concurrent.TimeUnit;

/**
 * API-compatibility facade (reference: src/org/apache/pig/builtin/
 * MonitoredUDF.java:55-72): annotating an EvalFunc bounds each exec()
 * call to `duration` time units; on timeout the engine returns the
 * type-matching default (or null when none is provided). The engine
 * honors it in graft.functions.JarUdfs.
 */
@Retention(RetentionPolicy.RUNTIME)
@Target(ElementType.TYPE)
public @interface MonitoredUDF {
    TimeUnit timeUnit() default TimeUnit.SECONDS;
    int duration() default 10;
    int[] intDefault() default {};
    long[] longDefault() default {};
    double[] doubleDefault() default {};
    float[] floatDefault() default {};
    String[] stringDefault() default {};
}
