package org.apache.pig;

/**
 * API-compatibility facade (reference: src/org/apache/pig/FilterFunc.java):
 * a boolean EvalFunc usable in FILTER BY.
 */
public abstract class FilterFunc extends EvalFunc<Boolean> {
}
