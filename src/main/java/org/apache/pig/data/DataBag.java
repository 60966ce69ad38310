package org.apache.pig.data;

/**
 * API-compatibility facade (reference: src/org/apache/pig/data/DataBag.java)
 * — enough surface for user UDFs that iterate or build bags.
 */
public interface DataBag extends java.io.Serializable, Iterable<Tuple> {
    long size();
    void add(Tuple t);
}
