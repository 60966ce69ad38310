package org.apache.pig.data;

import java.util.List;

/**
 * API-compatibility facade (reference: src/org/apache/pig/data/
 * DefaultBagFactory.java — the concrete factory old UDFs call directly).
 */
public class DefaultBagFactory extends BagFactory {
    public static BagFactory getInstance() { return BagFactory.getInstance(); }
    public DataBag newDefaultBag() { return BagFactory.getInstance().newDefaultBag(); }
    public DataBag newDefaultBag(List<Tuple> listOfTuples) {
        return BagFactory.getInstance().newDefaultBag(listOfTuples);
    }
}
