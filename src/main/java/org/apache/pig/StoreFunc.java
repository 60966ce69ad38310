package org.apache.pig;

import java.io.IOException;

import org.apache.hadoop.mapreduce.Job;

/**
 * API facade (reference: StoreFunc.java) — the abstract base most
 * user storers extend instead of implementing StoreFuncInterface raw.
 */
public abstract class StoreFunc implements StoreFuncInterface {

    @Override
    public void setStoreLocation(String location, Job job)
            throws IOException {}
}
