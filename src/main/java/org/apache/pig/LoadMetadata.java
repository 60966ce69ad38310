package org.apache.pig;

import java.io.IOException;

import org.apache.hadoop.mapreduce.Job;

/**
 * API facade (reference: LoadMetadata.java:36) — a loader that can
 * DESCRIBE its own data: the engine asks {@link #getSchema} when a
 * LOAD has no AS clause and applies the returned field names + types
 * (graft.functions.JarStorage). Statistics and partition hooks are
 * accepted for compatibility; Spark plans with its own statistics and
 * scan pruning.
 */
public interface LoadMetadata {

    ResourceSchema getSchema(String location, Job job) throws IOException;

    ResourceStatistics getStatistics(String location, Job job)
            throws IOException;

    String[] getPartitionKeys(String location, Job job) throws IOException;

    void setPartitionFilter(Expression partitionFilter) throws IOException;
}
