package org.apache.pig;

import java.io.IOException;

import org.apache.hadoop.mapreduce.Job;
import org.apache.hadoop.mapreduce.OutputFormat;
import org.apache.hadoop.mapreduce.RecordWriter;

import org.apache.pig.data.Tuple;

/**
 * API facade for user storers (reference: StoreFuncInterface.java) —
 * `STORE ... USING userClass()`: the framework calls
 * {@link #setStoreLocation}, hands a RecordWriter to
 * {@link #prepareToWrite}, then pushes every tuple through
 * {@link #putNext}. Text-family storers (getOutputFormat null or a
 * TextOutputFormat) have their writes collected into output lines; any
 * other OutputFormat is driven for real — the framework feeds the
 * storer's (key, value) writes through the format's own RecordWriter
 * and committer.
 */
public interface StoreFuncInterface {

    @SuppressWarnings("rawtypes")
    OutputFormat getOutputFormat() throws IOException;

    void setStoreLocation(String location, Job job) throws IOException;

    @SuppressWarnings("rawtypes")
    void prepareToWrite(RecordWriter writer) throws IOException;

    void putNext(Tuple t) throws IOException;

    default String relToAbsPathForStoreLocation(String location,
            org.apache.hadoop.fs.Path curDir) throws IOException {
        return location;
    }

    default void setStoreFuncUDFContextSignature(String signature) {}

    default void cleanupOnFailure(String location, Job job)
            throws IOException {}
}
