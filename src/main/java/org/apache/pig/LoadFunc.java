package org.apache.pig;

import java.io.IOException;

import org.apache.hadoop.mapreduce.InputFormat;
import org.apache.hadoop.mapreduce.Job;
import org.apache.hadoop.mapreduce.RecordReader;

import org.apache.pig.backend.hadoop.executionengine.mapReduceLayer.PigSplit;
import org.apache.pig.data.Tuple;

/**
 * API facade for user loaders (reference: LoadFunc.java:64) — the
 * contract `LOAD ... USING userClass()` drives: the framework calls
 * {@link #setLocation}, asks {@link #getInputFormat} what to read
 * with, hands a RecordReader to {@link #prepareToRead}, then pulls
 * {@link #getNext} until null.
 *
 * This engine's bridge (graft.functions.JarStorage) gives text-family
 * loaders (InputFormat = TextInputFormat or a subclass) a reader that
 * yields one line per nextKeyValue with a Text value; any other
 * InputFormat is driven for real — the framework runs the format's own
 * splits and readers and replays each (key, value) stream through the
 * reader handed to {@link #prepareToRead}.
 */
public abstract class LoadFunc {

    /** Where to read. The engine resolves globs itself; implementations
     *  that configure a Hadoop Job here are tolerated (the Job is a
     *  scratch instance). */
    public abstract void setLocation(String location, Job job)
            throws IOException;

    @SuppressWarnings("rawtypes")
    public abstract InputFormat getInputFormat() throws IOException;

    @SuppressWarnings("rawtypes")
    public abstract void prepareToRead(RecordReader reader, PigSplit split)
            throws IOException;

    /** Next tuple, or null at end of this reader's data. */
    public abstract Tuple getNext() throws IOException;

    /** UDFContext signature — no cross-process UDFContext here. */
    public void setUDFContextSignature(String signature) {}

    public String relativeToAbsolutePath(String location,
            org.apache.hadoop.fs.Path curDir) throws IOException {
        return location;
    }

    @SuppressWarnings("rawtypes")
    public final void warn(String msg, Enum warningEnum) {
        System.err.println("[pig-udf-warn] " + warningEnum + ": " + msg);
    }
}
