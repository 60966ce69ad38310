package org.apache.pig.builtin;

import java.io.IOException;
import java.util.ArrayList;

import org.apache.hadoop.io.Text;
import org.apache.hadoop.mapreduce.InputFormat;
import org.apache.hadoop.mapreduce.Job;
import org.apache.hadoop.mapreduce.OutputFormat;
import org.apache.hadoop.mapreduce.RecordReader;
import org.apache.hadoop.mapreduce.RecordWriter;
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat;

import org.apache.pig.FileInputLoadFunc;
import org.apache.pig.StoreFuncInterface;
import org.apache.pig.backend.hadoop.executionengine.mapReduceLayer.PigSplit;
import org.apache.pig.data.DataByteArray;
import org.apache.pig.data.Tuple;
import org.apache.pig.data.TupleFactory;

/**
 * Functional API facade (reference: builtin/PigStorage.java) — exists
 * so USER jar classes that extend PigStorage (custom delimited loaders
 * and storers are the most common LoadFunc pattern) compile and RUN
 * against this engine. The engine's own `USING PigStorage()` path
 * stays the native Spark CSV reader/writer; this class only executes
 * when a registered-jar subclass rides through the JarStorage bridge.
 *
 * Load side: one line per reader advance, split on the delimiter into
 * DataByteArray fields (the reference's untyped bytearray rule).
 * Store side: putNext hands the tuple to the engine-supplied writer,
 * which renders fields with this storer's delimiter (the
 * PigTextOutputFormat contract).
 */
public class PigStorage extends FileInputLoadFunc
        implements StoreFuncInterface {

    @SuppressWarnings("rawtypes")
    protected RecordReader in = null;
    @SuppressWarnings("rawtypes")
    protected RecordWriter writer = null;

    private byte fieldDel = (byte) '\t';
    private final TupleFactory mTupleFactory = TupleFactory.getInstance();

    public PigStorage() {}

    public PigStorage(String delimiter) {
        fieldDel = parseDelimiter(delimiter);
    }

    /** Reference delimiter spellings: a single char, '\t'/'\n'/'\r',
     *  \\uXXXX, or ^A-style control codes written as \\x-less "\\u0001". */
    private static byte parseDelimiter(String d) {
        if (d == null || d.isEmpty()) return (byte) '\t';
        if (d.length() == 1) return (byte) d.charAt(0);
        if (d.charAt(0) == '\\') {
            switch (d.charAt(1)) {
                case 't': return (byte) '\t';
                case 'n': return (byte) '\n';
                case 'r': return (byte) '\r';
                case '\\': return (byte) '\\';
                case 'u': return (byte) Integer.parseInt(d.substring(2), 16);
                default: break;
            }
        }
        return (byte) d.charAt(0);
    }

    public byte getFieldDel() { return fieldDel; }

    // ------------------------------------------------------------- load

    @Override
    public void setLocation(String location, Job job) throws IOException {}

    @Override
    @SuppressWarnings("rawtypes")
    public InputFormat getInputFormat() {
        return new TextInputFormat();
    }

    @Override
    @SuppressWarnings("rawtypes")
    public void prepareToRead(RecordReader reader, PigSplit split) {
        in = reader;
    }

    @Override
    public Tuple getNext() throws IOException {
        try {
            if (in == null || !in.nextKeyValue()) return null;
            Text value = (Text) in.getCurrentValue();
            String line = value.toString();
            ArrayList<Object> fields = new ArrayList<>();
            int start = 0;
            char del = (char) (fieldDel & 0xff);
            for (int i = 0; i <= line.length(); i++) {
                if (i == line.length() || line.charAt(i) == del) {
                    fields.add(new DataByteArray(line.substring(start, i)));
                    start = i + 1;
                }
            }
            return mTupleFactory.newTuple(fields);
        } catch (InterruptedException e) {
            throw new IOException(e);
        }
    }

    // ------------------------------------------------------------ store

    @Override
    public void setStoreLocation(String location, Job job)
            throws IOException {}

    @Override
    @SuppressWarnings("rawtypes")
    public OutputFormat getOutputFormat() {
        return null; // the engine supplies the writer
    }

    @Override
    @SuppressWarnings("rawtypes")
    public void prepareToWrite(RecordWriter w) {
        writer = w;
    }

    @Override
    @SuppressWarnings("unchecked")
    public void putNext(Tuple t) throws IOException {
        try {
            writer.write(null, t);
        } catch (InterruptedException e) {
            throw new IOException(e);
        }
    }
}
