package org.apache.pig;

import java.io.IOException;
import java.util.Collections;
import java.util.Iterator;
import java.util.NoSuchElementException;
import java.util.concurrent.ArrayBlockingQueue;
import java.util.concurrent.BlockingQueue;
import java.util.concurrent.TimeUnit;
import org.apache.pig.data.DataBag;
import org.apache.pig.data.Tuple;

/**
 * API-compatibility facade (reference: src/org/apache/pig/
 * IteratingAccumulatorEvalFunc.java): subclasses implement
 * {@code exec(Iterator<Tuple>)} over the group's tuples.
 *
 * The accumulator path feeds exec incrementally, like the reference: a
 * worker thread runs exec over an iterator backed by a bounded queue,
 * accumulate() pushes each chunk's tuples into the queue (blocking when
 * full), and getValue() closes the input and joins the thread. At no
 * point is the group materialized, so a billion-row group costs
 * QUEUE_CAPACITY tuples of memory. {@link #isFinished()} turns true the
 * moment exec returns, which lets the engine stop streaming the rest of
 * the group (the point of {@link TerminatingAccumulator}).
 */
public abstract class IteratingAccumulatorEvalFunc<T> extends AccumulatorEvalFunc<T>
        implements TerminatingAccumulator<T> {

    public abstract T exec(Iterator<Tuple> iterator) throws IOException;

    /** Bag path: the whole group arrives as one bag — hand exec its
     *  iterator directly, no thread needed. */
    @Override
    public T exec(Tuple input) throws IOException {
        Object bag = input == null || input.size() == 0 ? null : input.get(0);
        if (bag == null) return exec(Collections.<Tuple>emptyIterator());
        return exec(((DataBag) bag).iterator());
    }

    private static final int QUEUE_CAPACITY = 10000;
    private static final long POLL_MS = 200L;

    // small-group fast path: tuples buffer here until QUEUE_CAPACITY is
    // hit; only then does the worker thread spin up. A grouped dataset
    // dominated by small groups (the common shape) pays ZERO thread
    // spawns — exec runs synchronously in getValue over the buffer.
    private java.util.ArrayList<Tuple> pending;
    private BlockingQueue<Tuple> queue;
    private Thread worker;
    private volatile boolean done;        // exec returned or threw
    private volatile boolean inputClosed; // getValue called; no more tuples
    private volatile T result;
    private volatile Exception failure;

    private void start() {
        queue = new ArrayBlockingQueue<Tuple>(QUEUE_CAPACITY);
        done = false;
        inputClosed = false;
        result = null;
        failure = null;
        worker = new Thread(new Runnable() {
            @Override
            public void run() {
                try {
                    result = exec(new QueueIterator());
                } catch (Exception e) {
                    failure = e;
                } finally {
                    done = true;
                }
            }
        });
        worker.setDaemon(true);
        worker.setName("iterating-accumulator-" + getClass().getSimpleName());
        worker.start();
        // the already-buffered prefix streams first, in order
        if (pending != null) {
            for (Tuple t : pending) feed(t);
            pending = null;
        }
    }

    @Override
    public boolean isFinished() {
        return done;
    }

    private void feed(Tuple t) {
        if (done) return; // exec stopped consuming — rest of group is moot
        try {
            boolean offered = false;
            while (!done && !offered)
                offered = queue.offer(t, POLL_MS, TimeUnit.MILLISECONDS);
        } catch (InterruptedException e) {
            Thread.currentThread().interrupt();
            throw new RuntimeException("interrupted feeding accumulator", e);
        }
        if (failure != null)
            throw new RuntimeException(
                "exec failed in accumulator thread", failure);
    }

    @Override
    public void accumulate(Tuple b) throws IOException {
        Object bag = b == null || b.size() == 0 ? null : b.get(0);
        if (bag == null) return;
        try {
            for (Tuple t : (DataBag) bag) {
                if (worker != null) {
                    feed(t);
                } else {
                    if (pending == null)
                        pending = new java.util.ArrayList<Tuple>();
                    if (pending.size() < QUEUE_CAPACITY) {
                        pending.add(t);
                    } else {
                        start(); // group outgrew the buffer: go threaded
                        feed(t);
                    }
                }
            }
        } catch (RuntimeException e) {
            if (e.getCause() instanceof Exception
                    && !(e.getCause() instanceof RuntimeException))
                throw new IOException(
                    "exec failed in accumulator thread", e.getCause());
            throw e;
        }
    }

    @Override
    public T getValue() {
        if (worker == null) {
            // small group (or empty): run exec HERE, no thread
            Iterator<Tuple> it = pending == null
                    ? Collections.<Tuple>emptyIterator()
                    : pending.iterator();
            try {
                T v = exec(it);
                done = true;
                result = v;
                return v;
            } catch (IOException e) {
                throw new RuntimeException(e);
            }
        }
        inputClosed = true;
        try {
            worker.join();
        } catch (InterruptedException e) {
            Thread.currentThread().interrupt();
            throw new RuntimeException("interrupted awaiting accumulator result", e);
        }
        if (failure != null)
            throw new RuntimeException("exec failed in accumulator thread", failure);
        return result;
    }

    @Override
    public void cleanup() {
        pending = null;
        queue = null;
        worker = null;
        done = false;
        inputClosed = false;
        result = null;
        failure = null;
    }

    private final class QueueIterator implements Iterator<Tuple> {
        private Tuple pending;

        @Override
        public boolean hasNext() {
            while (pending == null) {
                if (inputClosed) {
                    // no producer can add after the flag; one last drain
                    pending = queue.poll();
                    return pending != null;
                }
                try {
                    pending = queue.poll(POLL_MS, TimeUnit.MILLISECONDS);
                } catch (InterruptedException e) {
                    Thread.currentThread().interrupt();
                    throw new RuntimeException(e);
                }
            }
            return true;
        }

        @Override
        public Tuple next() {
            if (!hasNext()) throw new NoSuchElementException();
            Tuple t = pending;
            pending = null;
            return t;
        }

        @Override
        public void remove() {
            throw new UnsupportedOperationException();
        }
    }
}
