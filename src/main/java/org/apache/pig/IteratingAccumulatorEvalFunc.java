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
 *
 * Small-group fast path: tuples buffer until QUEUE_CAPACITY is hit and
 * only then does the worker thread spin up — a grouped dataset
 * dominated by small groups (the common shape) pays ZERO thread
 * spawns; exec runs synchronously in getValue over the buffer.
 *
 * Abandonment safety: all streaming state lives in a per-group Cycle
 * object that the worker and its iterator capture. cleanup() closes the
 * current cycle's input, so a worker belonging to a failed/killed task
 * drains and exits instead of polling forever — and a cycle started
 * later can never be confused with an abandoned one's flags.
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

    /** One threaded streaming cycle: everything the worker thread and
     *  its queue iterator touch, captured so an abandoned worker can
     *  never read a LATER cycle's flags. */
    private final class Cycle {
        final BlockingQueue<Tuple> queue =
                new ArrayBlockingQueue<Tuple>(QUEUE_CAPACITY);
        volatile boolean inputClosed; // no more tuples will arrive
        volatile boolean done;        // exec returned or threw
        volatile T result;
        volatile Exception failure;
        Thread worker;
    }

    private java.util.ArrayList<Tuple> pending; // small-group buffer
    private Cycle cycle;                        // threaded mode, else null
    private boolean syncDone;                   // fast-path exec ran

    private void start() {
        final Cycle c = new Cycle();
        c.worker = new Thread(new Runnable() {
            @Override
            public void run() {
                try {
                    c.result = exec(new QueueIterator(c));
                } catch (Exception e) {
                    c.failure = e;
                } finally {
                    c.done = true;
                }
            }
        });
        c.worker.setDaemon(true);
        c.worker.setName("iterating-accumulator-" + getClass().getSimpleName());
        cycle = c;
        c.worker.start();
        // the already-buffered prefix streams first, in order
        if (pending != null) {
            for (Tuple t : pending) feed(c, t);
            pending = null;
        }
    }

    @Override
    public boolean isFinished() {
        return syncDone || (cycle != null && cycle.done);
    }

    private void feed(Cycle c, Tuple t) {
        if (c.done) return; // exec stopped consuming — rest of group is moot
        try {
            boolean offered = false;
            while (!c.done && !offered)
                offered = c.queue.offer(t, POLL_MS, TimeUnit.MILLISECONDS);
        } catch (InterruptedException e) {
            Thread.currentThread().interrupt();
            c.inputClosed = true; // let the worker drain and exit
            throw new RuntimeException("interrupted feeding accumulator", e);
        }
        if (c.failure != null)
            throw new RuntimeException(
                    "exec failed in accumulator thread", c.failure);
    }

    @Override
    public void accumulate(Tuple b) throws IOException {
        Object bag = b == null || b.size() == 0 ? null : b.get(0);
        if (bag == null) return;
        try {
            for (Tuple t : (DataBag) bag) {
                if (cycle != null) {
                    feed(cycle, t);
                } else {
                    if (pending == null)
                        pending = new java.util.ArrayList<Tuple>();
                    if (pending.size() < QUEUE_CAPACITY) {
                        pending.add(t);
                    } else {
                        start(); // group outgrew the buffer: go threaded
                        feed(cycle, t);
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
        if (cycle == null) {
            // small group (or empty): run exec HERE, no thread
            Iterator<Tuple> it = pending == null
                    ? Collections.<Tuple>emptyIterator()
                    : pending.iterator();
            try {
                T v = exec(it);
                syncDone = true;
                return v;
            } catch (IOException e) {
                throw new RuntimeException(e);
            }
        }
        Cycle c = cycle;
        c.inputClosed = true;
        try {
            c.worker.join();
        } catch (InterruptedException e) {
            Thread.currentThread().interrupt();
            c.inputClosed = true;
            throw new RuntimeException("interrupted awaiting accumulator result", e);
        }
        if (c.failure != null)
            throw new RuntimeException("exec failed in accumulator thread", c.failure);
        return c.result;
    }

    @Override
    public void cleanup() {
        // close an in-flight cycle so its worker drains and exits even
        // when getValue was never reached (task failure / early kill)
        if (cycle != null) cycle.inputClosed = true;
        cycle = null;
        pending = null;
        syncDone = false;
    }

    private final class QueueIterator implements Iterator<Tuple> {
        private final Cycle c;
        private Tuple next;

        QueueIterator(Cycle c) {
            this.c = c;
        }

        @Override
        public boolean hasNext() {
            while (next == null) {
                if (c.inputClosed) {
                    // no producer can add after the flag; one last drain
                    next = c.queue.poll();
                    return next != null;
                }
                try {
                    next = c.queue.poll(POLL_MS, TimeUnit.MILLISECONDS);
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
            Tuple t = next;
            next = null;
            return t;
        }

        @Override
        public void remove() {
            throw new UnsupportedOperationException();
        }
    }
}
