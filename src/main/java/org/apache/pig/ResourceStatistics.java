package org.apache.pig;

import java.io.Serializable;

/**
 * API facade (reference: ResourceStatistics.java) — loader-supplied
 * size/records hints. This engine plans with Spark's own statistics,
 * so the object is accepted and unread.
 */
public class ResourceStatistics implements Serializable {
    private Long mBytes;
    private Long numRecords;

    public Long getmBytes() { return mBytes; }
    public ResourceStatistics setmBytes(Long m) { mBytes = m; return this; }
    public Long getNumRecords() { return numRecords; }
    public ResourceStatistics setNumRecords(Long n) {
        numRecords = n; return this;
    }
}
