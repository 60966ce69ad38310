package org.apache.pig;

/**
 * API facade (reference: Expression.java) — the partition-filter
 * expression LoadMetadata.setPartitionFilter receives. This engine
 * prunes partitions through Spark's own scan planning, so loaders
 * never receive one; the type exists for binary compatibility.
 */
public abstract class Expression {
    public enum OpType { OP_EQ, OP_NE, OP_GT, OP_GE, OP_LT, OP_LE,
        OP_AND, OP_OR, OP_NOT, OP_NULL, OP_NOTNULL, OP_BETWEEN, OP_IN,
        TERM_COL, TERM_CONST }

    protected OpType opType;

    public OpType getOpType() { return opType; }
}
