package org.apache.pig.backend.executionengine;

import org.apache.pig.PigException;

/**
 * API-compatibility facade for the reference engine's public UDF surface
 * (reference: src/org/apache/pig/backend/executionengine/ExecException.java
 * — extends PigException there too). Only the signatures a user EvalFunc
 * jar compiles and links against are provided; the implementation is this
 * engine's own.
 */
public class ExecException extends PigException {
    public ExecException() { super(); }
    public ExecException(String message) { super(message); }
    public ExecException(Throwable cause) { super(cause); }
    public ExecException(String message, Throwable cause) { super(message, cause); }
    public ExecException(String message, int errCode) { super(message, errCode); }
    public ExecException(String message, int errCode, Throwable cause) {
        super(message, errCode, cause);
    }
    public ExecException(String message, int errCode, byte errSrc) {
        super(message, errCode, errSrc);
    }
    public ExecException(String message, int errCode, byte errSrc,
                         Throwable cause) {
        super(message, errCode, errSrc, cause);
    }
}
