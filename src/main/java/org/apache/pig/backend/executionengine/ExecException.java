package org.apache.pig.backend.executionengine;

import java.io.IOException;

/**
 * API-compatibility facade for the reference engine's public UDF surface
 * (reference: src/org/apache/pig/backend/executionengine/ExecException.java).
 * Only the signatures a user EvalFunc jar compiles and links against are
 * provided; the implementation is this engine's own.
 */
public class ExecException extends IOException {
    public ExecException() { super(); }
    public ExecException(String message) { super(message); }
    public ExecException(Throwable cause) { super(cause); }
    public ExecException(String message, Throwable cause) { super(message, cause); }
}
