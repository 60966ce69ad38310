package org.apache.pig.impl.logicalLayer;

import org.apache.pig.PigException;

/**
 * API-compatibility facade (reference: src/org/apache/pig/impl/
 * logicalLayer/FrontendException.java).
 */
public class FrontendException extends PigException {
    public FrontendException() { super(); }
    public FrontendException(String message) { super(message); }
    public FrontendException(Throwable cause) { super(cause); }
    public FrontendException(String message, Throwable cause) { super(message, cause); }
    public FrontendException(String message, int errCode) { super(message, errCode); }
    public FrontendException(String message, int errCode, Throwable cause) {
        super(message, errCode, cause);
    }
}
