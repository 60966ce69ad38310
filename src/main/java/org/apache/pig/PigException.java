package org.apache.pig;

import java.io.IOException;

/**
 * API-compatibility facade (reference: src/org/apache/pig/PigException.java)
 * — base checked exception of the reference's public API.
 */
public class PigException extends IOException {
    // error-source codes (public API constants, PigException.java:44-48)
    public static final byte INPUT = 2;
    public static final byte BUG = 4;
    public static final byte USER_ENVIRONMENT = 8;
    public static final byte REMOTE_ENVIRONMENT = 16;
    public static final byte ERROR = -1;

    protected int errorCode = 0;
    protected byte errorSource = BUG;

    public PigException() { super(); }
    public PigException(String message) { super(message); }
    public PigException(Throwable cause) { super(cause); }
    public PigException(String message, Throwable cause) { super(message, cause); }
    public PigException(String message, int errCode) {
        super(message); this.errorCode = errCode;
    }
    public PigException(String message, int errCode, Throwable cause) {
        super(message, cause); this.errorCode = errCode;
    }
    public PigException(String message, int errCode, byte errSrc) {
        super(message); this.errorCode = errCode; this.errorSource = errSrc;
    }
    public PigException(String message, int errCode, byte errSrc,
                        Throwable cause) {
        super(message, cause); this.errorCode = errCode; this.errorSource = errSrc;
    }
    public int getErrorCode() { return errorCode; }
    public byte getErrorSource() { return errorSource; }
}
