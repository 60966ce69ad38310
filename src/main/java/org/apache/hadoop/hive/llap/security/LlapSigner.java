package org.apache.hadoop.hive.llap.security;

/**
 * Classpath stub: Spark distributions ship hive-exec-*-core WITHOUT the
 * llap module, but hive's FunctionRegistry static init resolves this
 * type while registering the builtin get_splits UDTF. Spark's own Hive
 * integration avoids the registry entirely; the HiveUDF bridge
 * (graft.functions.HiveUdfs) uses it, so the signature must resolve.
 * Never invoked at runtime.
 */
public interface LlapSigner {
    interface Signable {
        void setSignInfo(int masterKeyId, String user);
        byte[] serialize() throws java.io.IOException;
    }

    interface SignedMessage {
    }
}
