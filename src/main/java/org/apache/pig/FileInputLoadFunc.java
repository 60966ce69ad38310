package org.apache.pig;

/**
 * API facade (reference: FileInputLoadFunc.java) — base for loaders
 * over file-split inputs. The reference adds a split comparable for
 * merge join; this engine's merge join never consults loader splits,
 * so the base carries no extra surface.
 */
public abstract class FileInputLoadFunc extends LoadFunc {
}
