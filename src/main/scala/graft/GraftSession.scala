package graft

import org.apache.spark.sql.SparkSession

/** Session configuration for Pig-semantics + 100 TB-scale defaults.
  *
  * These settings are applied to an EXISTING session's runtime conf where
  * dynamic (so the driver-created session in Verify/Bench picks them up),
  * and documented here as the canonical builder for standalone use.
  */
object GraftSession {

  /** Dynamic confs — safe to set on a running session. */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    // Pig semantics: cast failure → null, div/0 → null, no overflow errors
    // (reference: POCast.java:63, Utf8StorageConverter — §1.4 of SURVEY.md).
    c.set("spark.sql.ansi.enabled", "false")
    // Deterministic datetime arithmetic vs the (TZ-less) DuckDB oracle —
    // Pig's joda DateTimes default to UTC in the reference's tests too.
    c.set("spark.sql.session.timeZone", "UTC")
    // Pig's skewed join (POSkewedJoin + PartitionSkewedKeys) → AQE skew
    // handling; Pig's bloom join (BuildBloom/Bloom) → runtime bloom filter.
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // Pig's FR join threshold analog (POFRJoin loads right side in
    // memory) — applied at the ADAPTIVE layer only, where the decision
    // uses REAL post-shuffle sizes. The static threshold is off: this
    // engine's join sides routinely sit behind HOF-explode aggregates
    // whose size ESTIMATES are garbage, and a statically planned
    // broadcast cannot be demoted by AQE — at sf10 n=5 the planner
    // elected to broadcast a 21M-row LM context table and the driver
    // died building it (r16; the same mid-scale window threatens any
    // corpus-sized aggregate whose estimate shrinks under the
    // threshold). Explicit broadcast() hints (replicated join) are
    // unaffected; genuinely small sides still broadcast one shuffle
    // later via AQE. Measured: gate medians unchanged at sf0.1, the
    // static-broadcast crash class eliminated at every scale.
    c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    c.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
      (64L << 20).toString)
    // The driver's events.parquet uses TIMESTAMP(NANOS) which Spark cannot
    // read natively — read as long and convert (see Relation.loadTable).
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Wide aggregations (e.g. 64 minhash min-aggs) exceed the default
    // codegen field cap and silently fall back to interpreted evaluation.
    c.set("spark.sql.codegen.maxFields", "500")
    // Custom logical rewrites (SURVEY §4.3): bag elision for size-only
    // consumers of collect_list groups; map-key pruning into JSON parses
    // (§4.1 ColumnMapKeyPrune analog); explode deferred past joins
    // (§4.1 PushDownForEachFlatten analog).
    spark.experimental.extraOptimizations =
      Seq(graft.plans.FuseBagSizeToCount, graft.plans.PruneJsonMapKeys,
          graft.plans.PushFlattenPastJoin, graft.plans.ExtractBatchPyUdfs)
    // Batched python-UDF evaluation (§2.7 scale path): the rule above
    // extracts graft_py_* calls into BatchPyEvalNode; this strategy
    // plans it (one wire round-trip per batch instead of per row).
    spark.experimental.extraStrategies =
      Seq(graft.plans.BatchPyEvalStrategy)
    spark
  }

  // -------------------------------------------------------------------
  // Scale knobs. A 100 TB operator's thresholds must be tunable per
  // session without a recompile — these read `spark.conf` (runtime-
  // settable) and fall back to the compiled, measured defaults:
  //   graft.cc.driverMaxEdges        (default 2^18; 0 forces the
  //                                   distributed star-contraction)
  //   graft.semdedup.targetCellSize  (default 256)
  //   graft.semdedup.kCap            (default 65536)
  //   graft.ivf.targetCellSize       (default 1024)
  //   graft.ivf.sampleSize           (default 65536)
  //   graft.bpe.vocabCap             (default 65536)
  //   graft.sparsejoin.maxKeys       (default 10000; 0 forces the
  //                                   bloom form over the In-seek)
  // An explicit method argument always wins over the conf.

  /** Read a long-valued graft.* knob from a session's conf. */
  def longConf(spark: SparkSession, key: String, default: Long): Long =
    spark.conf.getOption(key).map(_.trim.toLong).getOrElse(default)

  /** Same, against the active session (for call sites without a frame
    * in hand); absent an active session the default applies. */
  def longConf(key: String, default: Long): Long =
    SparkSession.getActiveSession
      .flatMap(_.conf.getOption(key)).map(_.trim.toLong)
      .getOrElse(default)

  // -------------------------------------------------------------------
  // Tracked persisted intermediates. SPLIT inputs and the dedup/LSH
  // shared subplans persist() so multi-consumer plans don't re-scan the
  // source — but an untracked persist leaks executor memory/disk for the
  // session's lifetime. Every persist in the library registers here;
  // harnesses (Bench/Verify between queries, PigRunner.close()) release
  // them. unpersist() is lazy-safe: a not-yet-materialized cache entry is
  // simply dropped.
  private val persisted =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, org.apache.spark.sql.DataFrame)]()
  private val persistSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Persist (MEMORY_AND_DISK) and register for later release. */
  def trackPersist(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persisted.add((persistSeq.incrementAndGet(), df))
    df
  }

  /** Checkpoint token for scoped release: [[unpersistSince]] with this
    * token frees only the entries registered AFTER it — so one runner's
    * close() can't drop caches belonging to other live runners/pipelines
    * sharing the session. */
  def mark(): Long = persistSeq.get()

  /** Release tracked intermediates registered after `token` (non-blocking).
    * Entries at or before the token are left persisted. */
  def unpersistSince(token: Long): Unit = {
    val it = persisted.iterator()
    while (it.hasNext) {
      val (seq, d) = it.next()
      if (seq > token) {
        try d.unpersist(blocking = false) catch { case _: Throwable => () }
        it.remove()
      }
    }
  }

  /** Release every tracked persisted intermediate (non-blocking). Intended
    * for harness boundaries (Bench/Verify between queries) where no other
    * pipeline is live; library callers should scope with [[mark]] +
    * [[unpersistSince]]. */
  def unpersistAll(): Unit = unpersistSince(0L)

  /** Standalone builder (tests, local runs). */
  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // dynamic confs are already set above; tune also registers the
    // custom optimizer rules (bag elision, map-key pruning)
    tune(s)
  }
}
