package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.operators.Rank
import graft.text.Dedup

/** Order-of-magnitude hardening checks (VERDICT r8 item 5): the 100 TB
  * design claims rest on sf0.1 + plan shape — these pin the two
  * consistency-critical operators at ~10M local rows, one notch up.
  *
  *  - Rank's 2-pass row number re-executes its input once per pass; the
  *    passes MUST agree on partitioning + intra-partition order. The
  *    shuffle-rooted path persists to force agreement (AQE re-plans at
  *    shuffle boundaries); a silent disagreement duplicates or skips
  *    ranks, which the permutation invariants below catch exactly.
  *  - simhash128's 32-bit bands exist precisely for the regime where the
  *    64-bit variant's 16-bit buckets saturate `maxBucket` and drop
  *    pairs; both variants run here IN that regime on the same planted
  *    corpus, pinning recall 1.0 for 128-bit and the documented
  *    degradation for 64-bit.
  */
class HardeningSpec extends SparkSpec {

  test("rank 2-pass: shuffle-rooted 10M-row input is an exact permutation " +
       "under AQE") {
    val n = 10_000_000L
    // repartition on a computed key = shuffle-rooted ⇒ the persist path
    // (shuffle output order races mapper completion without it)
    val df = spark.range(n)
      .select(col("id"), (col("id") % 1000).as("key"))
      .repartition(16, col("key"))
    val ranked = Rank.rowNumber(df, "r")
    val stats = ranked.agg(
      count(lit(1)).as("cnt"),
      countDistinct(col("r")).as("dst"),
      min(col("r")).as("mn"), max(col("r")).as("mx"),
      sum(col("r")).as("sm")).collect()(0)
    assert(stats.getLong(0) == n)
    assert(stats.getLong(1) == n)             // no duplicated rank
    assert(stats.getLong(2) == 1L)
    assert(stats.getLong(3) == n)             // no skipped rank
    assert(stats.getLong(4) == n * (n + 1) / 2)
  }

  test("rank 2-pass: shuffle-free 10M-row input (no persist) is an exact " +
       "permutation") {
    val n = 10_000_000L
    val df = spark.range(n)
      .select(col("id"), (col("id") * 37 % 9973).as("k"))
      .filter(col("id") >= 0) // narrow, deterministic ⇒ persist-free path
    val ranked = Rank.rowNumber(df, "r")
    val stats = ranked.agg(
      countDistinct(col("r")).as("dst"),
      min(col("r")).as("mn"), max(col("r")).as("mx")).collect()(0)
    assert(stats.getLong(0) == n && stats.getLong(1) == 1L &&
           stats.getLong(2) == n)
  }

  test("rank BY at 10M rows: dense and competition ranks are exact") {
    val n = 10_000_000L
    val perKey = 10_000L // 1000 keys × 10k rows
    val df = spark.range(n).select(col("id"), (col("id") % 1000).as("key"))
    // dense: key k (asc) has dense rank k+1
    val dense = Rank.rankBy(df, Seq((col("key"), true)), dense = true, "r")
    assert(dense.filter(col("r") =!= col("key") + 1).count() == 0L)
    // competition: key k starts at 1 + k*perKey (every key equally sized)
    val comp = Rank.rankBy(df, Seq((col("key"), true)), dense = false, "r")
    assert(comp.filter(col("r") =!= col("key") * perKey + 1).count() == 0L)
    assert(comp.count() == n)
  }

  test("simhash128 keeps recall 1.0 in the bucket regime where 64-bit " +
       "banding drops pairs") {
    val n = 2_000_000L
    val planted = 1000L
    val cap = 20 // E[16-bit bucket] = n/65536 ≈ 30.5 > cap ⇒ 64-bit drops;
                 // E[32-bit bucket] = n/2^32 ≈ 0.0005 ⇒ 128-bit keeps all
    val base = spark.range(n).select(col("id"),
      xxhash64(col("id")).as("simhash_lo"),
      xxhash64(col("id"), lit(1)).as("simhash_hi"))
    // planted near-dups: id+n flips ONE bit in each half of id's
    // signature (hamming 2 ≤ 3 in 128-bit space; 1 ≤ 3 in the lo half)
    val dups = spark.range(planted).select((col("id") + n).as("id"),
      xxhash64(col("id"))
        .bitwiseXOR(expr("shiftleft(cast(1 as bigint), cast(id % 64 as int))"))
        .as("simhash_lo"),
      xxhash64(col("id"), lit(1))
        .bitwiseXOR(expr("shiftleft(cast(1 as bigint), cast(id % 61 as int))"))
        .as("simhash_hi"))
    val sigs = base.unionAll(dups)
    val expected = planted // pairs (i, i+n), i < 1000

    val got128 = Dedup.simhashNearDups128(sigs, "id", maxDistance = 3,
        maxBucket = cap)
      .filter((col("id_a") % n) === (col("id_b") % n)) // the planted pairs
      .count()
    assert(got128 == expected,
      s"simhash128 recall ${got128.toDouble / expected} < 1.0 at cap=$cap")

    // same corpus, lo half only, same cap: the 64-bit variant's 16-bit
    // buckets saturate and recall collapses — the documented ceiling the
    // 128-bit variant exists to clear
    val got64 = Dedup.simhashNearDups(
        sigs.select(col("id"), col("simhash_lo").as("simhash")),
        "id", maxDistance = 3, maxBucket = cap)
      .filter((col("id_a") % n) === (col("id_b") % n))
      .count()
    assert(got64 < expected / 2,
      s"expected 64-bit recall to collapse at cap=$cap, got $got64/$expected")
  }

  test("dropRepeatedSpans at 1M docs: structural invariants and " +
       "determinism (ExactSubstr, r14)") {
    // ~16M tokens from a 50-word vocab: birthday math puts ~hundreds of
    // thousands of corpus-repeated 5-grams in play — real removal work,
    // generated entirely on executors
    val n = 1_000_000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", transform(
        sequence(lit(1), (pmod(col("id"), lit(13)) + 8).cast(IntegerType)),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(50)))))
        .as("text"))
    def run() = Dedup.dropRepeatedSpans(docs, "doc_id", "text", 5)
    val out = run()
    val toksO = graft.text.TextAnalysis.tokens(col("text"))
    val toksC = graft.text.TextAnalysis.tokens(col("clean_text"))
    // greedy subsequence match: clean tokens must be the original
    // tokens with some positions cut, in order — greedy consumption
    // finds a subsequence iff one exists
    val matched = aggregate(toksO, lit(0), (acc, t) =>
      when(acc < size(toksC) && element_at(toksC, acc + 1) === t, acc + 1)
        .otherwise(acc))
    val stats = docs.join(out, "doc_id").agg(
      count(lit(1)).as("cnt"),
      sum(col("removed_tokens")).as("removed"),
      count(when(
        col("removed_tokens") =!= (size(toksO) - size(toksC)), 1))
        .as("bad_count"),
      count(when(matched =!= size(toksC), 1)).as("bad_subseq"),
      expr("bit_xor(xxhash64(doc_id, clean_text))").as("fp")).head()
    assert(stats.getLong(0) == n)             // every doc survives
    assert(stats.getLong(2) == 0, "removed_tokens != token delta")
    assert(stats.getLong(3) == 0, "clean text not an ordered subsequence")
    assert(stats.getLong(1) > 100000L,        // the vocab guarantees work
      s"suspiciously few removals: ${stats.getLong(1)}")
    GraftSession.unpersistAll()
    // determinism: the whole (id, clean_text) relation fingerprints
    // identically on a fresh run
    val fp2 = run().agg(
      expr("bit_xor(xxhash64(doc_id, clean_text))")).head().getLong(0)
    assert(fp2 == stats.getLong(4))
    GraftSession.unpersistAll()
  }

  test("connectedComponents at 1M edges matches driver union-find exactly") {
    // deterministic pseudo-random graph over 400k nodes: ~600k random
    // edges + a 100k-node path (the adversarial-diameter shape) + 300k
    // isolated self-pairs. Star-contraction must converge (the operator
    // throws past its round cap) and agree with classic union-find.
    val nNodes = 400_000L
    val edges = spark.range(600_000)
      .select((pmod(hash(col("id")), lit(nNodes))).cast("long").as("id_a"),
              (pmod(hash(col("id") * 7 + 13), lit(nNodes))).cast("long").as("id_b"))
      .union(spark.range(100_000)
        .select((col("id") + 1_000_000L).as("id_a"),
                (col("id") + 1_000_001L).as("id_b")))
      .union(spark.range(300_000)
        .select((col("id") + 3_000_000L).as("id_a"),
                (col("id") + 3_000_000L).as("id_b")))
    val got = Dedup.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // driver union-find oracle (path-compressed, iterative)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.collect().foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonicalize union-find roots to component minima
    val minOf = parent.keys.groupBy(find).map { case (r, ks) => r -> ks.min }
    val want = parent.keys.map(k => k -> minOf(find(k))).toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("connectedComponents at 10M edges: converges within the log2 " +
       "bound and yields a consistent labeling") {
    // 10M edges: ~9M random over 3M nodes (supercritical — one giant
    // component) + a 500k-node path (adversarial diameter: min labels
    // must travel 500k hops, only possible in ~log2 rounds via star
    // contraction) + 500k isolated self-loop nodes. The exact 1M-edge
    // union-find oracle above pins semantics; here the oracle would be
    // driver-bound, so assert the structural invariants instead.
    val nNodes = 3_000_000L
    val pathLen = 500_000L
    val pathBase = 10_000_000L
    val isoBase = 20_000_000L
    val edges = spark.range(9_000_000)
      .select((pmod(hash(col("id")), lit(nNodes))).cast("long").as("id_a"),
              (pmod(hash(col("id") * 31 + 7), lit(nNodes))).cast("long").as("id_b"))
      .union(spark.range(pathLen)
        .select((col("id") + pathBase).as("id_a"),
                (col("id") + pathBase + 1).as("id_b")))
      .union(spark.range(500_000)
        .select((col("id") + isoBase).as("id_a"),
                (col("id") + isoBase).as("id_b")))
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(edges, "id_a", "id_b", maxIter = 30)
    val lab = labels.persist()
    // O(log n) measured: the 500k path needs ~log2(500k)=19 doubling
    // rounds; anything near-linear in the diameter would blow the cap
    assert(rounds <= 24, s"took $rounds rounds for a 500k-diameter graph")
    // fixpoint validity: every edge's endpoints carry the same label
    val crossEdges = edges.where(col("id_a") =!= col("id_b"))
      .join(lab.withColumnRenamed("id", "id_a")
                .withColumnRenamed("component", "ca"), "id_a")
      .join(lab.withColumnRenamed("id", "id_b")
                .withColumnRenamed("component", "cb"), "id_b")
      .where(col("ca") =!= col("cb")).count()
    assert(crossEdges == 0L, s"$crossEdges edges cross components")
    // the path collapses to ONE component labeled by its min node, and
    // every isolated self-loop node stays its own component
    val pathStats = lab.where(col("id") >= pathBase && col("id") < isoBase)
      .agg(countDistinct(col("component")).as("k"),
           min(col("component")).as("mn")).head()
    assert(pathStats.getLong(0) == 1L && pathStats.getLong(1) == pathBase)
    val isoOk = lab.where(col("id") >= isoBase)
      .where(col("component") =!= col("id")).count()
    assert(isoOk == 0L, s"$isoOk isolated nodes mislabeled")
    lab.unpersist()
  }

  test("BuildBloom at 10M keys: distributed build, zero false negatives, " +
       "bounded false positives") {
    // the aggregate build must hold at scale: 10M distinct member keys
    // through the partial-agg path (per-partition sketches merged), then
    // a full-scan probe. Members = even ids; probes = all ids — every
    // member must hit (bloom contract: no false negatives), and odd-id
    // hits stay under ~2× the configured 1% fpp.
    val n = 10_000_000L
    val members = spark.range(0, n, 2).select(col("id"))
    val b64 = members
      .select(graft.functions.BloomUdf.buildBloom(
        Seq(col("id")), Seq("Hash.MURMUR_HASH", (n / 2).toString, "0.01"))
        .as("bf"))
      .head().getString(0)
    val bytes = graft.functions.BloomUdf.mergedBytes(Seq(b64))
    val hits = spark.range(n)
      .select(col("id"),
        graft.functions.BloomUdf.probe(bytes, Seq(col("id"))).as("hit"))
      .agg(
        sum(when(col("id") % 2 === 0 && col("hit"), 1L).otherwise(0L))
          .as("even_hits"),
        sum(when(col("id") % 2 === 1 && col("hit"), 1L).otherwise(0L))
          .as("odd_hits")).collect()(0)
    assert(hits.getLong(0) == n / 2,
      s"false negatives: ${n / 2 - hits.getLong(0)} members missed")
    val fpRate = hits.getLong(1).toDouble / (n / 2)
    assert(fpRate < 0.02, f"false-positive rate $fpRate%.4f exceeds 2×fpp")
  }

  test("bm25 at 2M docs: query-vocab prune keeps the postings shuffle " +
       "proportional to matches, scores stay exact") {
    import spark.implicits._
    val n = 2_000_000L
    // vocabulary of 50 common words + 1 rare marker planted in 1k docs
    val words = (0 until 50).map(i => s"w$i")
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        element_at(typedlit(words), (col("id") % 50 + 1).cast("int")),
        element_at(typedlit(words), (col("id") % 7 + 1).cast("int")),
        when(col("id") % 2000 === 0, lit("needle")).otherwise(lit("w0")))
        .as("text"))
    val qs = Seq((1L, "needle")).toDF("query_id", "qtext")
    val out = graft.text.Retrieval.bm25TopK(
      docs, "doc_id", "text", qs, "query_id", "qtext", topK = 10)
      .collect()
    // 1000 docs contain the needle; top-10 returned, all needle docs,
    // deterministic doc-id tiebreak on the all-equal scores
    assert(out.length == 10)
    assert(out.forall(_.getLong(1) % 2000 == 0))
    assert(out.map(_.getLong(1)).sorted.toSeq ==
      (0L until 20000L by 2000L).toSeq)
    // every returned score is the same positive BM25 value
    assert(out.map(_.getDouble(3)).distinct.length == 1 &&
      out.head.getDouble(3) > 0)
  }

  test("ORDER USING ComparisonFunc at 4M rows: exact total order via " +
       "sampled range partitioning, distributed (no 1-partition sort)") {
    val n = 4_000_000L
    // xxhash-scrambled input so no pre-existing order helps
    val df = spark.range(n)
      .repartition(32, xxhash64(col("id")))
      .select(col("id").as("v"))
    val sorted = graft.functions.ComparatorSort.orderBy(
      df, Seq(col("v")), classOf[DescLongCmp].getName,
      new graft.functions.JarUdfs.Registry)
    assert(sorted.rdd.getNumPartitions > 1,
      "comparator sort must range-partition, not funnel to one task")
    // exact descending permutation: per-partition runs are internally
    // descending AND partition boundaries nest (range partitioning)
    val perPart = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var cnt = 0L; var first = Long.MinValue; var last = 0L
      var prev = Long.MaxValue; var ordered = true
      it.foreach { r =>
        val v = r.getLong(0)
        if (cnt == 0) first = v
        if (v >= prev) ordered = false
        prev = v; last = v; cnt += 1
      }
      Iterator.single((i, cnt, first, last, ordered))
    }.collect().filter(_._2 > 0).sortBy(_._1)
    assert(perPart.map(_._2).sum == n)
    assert(perPart.forall(_._5), "a partition is not internally sorted")
    // boundaries: partition i's last value > partition i+1's first
    perPart.sliding(2).foreach {
      case Array(a, b) => assert(a._4 > b._3,
        s"range boundary violated between partitions ${a._1} and ${b._1}")
      case _ => ()
    }
    assert(perPart.head._3 == n - 1 && perPart.last._4 == 0L)
  }

  test("StreamingDedup ingest at 100k-doc index / 50k-doc batches: " +
       "exact survivor counts across two batches") {
    import graft.text.DedupIndex
    import graft.streaming.StreamingDedup
    // text = 12 globally unique tokens derived from a content key, so
    // distinct keys never near-dup and equal keys are exact dups
    def textOf(key: org.apache.spark.sql.Column) = concat_ws(" ",
      (0 until 12).map(j =>
        concat(lit("w"), (key * 12 + lit(j)).cast("string"))): _*)
    val seed = spark.range(100000)
      .select(col("id").as("doc_id"), textOf(col("id")).as("text"))
    DedupIndex.write(seed, "doc_id", "text", "hsix")
    val out = java.nio.file.Files.createTempDirectory("hsd").toString
    // batch 1: even rows copy seed keys 0..24999, odd rows are novel
    val b1 = spark.range(50000).select(
      (col("id") + 1000000L).as("doc_id"),
      textOf(when(col("id") % 2 === 0, (col("id") / 2).cast("long"))
        .otherwise(col("id") + 200000L)).as("text"))
    StreamingDedup.ingestBatch(b1, 0L, "doc_id", "text", "hsix", out,
      threshold = 0.5)
    val s1 = spark.read.parquet(s"$out/ingest_batch=0")
    assert(s1.count() == 25000L)
    // batch 2: even rows copy batch-1 SURVIVOR keys (novel odd keys of
    // b1), odd rows novel — the index must have grown by the append
    val b2 = spark.range(50000).select(
      (col("id") + 2000000L).as("doc_id"),
      textOf(when(col("id") % 2 === 0, col("id") + 200001L)
        .otherwise(col("id") + 300000L)).as("text"))
    StreamingDedup.ingestBatch(b2, 1L, "doc_id", "text", "hsix", out,
      threshold = 0.5)
    assert(spark.read.parquet(s"$out/ingest_batch=1").count() == 25000L)
    assert(spark.table("hsix_ingestlog").count() == 2L)
  }
}

class JarAggHardeningSpec extends SparkSpec {
  // a 5M-row corpus with ONE dominant group (4M rows in group 0): the
  // bag path would materialize a 4M-element array in one task — the
  // fused/streamed paths must not
  private def skewed(n: Long) = {
    import org.apache.spark.sql.functions._
    spark.range(n).select(
      when(col("id") % 5 =!= 0, lit(0L))
        .otherwise(col("id") % 1000).as("k"),
      col("id").as("v"))
  }

  test("Algebraic jar UDF at 5M rows with a 4M-row group: partial " +
       "aggregation, exact sums, no bag") {
    val df = skewed(5_000_000L)
    import org.apache.spark.sql.functions._
    // the facade trio straight through AlgebraicAgg (the frontend spec
    // covers script dispatch; this pins the 100 TB-regime execution)
    val got = graft.functions.AlgebraicAgg.columnFor(
      new graft.functions.JarUdfs.Registry, classOf[HardAlgSum].getName,
      Seq.empty, Seq(col("v")), Seq(org.apache.spark.sql.types.LongType))
    assert(got.isEmpty, "empty registry must not resolve")
    // classpath resolution goes through the same instantiation path —
    // drive the Aggregator via a scripted jar in ScriptingUdfSpec; here
    // exercise the CORE directly at volume through a private-API-free
    // equivalent: register the class via a jar built from the compiled
    // test classpath
    val clsDir = classOf[HardAlgSum].getProtectionDomain
      .getCodeSource.getLocation.getPath
    val tmp = java.nio.file.Files.createTempDirectory("hardalg").toFile
    val jar = new java.io.File(tmp, "hard.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    Seq("graft/HardAlgSum.class", "graft/HardAlgSum$HInit.class",
        "graft/HardAlgSum$HInter.class", "graft/HardAlgSum$HFin.class",
        "graft/HardAccSum.class").foreach { n =>
      jos.putNextEntry(new java.util.jar.JarEntry(n))
      jos.write(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(clsDir, n)))
      jos.closeEntry()
    }
    jos.close()
    val reg = new graft.functions.JarUdfs.Registry
    graft.functions.JarUdfs.register(reg, spark, jar.getPath)
    val aggCol = graft.functions.AlgebraicAgg.columnFor(
      reg, "graft.HardAlgSum", Seq.empty, Seq(col("v")),
      Seq(org.apache.spark.sql.types.LongType)).get
    val rows = df.groupBy(col("k")).agg(aggCol.as("s"))
    assert(!rows.queryExecution.executedPlan.toString.contains("collect_list"))
    val got2 = rows.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.groupBy(col("k"))
      .agg(sum(col("v")).as("s")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got2 == want)

    // Accumulator streaming over the same skewed corpus
    val call = graft.functions.AccumulatorStream.Call(
      None, classOf[HardAccSum].getName, Seq.empty, "s",
      Seq(graft.functions.AccumulatorStream.BagArg(0)), "hard_acc",
      new java.util.HashMap[String, java.util.Properties]())
    val streamed = graft.functions.AccumulatorStream.fuse(
      df, col("k"), org.apache.spark.sql.types.LongType,
      Seq((call, Seq(col("v")), org.apache.spark.sql.types.LongType)))
    val got3 = streamed.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got3 == want)
  }

  test("HiveUDAF at 5M rows with a 4M-row group: PARTIAL1/merge/FINAL " +
       "partial aggregation, exact results, no bag") {
    import org.apache.spark.sql.functions._
    val df = skewed(5_000_000L)
    val aggCol = graft.functions.HiveUdfs.udafAggColumn(
      "avg", Seq(col("v")), Seq(org.apache.spark.sql.types.LongType)).get
    val rows = df.groupBy(col("k")).agg(aggCol.as("m"))
    assert(!rows.queryExecution.executedPlan.toString.contains("collect_list"))
    val got = rows.collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toMap
    val want = df.groupBy(col("k")).agg(avg(col("v")).as("m")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6))).toMap
    // k ∈ {0} ∪ {multiples of 5 < 1000} → 200 groups
    assert(got == want && got.size == 200)
  }

  test("IteratingAccumulator at 5M rows with a 4M-row group: exec " +
       "streams through the bounded queue; Terminating early-exits") {
    val df = skewed(5_000_000L)
    import org.apache.spark.sql.functions._
    def mkCall(cls: String, out: String) =
      graft.functions.AccumulatorStream.Call(
        None, cls, Seq.empty, out,
        Seq(graft.functions.AccumulatorStream.BagArg(0)), "hard_" + out,
        new java.util.HashMap[String, java.util.Properties]())
    val streamed = graft.functions.AccumulatorStream.fuse(
      df, col("k"), org.apache.spark.sql.types.LongType,
      Seq((mkCall(classOf[HardIterCount].getName, "c"),
            Seq(col("v")), org.apache.spark.sql.types.LongType),
          (mkCall(classOf[HardTermCalls].getName, "t"),
            Seq(col("v")), org.apache.spark.sql.types.LongType)))
    val want = df.groupBy(col("k")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = streamed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == want.size)
    got.foreach { case (k, c, t) =>
      // every tuple of the 4M-row group crossed the queue into exec
      assert(c == want(k), s"group $k: iterating count $c != ${want(k)}")
      // the terminating accumulator saw exactly ONE 1024-row chunk —
      // ~3,905 chunks of the dominant group were skipped
      assert(t == 1L, s"group $k: terminating accumulator saw $t chunks")
    }
  }
}

/** Reference-shaped Algebraic sum used by JarAggHardeningSpec. */
class HardAlgSum extends org.apache.pig.EvalFunc[java.lang.Long]
    with org.apache.pig.Algebraic {
  import org.apache.pig.data.{DataBag, Tuple}
  private def sumBag(input: Tuple): java.lang.Long = {
    val b = input.get(0).asInstanceOf[DataBag]
    var s = 0L
    val it = b.iterator()
    while (it.hasNext) {
      val v = it.next().get(0)
      if (v != null) s += v.asInstanceOf[Number].longValue
    }
    Long.box(s)
  }
  override def exec(input: org.apache.pig.data.Tuple): java.lang.Long =
    sumBag(input)
  override def getInitial: String = classOf[HardAlgSum.HInit].getName
  override def getIntermed: String = classOf[HardAlgSum.HInter].getName
  override def getFinal: String = classOf[HardAlgSum.HFin].getName
}
object HardAlgSum {
  import org.apache.pig.data.{DataBag, Tuple}
  class HInit extends org.apache.pig.EvalFunc[java.lang.Long] {
    override def exec(input: Tuple): java.lang.Long = {
      val v = input.get(0).asInstanceOf[DataBag].iterator().next().get(0)
      if (v == null) null else Long.box(v.asInstanceOf[Number].longValue)
    }
  }
  class HInter extends org.apache.pig.EvalFunc[java.lang.Long] {
    override def exec(input: Tuple): java.lang.Long = {
      val b = input.get(0).asInstanceOf[DataBag]
      var s = 0L
      val it = b.iterator()
      while (it.hasNext) {
        val v = it.next().get(0)
        if (v != null) s += v.asInstanceOf[Number].longValue
      }
      Long.box(s)
    }
  }
  class HFin extends HInter
}

/** Accumulator sum used by JarAggHardeningSpec. */
class HardAccSum extends org.apache.pig.AccumulatorEvalFunc[java.lang.Long] {
  import org.apache.pig.data.{DataBag, Tuple}
  private var sum = 0L
  override def accumulate(input: Tuple): Unit = {
    val b = input.get(0).asInstanceOf[DataBag]
    val it = b.iterator()
    while (it.hasNext) {
      val v = it.next().get(0)
      if (v != null) sum += v.asInstanceOf[Number].longValue
    }
  }
  override def getValue: java.lang.Long = Long.box(sum)
  override def cleanup(): Unit = { sum = 0L }
}

/** IteratingAccumulatorEvalFunc counting every streamed tuple — pins
  * the bounded-queue worker path at multi-million-row group size. */
class HardIterCount
    extends org.apache.pig.IteratingAccumulatorEvalFunc[java.lang.Long] {
  override def exec(it: java.util.Iterator[org.apache.pig.data.Tuple])
      : java.lang.Long = {
    var n = 0L
    while (it.hasNext) { it.next(); n += 1 }
    Long.box(n)
  }
}

/** TerminatingAccumulator reporting how many accumulate() chunks it
  * received; finished after the first. */
class HardTermCalls
    extends org.apache.pig.AccumulatorEvalFunc[java.lang.Long]
    with org.apache.pig.TerminatingAccumulator[java.lang.Long] {
  private var calls = 0L
  override def accumulate(input: org.apache.pig.data.Tuple): Unit =
    calls += 1
  override def isFinished: Boolean = calls > 0
  override def getValue: java.lang.Long = Long.box(calls)
  override def cleanup(): Unit = { calls = 0L }
}

/** Classpath-resolved comparator for the hardening test (the jar path
  * is exercised by ScriptingUdfSpec/E2eSpec). */
class DescLongCmp extends org.apache.pig.ComparisonFunc {
  override def compare(t1: org.apache.pig.data.Tuple,
                       t2: org.apache.pig.data.Tuple): Int =
    java.lang.Long.compare(
      t2.get(0).asInstanceOf[java.lang.Long],
      t1.get(0).asInstanceOf[java.lang.Long])
}
