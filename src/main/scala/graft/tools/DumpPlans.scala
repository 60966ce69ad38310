package graft.tools

import java.nio.file.{Files, Paths}


/** Writes PLANS.md: formatted physical plans for the headline queries —
  * the evidence that the scale-critical properties asserted in PlanSpec
  * (pushdown, broadcast, partial agg, top-k, no spurious exchanges) hold
  * in the actual plans. Run: sbt "runMain graft.tools.DumpPlans". */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, 8)
    val dir = "/root/testdata/sf0.01"
    val interesting = Seq(
      "q01_filter" -> "filter + column pruning pushed to parquet",
      "q03_group_agg" -> "fused group-agg: partial aggregation, no bags",
      "q05_group_bag" -> "size-only bag consumer fused to count (custom rule)",
      "q06_nested_foreach" -> "nested ORDER+LIMIT as windowed top-k",
      "q08_join_broadcast" -> "replicated join -> BroadcastHashJoin",
      "q14_rank" -> "RANK BY via distinct-key prefix sum, no hot-key window",
      "q26_antijoin" -> "COGROUP+IsEmpty idiom -> LeftAnti",
      "q38_map_lookup" -> "map-key pruning: from_json parses a 1-key struct",
      "q43_minhash_neardups" -> "minhash: grams built in-row (no per-token exchange anywhere), partial min-agg, banded pairs",
      "q44_simhash_neardups" -> "simhash: native simhash_sign expression — ZERO exchanges before the banded self-join",
      "q46_ann_brute" -> "ANN brute force: codegen cosine + TakeOrdered",
      "q62_embedding_neardup" -> "embedding near-dup: LSH bucket keys in-row, bucket-keyed exchange only, cosine verify per bucket",
      "q61_multi_distinct" -> "multi-distinct aggregation (expand)",
      "q74_merge_sparse" -> "merge-sparse SEEK: probe keys pushed into the big-side scan (PushedFilters: In — row-group skipping) + SortMergeJoin; bloom form above graft.sparsejoin.maxKeys",
      "q75_interval_join" -> "interval join: event-time-bounded range condition on equality keys",
      "q77_salted_skew" -> "salted skew: (key,salt) partial stage then key-final merge",
      "q78_simhash128" -> "simhash-128: two simhash_sign halves, still zero pre-banding exchanges",
      "q80_dedup_clusters" -> "near-dup clusters: banded candidate pairs -> CC (driver union-find fast path at this scale; distributed star rounds above the edge threshold)",
      "q91_bm25" -> "BM25: query-vocab broadcast prune below the tf partial agg, WindowGroupLimit top-k",
      "q92_lm_score" -> "bigram LM: partial-agg count training, broadcast V, gram-keyed scoring join",
      "q93_semdedup" -> "semdedup: exactly ONE cell-keyed exchange feeds the per-cell kernel (centroid fit is a bounded driver sample)",
      "q94_seq_pack" -> "sequence packing: one per-stratum hash-partitioned window sort",
      "q97_py_udf" -> "python UDFs: BatchPyEvalExec (one wire round-trip per 128-row batch, both udfs on one node)",
      "q98_jar_udf" -> "jar EvalFunc dispatch: plain codegen'd ScalaUDF projection, no shuffle",
      "q100_repeated_ngrams" -> "repeated n-grams: shared gram stream persisted (InMemoryTableScan x2, ONE parquet scan), gram-hash shuffle only",
      "q101_dsir_weights" -> "DSIR: 64-bit-hashed gram keys, recompute-over-persist (measured cheaper at 10x/100x), one gram-keyed partial-agg count (raw+target in one aggregate), 1-row totals broadcast",
      "q102_gopher_rules" -> "Gopher rules: zero-shuffle per-row flags, single pruned scan",
      "q103_drop_repeated_spans" -> "ExactSubstr: occurrence stream repartitioned by gram hash then persisted — canonical agg AND join-back reuse that one exchange; text shuffles exactly once (the final id-keyed rewrite join)",
      "q105_dedup_index" -> "incremental dedup: batch ingest filter against the persisted bucketed index — index-side joins read exchange-free on their bucketing keys (digest / band,bucket / id), only the batch shuffles",
      "q106_bpe" -> "BPE: ONE word-histogram shuffle (partial count below the exchange) trains on the driver; encode is a shuffle-free projection (memoized udf) feeding two single-row aggregates",
      "q107_mixture" -> "mixture resampling: one hash-partitioned window per stratum (rank over the in-row LCG mix), codegen CASE quota filter — no global sort",
      "q110_ppl_buckets" -> "perplexity buckets: the q92 LM shape (gram-hash partial-agg counts, broadcast vocab size) + one per-language ntile window over the rounded score",
      "q111_warc" -> "WARC ingest: ONE task per shard file (binaryFiles — gzip members are not splittable; a 100 TB crawl is ~100k shards of file-level parallelism), records streamed off the shard, verify joins on the extracted id",
      "q113_warc_http" -> "WARC + HTTP envelope strip: the same file-grain scan; stripHttp and the body HTML extraction are shuffle-free projections (binary-decode UDF + codegen regex) — the whole crawl front end runs at scan speed",
      "q114_script_tokens" -> "script-aware tokens: zero-shuffle pure-Column projection (two boundary-insertion regexes + the whitespace split), single pruned scan",
      "q115_boilerplate" -> "boilerplate removal: zero-shuffle regex+HOF projection — block split, per-block density scoring, rejoin, all in one stage",
      "q116_trigram_lm" -> "trigram LM: the q92 shape at n=3 — context/gram keys are xxhash64 over token hashes, so the count shuffles and scoring joins stay at 8 bytes/key at ANY order",
      "q118_charset_decode" -> "charset decode: the q113 scan + one more shuffle-free scalar projection (header-param/meta-sniff/UTF-8 resolution inside the decode UDF)",
      "q119_meta_robots" -> "robots noindex: zero-shuffle per-row meta-tag regex battery, single pruned scan",
      "q120_normalize_unicode" -> "unicode normalize: two codegen strip regexes + the NFC scalar UDF, zero shuffle",
      "q121_temperature_mix" -> "temperature mixture: ONE bounded stratum-count aggregate resolves the quotas on the driver; selection is the q107 per-stratum window rank — no global sort",
      "q122_domain_quality" -> "domain quality: one domain-keyed partial-agg shuffle over (domain, per-doc score); the per-doc score is one tokenization + one traversal (stopword ratio via aggregate-with-finish — the size(filter)/size form re-ran tokens() 3x)")

    // Shapes that a physical-plan dump can NOT show: driver-coordinated
    // iteration (q112's training loop) and RDD-level selection (q117's
    // calibration). Pinned here as prose next to the dumps they relate
    // to — the claims PlanSpec/HardeningSpec assert behaviorally.
    val prose = Seq(
      "q112_quality_classifier (training loop — the one non-Catalyst iteration in the repo)" ->
        """The gradient-descent loop is driver-COORDINATED but never
          |driver-RESIDENT:
          | - features are built once (one explode + two-level count
          |   aggregation; the shuffle carries (id, bin) pairs and a
          |   count, never text) and PERSISTED — each of the 30 steps is
          |   one map+reduce pass over that cached frame, re-reading no
          |   parquet;
          | - each step broadcasts the weight vector (numBins+1 = 4097
          |   doubles, ~32 KB) and treeAggregates the gradient — the
          |   driver holds exactly two such vectors at any moment, no
          |   per-row data ever collects;
          | - scoring is a shuffle-free projection over the same feature
          |   rows (closure-captured weights).
          |At 1000 executors the per-step cost is one pass over the
          |cached features + a tree reduction of 32 KB vectors — the
          |textbook distributed-GD shape. AUC is eval machinery (one
          |bounded global window), never a production path.""".stripMargin,
      "q117_classifier_persist (calibration — exact k-th statistic without a global window)" ->
        """calibrateThreshold needs the exact k-th largest score (a keep
          |rate is a hard corpus budget — approxQuantile's error bound
          |would be a silent size drift). Shape: project the 8-byte
          |score column, RANGE-partitioned sortBy (a distributed total
          |sort, the same primitive ORDER BY uses), zipWithIndex (one
          |count pass per partition), filter rank k-1, collect ONE row.
          |No single-partition window, no driver-side score array —
          |the driver receives exactly one double. Weight save/load is
          |a numBins+1-row catalog table (bounded by model size, never
          |corpus size).""".stripMargin,
      "q123_image_dedup (perceptual-hash image near-dup — the q43 of the multimodal stack)" ->
        """Decode + dHash is a partition-preserving mapPartitions over
          |(img_id, payload) — zero shuffle, the payload column prunes
          |away for downstream consumers of the 8-byte signature. The
          |pair search is LITERALLY Dedup.simhashNearDups on the dhash
          |column: 4×16-bit pigeonhole bands, capped buckets, optional
          |bit-flip multi-probe — one exchange of (id, band, bucket)
          |rows, never a payload. At 100 TB of images the heavy bytes
          |stay in the scan stage; everything that shuffles is 8-byte
          |hashes + ids. Undecodable payloads carry null hashes (they
          |can never pair) instead of killing tasks. r17: the gate adds
          |a JPEG-recompressed twin (lossy re-encode, NOT a designed-in
          |invariance) and the banding pass runs multiProbe at
          |maxDistance 8 — one-bit-flip probes make recall to Hamming
          |11 GUARANTEED, which is also the jpeg_near pin (one
          |structural claim, not a bare empirical max — the measured
          |q=0.75 drift crept 5→7 bits from 3k to 50k seeds); exact
          |twins still assert hamming == 0 on the same single pass,
          |and maxBucket rides at 17000 (the q104 precedent) because
          |probes multiply bucket load ~17×.""".stripMargin,
      "q124_fivegram_lm (CCNet's production LM order)" ->
        """Same plan as q116 one order up: two count shuffles whose keys
          |are 8-byte hashes at ANY n (xxhash64 over the in-row token-
          |hash slice), so the 5-gram table costs the same bytes/key as
          |the bigram's — the context table simply has more ROWS (4-gram
          |contexts approach one per token position; see BASELINE.md r16
          |scale deltas for the measured growth). Both scoring probes —
          |and DSIR's — carry shuffle_hash hints: the count tables are
          |corpus-sized behind garbage-estimate HOF-explode aggregates,
          |and a statically planned broadcast of one (21M rows at sf10
          |n=5) killed the driver before the r16 pin.""".stripMargin,
      "q127_audio_dedup (envelope + chromaprint-lite fingerprints — the q123 of the audio column)" ->
        """Decode + fingerprint is the same partition-preserving batch
          |pass as imageSignatures — zero shuffle, the WAV bytes never
          |leave the scan stage; ONE decode now emits BOTH 64-bit
          |fingerprints (afp envelope contour, cfp chromaprint-lite:
          |silence-trim → 49 frames → Goertzel 12-bin chroma fold +
          |energy transitions). The pair search is the SAME
          |Dedup.simhashNearDups banding per fingerprint; undecodable
          |clips carry null fingerprints and can never pair. The
          |robustness matrix is measured, not assumed (3000 seeds,
          |MeasureMediaTwins): afp is EXACT under re-rate/re-gain but
          |shift-fragile (21-46 bits under 0.25 s leading silence); cfp
          |is EXACT under leading silence (it trims away) but
          |approximate under re-rate (≤16 bits — phase noise in the
          |energy-transition half). Default afp (4× cheaper, 66 vs 264
          |µs/payload); re-encode-heavy corpora band on both and union
          |the pairs. Gate cost note: q127's bench time is dominated by
          |in-gate WAV synthesis (~2000 samples/doc rendered per
          |variant), not the operator — the fingerprint itself is a
          |µs-scale scan-stage scalar.""".stripMargin,
      "q132_video_dedup (temporal majority-bit fingerprint — the video leg of the media-dedup triad)" ->
        """Video coverage is pure JVM: AVI/MJPEG parses by hand (RIFF
          |chunk walk → movi list → JPEG frames through ImageIO) and
          |animated GIF through ImageIO's multi-image reader;
          |inter-frame-predicted codecs (H.264/VP9 in mp4/webm) stay at
          |the documented batch-boundary swap-in. The fingerprint
          |samples ≤16 frames at an INTEGER stride, dHashes each, and
          |majority-votes per bit — exact under frame duplication (the
          |rate-resample class; integer stride picks each source frame
          |once, measured 0 bits on all 3000 seeds) and robust to
          |per-frame JPEG noise (a minority flip never reaches
          |majority; GIF-vs-MJPEG container twin measured max 7 bits,
          |pinned at 11 = the multiProbe banding recall radius). Same
          |scale shape as q123/q127: decode is a partition-preserving
          |mapPartitions, payload bytes never leave the scan stage,
          |one banding pass shuffles (id, band, 8-byte vhash) rows at
          |maxBucket 17000, and Bench times the operator over an
          |epoch-materialized video corpus (the q130 split).
          |
          |Scale envelope, measured not assumed (BASELINE r17): the
          |64-bit symmetric multi-probe join carries an n²/2^16
          |candidate term per band — linear decades to ~10^5
          |signatures, measurably superlinear at 150k (sf1). The
          |ceiling is not a wall: dHash128/videoFingerprint128 (lo
          |half bit-identical to the 64-bit hashes) ride
          |simhashNearDups128's 4×32-bit bands, n²/2^32 — negligible
          |to ~10^8 per shard. The trade is recall shape: 64-bit
          |multiProbe GUARANTEES recall to Hamming 11 (covers every
          |measured re-encode class with margin); 128-bit guarantees
          |7 with a measured thin tail beyond it (image JPEG drift
          |max 8/3000 at 2× the bit budget). Corpus size picks the
          |operator; both are tested and measured.""".stripMargin,
      "q133_media_index (persisted 64-bit-signature ingest index — the q105 of the multimodal stack)" ->
        """SigIndex persists the 4×16-bit chunk banding of any 64-bit
          |Hamming signature (image dHash, audio envelope/chroma, video
          |temporal hash, text SimHash) into bucketed tables: _sigs(id,
          |sig) by id, _sigbuckets(id, band, bucket) by (band, bucket),
          |merge-bumped _sigbucketcounts for the hot-bucket cap, _meta
          |for the family. Ids + 8-byte longs only — old payloads are
          |never stored and never rescanned. An ingest batch
          |fingerprints in ITS scan stage, multi-probes (1-bit flips,
          |batch side only) against the index's exact chunks — recall
          |GUARANTEED to Hamming 7 (4 bands pigeonhole ≤ ⌊d/4⌋ flips
          |into some band; probe radius 1 covers it; enforcing
          |maxDistance ≤ 7 is a loud require, not a silent recall
          |cliff) — and Hamming-verifies candidates against _sigs. The
          |index side reads exchange-free on its bucketing keys; only
          |the batch shuffles. append() is O(batch): inserts into the
          |bucketed tables plus a counts merge-bump, the DedupIndex
          |shape. The q133 gate: a 1500-image corpus indexes, a batch
          |of JPEG re-encodes of indexed images (drift ≤ 7 measured =
          |the guarantee radius, so 'caught' is structural) + novel
          |patterns filters through dropDupsAgainst; expected outcome
          |is doc_id arithmetic the oracle derives independently.""".stripMargin,
      "q129_token_shards (global prefix sum without a global window)" ->
        """Equal token MASS per shard needs a global cumulative sum; a
          |Window.orderBy would collapse to one partition. Shape: the
          |thin (id, mix, n_tokens) projection range-shuffles into the
          |seeded total order and persists; per-partition sums collect
          |(numPartitions longs — the Rank/POCounter side channel);
          |offsets broadcast back onto a pid-local running-sum window;
          |shard = quotient of the exclusive prefix. Full rows shuffle
          |exactly once (the id-keyed assignment join). Reproducible
          |across cluster sizes: the prefix follows the total (mix, id)
          |order, never partition boundaries.""".stripMargin,
      "q125_boilerplate_pr (labeled precision/recall regression gate)" ->
        """Same zero-shuffle scan-speed projection as q115 (the block
          |fold computes each block's text once into a struct); the P/R
          |columns are instr() probes over the extractor's own
          |clean_text — no extra pass, no join. The gate exists so a
          |threshold change that leaks a nav bar or eats a paragraph
          |flips a pinned verdict instead of shipping.""".stripMargin,
      "q128_gpt2_encode / q130_crawl_clean (r16 composition gates)" ->
        """Both are scan-speed compositions with hash-level anchors.
          |q128: two shuffle-free GPT-2 encodes (empty-merge + merged
          |vocabularies) + a byte-decode roundtrip per doc feeding one
          |single-row aggregate; the anchor is byte-exact (DuckDB's
          |sum(strlen) must equal the empty-merge token total). q130:
          |the whole crawl front end in one call — strip/decode UDFs +
          |extraction/quality HOFs — with the extraction chain and the
          |language detector let2-BOUND once per row
          |(TextAnalysis.bound/withLangBound; unbound, alias
          |substitution re-ran the extraction battery ~8x per row —
          |33 -> 8.7 s at sf0.1, values hash-identical). The one-call
          |form is the STREAMING path; batch materializes the same
          |stages through Pipeline.run (BASELINE.md r16 pipeline
          |stamp).""".stripMargin,
      "q126_multilingual_quality (language-keyed quality signals)" ->
        """langId, the keyed stopword ratio, the keyed composite score,
          |and the keyed Gopher battery are all pure-Column projections —
          |zero shuffle, one pruned scan. The stopword tables ride the
          |plan as array literals selected by a when-chain on the lang
          |column (a ~10-way string CASE per row, no broadcast join
          |needed at this table size); every regex branch is a LITERAL
          |pattern, compiled once, never a per-row pattern column. The
          |lang argument is let2-BOUND inside every keyed signal — an
          |embedded langId(text) would otherwise re-run the detector per
          |token inside the folds (measured 128.6 s → 3.0 s at sf0.1 on
          |the q126 shape).""".stripMargin,
      "Pipeline.run (restartable batch composition — the shape between the per-query plans)" ->
        """Each stage materializes to parquet under workDir/NN_name and
          |the next stage reads it back. Two measured reasons this is
          |the batch shape (r16 pipeline stamp): composing many
          |HOF-heavy stages into ONE Catalyst tree blows up
          |OPTIMIZATION itself (CollapseProject substitution spun the
          |driver for minutes before a task ran), and the handoff is
          |what makes a multi-hour 100 TB run restartable. fanOut
          |repartitions every stage output — a single-file intermediate
          |otherwise collapses narrow per-row stages to parallelism ONE
          |(one parquet row group = one read task; the filter stage ran
          |198 s at sf1 before this). Resume: _SUCCESS marks a stage
          |complete; a recomputed stage invalidates everything
          |downstream in cascade. r17 adds logic fingerprints — each
          |stage dir stores a SHA-256 of its canonicalized ANALYZED
          |plan (JVM-run-dependent lambda/identity tokens normalized),
          |so editing a threshold or predicate without renaming the
          |stage recomputes it and its downstream instead of silently
          |serving the stale checkpoint; closure-body edits remain the
          |caller's invalidation (they are not in the plan), and
          |fingerprints=false restores marker-only resume for stages
          |with eager driver-side constructors.""".stripMargin)
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of headline queries (sf0.01)\n\n")
    sb.append("Generated by `graft.tools.DumpPlans`; properties asserted " +
      "in `PlanSpec`.\n")
    interesting.foreach { case (name, why) =>
      // benchQueries = the PRODUCTION forms (near-dup pipelines
      // without their quadratic exact twins; q105's steady-state
      // ingest filter) — the plans whose scale shape matters
      val df = graft.SparkEntry.benchQueries(name)(spark, dir)
      sb.append(s"\n## $name — $why\n\n```\n")
      // elide long INSET / pushed-In literal lists (the q74 seek keys
      // are thousands of values — they'd eat the whole excerpt budget)
      val txt = df.queryExecution.executedPlan.toString
        .replaceAll("(INSET [^)\\n]{60})[^)\\n]*", "$1 …<keys elided>")
        .replaceAll("(In\\([\\w.]+, \\[[^\\]\\n]{60})[^\\]\\n]*", "$1 …<keys elided>")
      sb.append(txt.take(4000))
      sb.append("\n```\n")
    }
    prose.foreach { case (title, body) =>
      sb.append(s"\n## $title\n\n$body\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
