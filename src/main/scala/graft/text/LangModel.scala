package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N-gram language-model scoring — the CCNet/KenLM-style quality signal:
  * score each document by the average negative log-likelihood of its
  * bigrams under a count-based LM with add-one smoothing. Low scores =
  * fluent, in-distribution prose; high scores = gibberish, boilerplate,
  * wrong-language text. The standard corpus-curation quality axis next to
  * the heuristic ratios in [[TextAnalysis]].
  *
  *   nll(w1 w2) = -ln( (C(w1 w2) + 1) / (C(w1) + V) )
  *
  * Shape at 100 TB:
  *  - training = two partial-agg shuffles (unigram + bigram counts), the
  *    classic combinable word count — never wider than the gram vocabulary;
  *  - V (vocabulary size) is a 1-row aggregate broadcast back, no driver
  *    collect;
  *  - scoring joins the per-doc bigram stream against the count tables on
  *    the gram key — sort-merge at web-scale vocabularies, broadcast when
  *    the LM is small (AQE decides); unknown grams (scoring under a
  *    reference LM) smooth to count 0 instead of failing;
  *  - the per-doc average is a final partial agg on doc_id.
  *
  * Determinism across engines: the score is round(avg,6); each nll value
  * is identical on both sides, so only summation-order ulp noise is in
  * play — far below the rounding grain.
  */
object LangModel {

  private def toks(textCol: String) =
    TextAnalysis.tokens(lower(col(textCol)))

  /** (w1, gram) pairs for each adjacent token pair of `t`. */
  private def bigrams(t: org.apache.spark.sql.Column) =
    zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => struct(a.as("w1"), concat_ws(" ", a, b).as("gram")))

  /** Per-doc bigram-LM score — [[ngramScore]] at n = 2 with the
    * historical column name. Output: (doc_id, n_bigrams, avg_nll) —
    * docs with < 2 tokens get n_bigrams = 0 and a null score. */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
                  train: Option[DataFrame] = None,
                  trainTextCol: String = "text"): DataFrame =
    ngramScore(docs, idCol, textCol, 2, train, trainTextCol)
      .withColumnRenamed("n_grams", "n_bigrams")

  /** All (n-1)-gram context hashes of token-hash array `th` (ALL
    * positions, including the document-final ones that never head a
    * full n-gram — the context count is an occurrence count, exactly
    * the unigram table of the bigram model generalized). */
  private def contextHashes(th: org.apache.spark.sql.Column, n: Int) =
    when(size(th) >= n - 1,
      transform(sequence(lit(1), size(th) - (n - 2)), i =>
        xxhash64((0 until n - 1).map(j => element_at(th, i + lit(j))): _*)))
      .otherwise(array().cast(ArrayType(LongType)))

  /** (context hash, gram hash) for each n-gram position of `th`. */
  private def gramHashes(th: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(1), size(th) - (n - 1)), i =>
      struct(
        xxhash64((0 until n - 1).map(j =>
          element_at(th, i + lit(j))): _*).as("ctx"),
        xxhash64((0 until n).map(j =>
          element_at(th, i + lit(j))): _*).as("g")))

  /** Per-doc n-gram-LM score under add-one smoothing — the CCNet
    * recipe generalized from the bigram form to configurable n (the
    * real CCNet filter is a 5-gram KenLM):
    *
    *   nll(w1…wn) = -ln( (C(w1…wn) + 1) / (C(w1…wn-1) + V) )
    *
    * with V = the distinct UNIGRAM vocabulary (the classic add-one
    * denominator at every order) and context counts over all
    * (n-1)-gram occurrences. `train` defaults to `docs` itself; pass
    * a reference corpus to score under a fixed LM (unknown grams
    * smooth to count 0). Output: (doc_id, n_grams, avg_nll); docs
    * with < n tokens get n_grams = 0 and a null score.
    *
    * Scale shape, unchanged from the bigram form: tokens are hashed
    * IN-ROW and grams travel as xxhash64 over n token hashes (the
    * repeatedNgramStats hash-of-hashes discipline) — both count
    * shuffles and both scoring joins carry 8-byte keys at ANY n,
    * where a 5-gram STRING key would be ~5× a unigram. V is a 1-row
    * broadcast. Two grams colliding in 64-bit space is the standing
    * accepted caveat. */
  def ngramScore(docs: DataFrame, idCol: String, textCol: String,
                 n: Int,
                 train: Option[DataFrame] = None,
                 trainTextCol: String = "text"): DataFrame = {
    require(n >= 2, s"ngramScore needs n >= 2 (got $n)")
    // ONE tokenization pass (r18, the q43 two-consumers audit): the
    // token-hash stream feeds the context counts, the gram counts, the
    // vocabulary count and (when scoring the training corpus itself,
    // the common self-scoring call) the per-doc instance stream —
    // unpersisted, every consumer re-ran the regex tokenization over
    // the whole corpus from scratch (PlanAudit r18: 3 tokenization
    // subtrees at n = 2, 4 at higher orders). Persist the hashed token
    // arrays once; when `train` is absent the instance stream reuses
    // the SAME cached frame, so the corpus tokenizes exactly once.
    val docToks = docs
      .select(col(idCol).as("doc_id"),
        transform(toks(textCol), t => xxhash64(t)).as("th"))
    val selfTrain = train.isEmpty
    val docToksShared =
      if (selfTrain) graft.GraftSession.trackPersist(docToks) else docToks
    val trainToks = train match {
      case None => docToksShared.select(col("th"))
      case Some(t) => graft.GraftSession.trackPersist(
        t.select(transform(toks(trainTextCol), x => xxhash64(x)).as("th")))
    }

    // At n = 2 the context table has TWO consumers (the scoring join
    // probe and the vocabulary count below) — persist it so the
    // context aggregation runs once, not per consumer. At higher
    // orders vsize counts the token stream directly, the join probe is
    // the ONLY consumer, and persisting a corpus-sized context table
    // for one reader is pure cache-write cost (measured r18: q124
    // fivegram 1.5 → 2.1 s with an unconditional persist) — so the
    // persist is n == 2 only.
    val ctxRaw = trainToks
      .select(explode(contextHashes(col("th"), n)).as("ctx"))
      .groupBy("ctx").agg(count(lit(1)).cast(DoubleType).as("c1"))
    val ctx =
      if (n == 2) graft.GraftSession.trackPersist(ctxRaw) else ctxRaw
    val grams = trainToks.filter(size(col("th")) >= n)
      .select(explode(gramHashes(col("th"), n)).as("b"))
      .groupBy(col("b.g").as("g"))
      .agg(count(lit(1)).cast(DoubleType).as("c12"))
    // V = distinct unigrams at every order. At n = 2 the context table
    // IS the unigram table, so its row count is free; higher orders
    // pay one count_distinct over the token stream (partial-agg'd).
    val vsize =
      if (n == 2) ctx.agg(count(lit(1)).cast(DoubleType).as("vsize"))
      else trainToks.select(explode(col("th")).as("h"))
        .agg(count_distinct(col("h")).cast(DoubleType).as("vsize"))

    val inst = docToksShared
      .filter(size(col("th")) >= n)
      .select(col("doc_id"), explode(gramHashes(col("th"), n)).as("b"))
      .select(col("doc_id"), col("b.ctx").as("ctx"), col("b.g").as("g"))

    // the count tables are CORPUS-SIZED (one row per distinct gram /
    // context — 21M context rows at sf10 n=5) and sit behind
    // HOF-explode aggregates whose size ESTIMATES are garbage, so left
    // to the planner they get broadcast and kill the driver at scale;
    // pin both probes to shuffle-hash (hash-keyed → uniform, no sort,
    // per-partition build). AQE still localizes the reads when the
    // real table is small.
    val scored = inst
      .join(grams.hint("shuffle_hash"), Seq("g"), "left")
      .join(ctx.hint("shuffle_hash"), Seq("ctx"), "left")
      .crossJoin(broadcast(vsize))
      .withColumn("nll", -log(
        (coalesce(col("c12"), lit(0.0)) + 1.0) /
          (coalesce(col("c1"), lit(0.0)) + col("vsize"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), round(avg(col("nll")), 6).as("avg_nll"))

    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"), col("avg_nll"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): split each stratum (typically the language) into
    * `buckets` equal-size groups by LM score — head/middle/tail at the
    * default 3, the split CCNet keeps/filters/reweights by. Bucketing
    * orders by the ROUNDED avg_nll (the gate's cross-engine float
    * policy — sub-1e-6 float noise can't flip ranks) with a doc-id
    * tiebreak, so bucket assignment is exactly reproducible; docs with
    * no score (< 2 tokens) keep a null bucket. One hash-partitioned
    * window per stratum over (score, id) — no global sort. Output:
    * (doc_id, n_bigrams, avg_nll, ppl_bucket BIGINT). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        stratumCol: Option[String] = None,
                        buckets: Int = 3,
                        train: Option[DataFrame] = None,
                        trainTextCol: String = "text",
                        n: Int = 2): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    import org.apache.spark.sql.expressions.Window
    // any LM order (CCNet's production filter is a 5-gram KenLM);
    // the output keeps the historical n_bigrams column name.
    // The score frame feeds TWO consumers (the bucketing window and
    // the final join-back) — unpersisted, each re-ran the entire LM
    // scoring pipeline (train aggregations + the corpus-sized scoring
    // joins). The frame is three narrow columns per doc; persist it
    // (tracked) so scoring runs once (r18, the q43 pattern).
    val scored = graft.GraftSession.trackPersist(
      ngramScore(docs, idCol, textCol, n, train, trainTextCol)
        .withColumnRenamed("n_grams", "n_bigrams"))
    val withS = stratumCol match {
      case Some(sc) => scored.join(
        docs.select(col(idCol).as("doc_id"), col(sc).as("__stratum")),
        Seq("doc_id"))
      case None => scored.withColumn("__stratum", lit(""))
    }
    val w = Window.partitionBy(col("__stratum"))
      .orderBy(col("avg_nll"), col("doc_id"))
    val bucketed = withS.filter(col("avg_nll").isNotNull)
      .withColumn("ppl_bucket", ntile(buckets).over(w).cast(LongType))
      .select(col("doc_id"), col("ppl_bucket"))
    scored.join(bucketed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bigrams"), col("avg_nll"),
        col("ppl_bucket"))
  }

  /** DSIR-style importance weight (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each document by
    * Σ over its word bigrams of ln p_target(g) − ln p_raw(g), where both
    * distributions are add-one-smoothed bigram counts — target over the
    * `isTarget` slice, raw over the whole corpus. High weight = looks
    * like the target distribution; resample ∝ exp(weight) for selection.
    * This is the paper's model with the exact bigram vocabulary as the
    * feature space (the paper buckets grams into 10k hash bins purely to
    * bound model size for a RAM-resident fit; a count table is already
    * distributed here, so exact vocabulary costs one extra shuffle key
    * width and removes bucketing collisions).
    *
    * Shape at 100 TB: ONE gram-keyed partial-agg shuffle counts raw and
    * target together (the target count is a conditional sum in the same
    * aggregate — not a second pass), totals are a 1-row broadcast, and
    * scoring joins the per-doc gram stream back on the same gram key.
    * Output: (doc_id, n_grams, dsir_weight); docs with < 2 tokens get
    * n_grams = 0 and a null weight. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: org.apache.spark.sql.Column): DataFrame = {
    // The gram stream feeds BOTH the count aggregate and the scoring
    // join-back. It is deliberately NOT persisted: measured r13 at 10×
    // and 100× bench data, caching the exploded bigram stream lost to
    // recomputing it on the second consumer at every scale (sf10:
    // 23.8 s persisted vs 19.5 s recomputed) — the producer is a
    // 2-column pruned parquet scan plus a codegen'd split/zip_with,
    // cheaper per row than cache write+read of a stream with ~1 row
    // per corpus TOKEN. Contrast repeatedNgramStats, whose 5-gram
    // hash-combine transform is expensive enough that the same persist
    // wins ~1.5× — the decision is per-transform-cost, not a blanket
    // rule. The gram is carried as its 64-BIT HASH, never text: it is
    // only a count/join key, and the narrow key keeps the count
    // shuffle and the scoring join at 8 bytes/gram instead of the full
    // bigram string (measured r13: ~1.4× at 10× data over string
    // grams; two grams colliding in 64-bit space is the same accepted
    // caveat as repeatedNgramStats' hash-of-hashes).
    val grams = (docs
      .select(col(idCol).as("doc_id"), isTarget.as("__t"),
        toks(textCol).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("__t"), explode(bigrams(col("t"))).as("b"))
      .select(col("doc_id"), col("__t"), xxhash64(col("b.gram")).as("gram")))
    // the count TABLE (one narrow row per distinct bigram — far
    // smaller than the gram stream) has TWO consumers: the totals
    // aggregate and the scoring join probe. Unpersisted, `tot` re-ran
    // the whole gram aggregation — a third full tokenize+explode pass
    // over the corpus (r18, the q43 two-consumers audit). Persisting
    // the TABLE is not the r13-rejected stream persist above: the
    // cache holds distinct-gram rows, not a row per corpus token.
    val counts = graft.GraftSession.trackPersist(
      grams.groupBy("gram").agg(
        count(lit(1)).cast(DoubleType).as("cr"),
        sum(when(col("__t"), 1L).otherwise(0L)).cast(DoubleType).as("ct")))
    val tot = counts.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"),
      count(lit(1)).cast(DoubleType).as("v"))
    // counts is corpus-sized (one row per distinct bigram) behind a
    // garbage-estimate explode aggregate — same shuffle-hash pin as
    // ngramScore, never a driver broadcast
    val scored = grams.join(counts.hint("shuffle_hash"), Seq("gram"))
      .crossJoin(broadcast(tot))
      .withColumn("lw",
        log((col("ct") + 1.0) / (col("tt") + col("v"))) -
          log((col("cr") + 1.0) / (col("tr") + col("v"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        round(sum(col("lw")), 6).as("dsir_weight"))
    docs.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"), col("dsir_weight"))
  }
}
