package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators for training-data pipelines: deterministic
  * training-mix sampling, paragraph-level global dedup, and C4-style
  * line cleaning.
  *
  * Everything here is either pure-Column codegen (sampling, line
  * filter) or shuffles only compact digests (paragraph dedup) — the
  * shapes that survive a 100 TB corpus.
  */
object Curation {

  /** Deterministic LCG-style mix of a row id into [0, 1000): the basis
    * for reproducible sampling. Plain 64-bit integer arithmetic so any
    * engine (and any re-run, on any partitioning) selects the exact
    * same rows — unlike rand(), the sample is stable under retries,
    * speculative execution, and AQE re-planning, and an oracle can
    * reproduce it bit-for-bit. */
  def samplePermille(id: Column): Column =
    // mix through 31-bit space BEFORE the mod-1000: taking the raw
    // LCG product mod 1000 directly only ever yields multiples of 5
    // (the multiplier shares the factor), silently quantizing every
    // rate to the next multiple of 5. pmod throughout: ids are often
    // hash-derived and negative.
    pmod(lcgMix(id.cast(LongType), 12345L), lit(1000L))

  /** Training-mix rebalancing: keep each row with a per-stratum rate
    * (permille), e.g. downsample an over-represented language while
    * keeping the long tail. A pure codegen filter — no shuffle, no
    * state; at 100 TB it runs at scan speed and composes with
    * partition pruning (the filter references only `idCol` and
    * `stratumCol`). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       permille: Map[String, Int],
                       defaultPermille: Int = 1000): DataFrame = {
    val rate = permille.foldLeft(lit(defaultPermille.toLong)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v.toLong))
        .otherwise(acc)
    }
    df.filter(samplePermille(col(idCol)) < rate)
  }

  /** Resample to a TARGET MIXTURE — the data-mixing step of a
    * pretraining recipe (fix the proportion each source/language/
    * quality bucket contributes to the final corpus): per stratum,
    * keep exactly `min(available, round(weight/Σweights × totalTarget))`
    * documents, chosen in the seed-reproducible [[lcgMix]] order — the
    * same generator [[shuffleDeterministic]] and [[samplePermille]]
    * use, so retries, re-runs, and a SQL oracle select identical rows.
    * Quotas are LARGEST-REMAINDER apportioned (floor every share, then
    * hand the leftover units to the largest fractional remainders,
    * ties broken by stratum name), so they sum EXACTLY to
    * `totalTarget` — independent per-stratum rounding can overshoot a
    * budget by up to strata/2 rows. Strata absent from `weights` are
    * dropped (weight 0); an under-populated stratum yields everything
    * it has (the deficit is NOT redistributed — quotas stay a pure
    * function of the weights, so two runs over different corpora are
    * comparable).
    *
    * Scale shape: one hash-partitioned window per stratum (rank within
    * stratum) — no global sort, no driver state beyond the weight
    * literals; the quota comparison is a codegen'd CASE. Ids must be
    * numeric (hash non-numeric ids upstream — the mix is 31-bit LCG
    * arithmetic, chosen for exact cross-engine reproducibility). */
  def resampleToMixture(df: DataFrame, idCol: String, stratumCol: String,
                        weights: Map[String, Double], totalTarget: Long,
                        seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(totalTarget >= 0, "totalTarget must be >= 0")
    require(weights.nonEmpty && weights.values.forall(_ >= 0) &&
      weights.values.sum > 0, "weights must be non-negative, not all zero")
    val z = weights.values.sum
    // largest-remainder apportionment (driver-side over the tiny
    // weight map): floors, then +1 to the biggest remainders until the
    // floors sum to totalTarget; deterministic tie-break by name
    val shares = weights.toSeq.map { case (k, w) =>
      // share rounded to 6 dp (HALF_UP = SQL round) before the
      // floor/remainder split: the raw double w/z*T carries
      // summation-order ulp noise, and a share within 1 ulp of an
      // integer could floor differently in a SQL mirror computing the
      // same apportionment — rounding both sides first pins the
      // largest-remainder boundaries cross-engine
      val s = BigDecimal(w / z * totalTarget)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (k, math.floor(s).toLong, s - math.floor(s))
    }
    val leftover = (totalTarget - shares.map(_._2).sum).toInt
    val quotas = shares.sortBy { case (k, _, frac) => (-frac, k) }
      .zipWithIndex
      .map { case ((k, f, _), i) => (k, f + (if (i < leftover) 1L else 0L)) }
    val quota = quotas.foldLeft(lit(0L)) { case (acc, (k, q)) =>
      when(col(stratumCol) === k, lit(q)).otherwise(acc)
    }
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__mix"), col(idCol))
    df.withColumn("__mix", lcgMix(col(idCol).cast(LongType), seed))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__mix", "__rk")
  }

  /** Per-domain quality aggregation — the RefinedWeb/C4 insight that
    * spam is a DOMAIN property, not a document property: a content
    * farm's individual pages can each scrape past per-doc filters,
    * but the domain's aggregate quality gives it away. One
    * domain-keyed partial-agg shuffle over (domain, per-doc quality
    * score); output (domain, n_docs, mean_quality) with the 6-dp
    * rounding policy. Docs with no parseable domain aggregate under
    * the empty string.
    *
    * `langAware = true` (r16) scores each doc with the per-language
    * quality signals ([[TextAnalysis.qualityScoreByLang]] keyed by
    * [[TextAnalysis.langId]]), so a multilingual crawl's non-English
    * domains are judged against their own stopword tables and letter
    * classes instead of flunking the English rules. Default false:
    * the English-scored form is the q122 gate anchor. */
  def domainQuality(docs: DataFrame, urlCol: String,
                    textCol: String,
                    langAware: Boolean = false): DataFrame =
    docs.select(
        coalesce(Urls.domain(col(urlCol)), lit("")).as("domain"),
        (if (langAware)
          TextAnalysis.qualityScoreByLang(col(textCol),
            TextAnalysis.langId(col(textCol)))
        else TextAnalysis.qualityScore(col(textCol))).as("__q"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("__q")), 6).as("mean_quality"))

  /** Drop every document of a low-quality or oversized domain:
    * domains below `minMeanQuality` mean per-doc quality, or with
    * more than `maxDocsPerDomain` documents (the C4-style spam-farm
    * cap), lose ALL their docs. Docs with no parseable domain are
    * KEPT — no URL is no quality signal (the [[graft.text.Dedup
    * .standardPipeline]] null-URL rule). The domain stats side is
    * tiny (one row per domain) — AQE broadcasts the join. */
  def dropLowQualityDomains(docs: DataFrame, urlCol: String,
                            textCol: String, minMeanQuality: Double,
                            maxDocsPerDomain: Long = Long.MaxValue,
                            langAware: Boolean = false)
      : DataFrame = {
    val bad = domainQuality(docs, urlCol, textCol, langAware)
      .filter(col("domain") =!= "" &&
        (col("mean_quality") < minMeanQuality ||
          col("n_docs") > maxDocsPerDomain))
      .select(col("domain"))
    docs.join(bad,
      coalesce(Urls.domain(col(urlCol)), lit("")) === bad("domain"),
      "left_anti")
  }

  /** Temperature-scaled mixture (the T5/mT5/LLaMA multilingual
    * recipe): stratum share ∝ count^tau, normalized — tau = 1
    * reproduces natural proportions, tau → 0 approaches uniform,
    * the usual 0.3–0.7 range upsamples small sources without
    * swamping large ones. Composition: one bounded stratum-count
    * aggregate (one row per source — driver-safe by construction),
    * weights rounded to 9 dp (the cross-engine float policy: pow is
    * not correctly-rounded IEEE, so both engines round before the
    * quota math and the largest-remainder boundaries agree), then
    * [[resampleToMixture]]'s quota + seeded-LCG selection. */
  def temperatureMixture(df: DataFrame, idCol: String, stratumCol: String,
                         tau: Double, totalTarget: Long,
                         seed: Long = 42L): DataFrame = {
    require(tau >= 0, s"tau must be >= 0 (got $tau)")
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "temperatureMixture: no strata")
    val pows = counts.map { case (k, n) => k -> math.pow(n.toDouble, tau) }
    val z = pows.values.sum
    val weights = pows.map { case (k, p) =>
      // HALF_UP to match SQL round() (half away from zero)
      k -> BigDecimal(p / z).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    resampleToMixture(df, idCol, stratumCol, weights, totalTarget, seed)
  }

  private def paragraphs(text: Column): Column =
    // coalesce: a null document contributes zero paragraphs, not a
    // null array (size(null) is -1 with ANSI off). The separator is a
    // regex so CRLF documents split too — a literal "\n\n" never
    // matches "\r\n\r\n" and would silently degrade paragraph dedup
    // to whole-document dedup for the CRLF fraction of a crawl.
    filter(split(coalesce(text, lit("")), "(\\r?\\n){2}"),
      p => length(trim(p)) > 0)

  /** Paragraph-level exact dedup (the RefinedWeb/Dolma recipe): every
    * paragraph is kept only at its first occurrence in the corpus
    * (ordered by (id, position)); later repeats — boilerplate headers,
    * license footers, quoted reposts — are dropped and the surviving
    * paragraphs are stitched back in document order.
    *
    * Scale shape: paragraphs shuffle ONCE keyed on a 16-byte digest
    * (never the paragraph text) for the first-occurrence reduction,
    * then once on the doc id to reassemble. No windows over the full
    * corpus, no self-join on text.
    *
    * Output: one row per input doc — (id, clean, n_paras, n_kept);
    * docs whose every paragraph was seen earlier survive with an
    * empty `clean`.
    */
  def paragraphDedup(df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    val id = col(idCol)
    val paras = df
      .select(id, posexplode(paragraphs(col(textCol))).as(Seq("idx", "para")))
      .withColumn("pkey", xxhash64(col("para")))
      .withColumn("pkey2", xxhash64(reverse(col("para"))))
    // first occurrence = min (id, idx) per digest: a partial-aggregable
    // groupBy (map-side combine halves the shuffle), then an inner join
    // back on the digest to keep exactly that occurrence
    val first = paras.groupBy("pkey", "pkey2")
      .agg(min(struct(id, col("idx"))).as("first"))
    val kept = paras.join(first, Seq("pkey", "pkey2"))
      .filter(col(s"first.$idCol") === id && col("first.idx") === col("idx"))
    val rebuilt = kept.groupBy(idCol)
      .agg(array_join(
             transform(array_sort(collect_list(struct(col("idx"), col("para")))),
                       x => x.getField("para")),
             "\n\n").as("clean"),
           count(lit(1)).as("n_kept"))
    df.select(id, size(paragraphs(col(textCol))).cast(LongType).as("n_paras"))
      .join(rebuilt, Seq(idCol), "left")
      .select(id, coalesce(col("clean"), lit("")).as("clean"),
        col("n_paras"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Token-budget capping per source (training-mix assembly): within
    * each stratum, take documents in a deterministic priority order
    * until the running token total reaches the budget; the document
    * that crosses the line is kept (budgets are targets, not hard
    * byte limits). `orderCol` must be a UNIQUE priority key (an id, or
    * a pre-built (score, id) struct) — on ties the running sum would
    * depend on shuffle order and the kept set would change between
    * runs. Scale shape: one hash-partitioned sort per stratum
    * (a window over `stratumCol` — strata are numerous, so partitions
    * stay balanced); no global sort, no driver state.
    *
    * Output: input columns + n_tokens + cum_tokens, filtered to the
    * kept prefix. */
  def tokenBudget(df: DataFrame, stratumCol: String, orderCol: String,
                  textCol: String, budgetPerStratum: Long,
                  tokenCountCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratumCol).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // tokenCountCol (r16): budget under a PRODUCTION tokenizer's
    // counts (e.g. size of Bpe.encodeIds output under an imported
    // merges.txt) instead of the whitespace heuristic — the same
    // opt-in packSequences always had
    df.withColumn("n_tokens",
        tokenCountCol.map(c => coalesce(col(c).cast(LongType), lit(0L)))
          .getOrElse(
            coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0L))))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // keep while the PREVIOUS cumulative total is under budget: the
      // crossing doc stays, everything after it goes
      .filter(col("cum_tokens") - col("n_tokens") < budgetPerStratum)
  }

  /** Training-sequence packing, concat-then-chunk style: documents are
    * laid out in deterministic priority order per stratum and cut into
    * fixed token-length packs — `pack_id` is which training sequence a
    * document's FIRST token lands in, `pack_offset` its token offset
    * within that pack. The batch-assembly step between a curated corpus
    * and a trainer's fixed-length sequences; downstream, one
    * `repartition(pack_id)` colocates each pack's members. As with
    * [[tokenBudget]], `orderCol` must be a unique priority key — ties
    * would make pack assignment nondeterministic across runs.
    *
    * Scale shape: identical to [[tokenBudget]] — one hash-partitioned
    * per-stratum window sort, no global sort, no driver state.
    *
    * Output: input columns + n_tokens, pack_id, pack_offset. */
  def packSequences(df: DataFrame, stratumCol: String, orderCol: String,
                    textCol: String, seqTokens: Long,
                    tokenCountCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seqTokens > 0, "seqTokens must be positive")
    val w = Window.partitionBy(stratumCol).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // production packs by TOKENIZER counts, not whitespace — pass a
    // precomputed count column (e.g. Bpe.tokenStats' n_tokens) to pack
    // by it; the whitespace default keeps the q94 gate semantics
    df.withColumn("n_tokens",
        tokenCountCol.map(c => coalesce(col(c).cast(LongType), lit(0L)))
          .getOrElse(coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0L))))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", floor(col("__start") / seqTokens))
      .withColumn("pack_offset", col("__start") % seqTokens)
      .drop("__start")
  }

  /** Two LCG rounds of (id, seed) in 31-bit space — exact in any
    * engine's 64-bit integer arithmetic (ids fold to 31 bits before the
    * multiply, so the product stays < 2^62). TWO rounds matter: after
    * one round a seed change is a constant additive shift, which
    * preserves the sort order almost everywhere — "epochs = seeds"
    * would not actually reshuffle. The second multiply scrambles the
    * shift.
    *
    * The id is xor-folded (high 33 bits into the low 31) BEFORE the
    * 31-bit reduction: a plain `pmod(id, 2^31)` would give 64-bit
    * hash-derived ids congruent mod 2^31 identical mixes — perfectly
    * correlated sample/shuffle/shard decisions for those pairs at
    * billion-doc scale. */
  private def lcgMix(id: Column, seed: Long): Column = {
    val m = 2147483648L
    val folded = pmod(id.bitwiseXOR(shiftrightunsigned(id, 31)), lit(m))
    val r1 = pmod(folded * lit(1103515245L) + lit(seed), lit(m))
    pmod(r1 * lit(1103515245L) + lit(12345L), lit(m))
  }

  /** Deterministic corpus shuffle — the training-order randomization
    * step: every document gets a pseudo-random but SEED-REPRODUCIBLE
    * position, sharded for parallel consumption. The [[lcgMix]] of
    * (id, seed) orders the docs; `shard` is the
    * mix mod `numShards`, `pos` the rank within the shard.
    *
    * Scale shape: one hash-partitioned window sort per shard — shards
    * are numerous, so partitions stay balanced; no global sort. Epochs =
    * different seeds; the same seed always reproduces the same order.
    *
    * Output: input columns + shard, pos. */
  def shuffleDeterministic(df: DataFrame, idCol: String, seed: Long,
                           numShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(numShards > 0, "numShards must be positive")
    val mix = lcgMix(col(idCol), seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__mix"),
      col(idCol))
    df.withColumn("__mix", mix)
      .withColumn("shard", pmod(col("__mix"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w).cast(LongType) - 1)
      .drop("__mix")
  }

  /** TOKEN-balanced global shards — equal token MASS per shard (the
    * property a training run actually needs from its input shards;
    * [[shuffleDeterministic]] balances document COUNTS, which skews
    * token mass whenever lengths do): documents take a seed-
    * reproducible pseudo-random total order (the same LCG mix), and
    * `shard = floor(exclusive-prefix-token-sum / tokensPerShard)` —
    * token-contiguous shards of `tokensPerShard` each, reproducible
    * across runs and cluster sizes because the prefix sum follows the
    * total (mix, id) order, never partition boundaries.
    *
    * Scale shape — a global prefix sum WITHOUT a global window: the
    * (id, mix, n) projection (thin: ~24 bytes/doc) range-shuffles into
    * (mix, id) order and is persisted; per-partition token sums
    * collect to the driver (numPartitions longs — the Rank/POCounter
    * side channel) and broadcast back as offsets; the running sum
    * within each partition is a pid-local window (pids are
    * hash-partitioned whole, so no partition ever holds more than its
    * range slice). Full rows shuffle exactly ONCE — the final id-keyed
    * join of the shard assignment. Output: input columns + n_tokens,
    * shard. */
  def tokenBalancedShards(df: DataFrame, idCol: String, textCol: String,
                          tokensPerShard: Long, seed: Long = 0L,
                          tokenCountCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tokensPerShard > 0, "tokensPerShard must be positive")
    val clash = Seq("n_tokens", "shard").filter(df.columns.contains)
    require(clash.isEmpty,
      s"tokenBalancedShards appends ${clash.mkString("/")} but the " +
        "input already carries it — rename or drop it first (an " +
        "ambiguous duplicate would only fail at some downstream select)")
    val nTok = tokenCountCol
      .map(c => coalesce(col(c).cast(LongType), lit(0L)))
      .getOrElse(coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0L)))
    // thin projection only: the heavy text column never enters the
    // prefix-sum machinery
    val thin = graft.GraftSession.trackPersist(
      df.select(col(idCol), nTok.as("__tb_n"),
          lcgMix(col(idCol), seed).as("__tb_mix"))
        .repartitionByRange(col("__tb_mix"), col(idCol))
        .sortWithinPartitions(col("__tb_mix"), col(idCol))
        .withColumn("__tb_pid", spark_partition_id()))
    // pass 1: per-partition sums — numPartitions rows, never data
    val parts = thin.groupBy(col("__tb_pid"))
      .agg(sum(col("__tb_n")).as("__tb_s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = parts.map { case (p, s) => val o = (p, acc); acc += s; o }
    val offsets = df.sparkSession.createDataFrame(offs.toSeq)
      .toDF("__tb_pid", "__tb_off")
    // pass 2: pid-local running sum + broadcast offset = global
    // exclusive prefix; shard is its quotient
    val w = Window.partitionBy(col("__tb_pid"))
      .orderBy(col("__tb_mix"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val assign = thin.join(broadcast(offsets), "__tb_pid")
      .withColumn("__tb_cum",
        col("__tb_off") + sum(col("__tb_n")).over(w) - col("__tb_n"))
      .select(col(idCol), col("__tb_n").as("n_tokens"),
        floor(col("__tb_cum") / tokensPerShard).as("shard"))
    df.join(assign, idCol)
  }

  /** Deterministic fixed-size per-stratum sample — "exactly n eval docs
    * per language/source", the slice-carving companion to the rate-based
    * [[stratifiedSample]]: rank docs inside each stratum by the same
    * seed-reproducible LCG mix as [[shuffleDeterministic]] and keep the
    * first `n`. A stratum smaller than `n` is kept whole.
    *
    * Scale shape: one per-stratum window sort; Spark executes the
    * rank-≤-n filter as a partial top-n per partition (WindowGroupLimit),
    * so a billion-doc stratum never fully sorts.
    *
    * Output: input columns + smp_rank (1-based within the stratum). */
  def stratifiedTakeN(df: DataFrame, idCol: String, stratumCol: String,
                      n: Int, seed: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, "n must be positive")
    val mix = lcgMix(col(idCol), seed)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__mix"), col(idCol))
    df.withColumn("__mix", mix)
      .withColumn("smp_rank", row_number().over(w).cast(LongType))
      .filter(col("smp_rank") <= n)
      .drop("__mix")
  }

  /** One line of C4's cleaning rule as a reusable predicate: a line is
    * prose iff it has at least `minWords` whitespace tokens and its
    * trimmed form ends in terminal punctuation. */
  def isProseLine(line: Column, minWords: Int): Column =
    size(TextAnalysis.tokens(line)) >= minWords &&
      rtrim(line).rlike("[.!?\"]$")

  /** C4-style line cleaning: drop navigation/boilerplate lines (too
    * short, or not ending in terminal punctuation), keep the document
    * only if enough prose lines remain. Pure codegen column work — one
    * pass over the scan, zero shuffles at any corpus size.
    *
    * Output: (id, clean, n_lines, n_kept, keep). */
  def lineFilter(df: DataFrame, idCol: String, textCol: String,
                 minWords: Int = 5, minLines: Int = 3): DataFrame = {
    // coalesce: null docs clean to "" with zero counts (size(null)=-1)
    val lines = filter(split(coalesce(col(textCol), lit("")), "\n"),
      l => length(trim(l)) > 0)
    val kept = filter(lines, l => isProseLine(l, minWords))
    df.select(col(idCol),
      array_join(kept, "\n").as("clean"),
      size(lines).cast(LongType).as("n_lines"),
      size(kept).cast(LongType).as("n_kept"),
      (size(kept) >= minLines).as("keep"))
  }
}
