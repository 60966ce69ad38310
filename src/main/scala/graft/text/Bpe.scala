package graft.text

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Byte-Pair-Encoding tokenizer training + encoding — the vocabulary-
  * learning step of a pretraining data pipeline (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"; the
  * greedy merge-rank encoder is the GPT-2 BPE shape).
  *
  * Scale design (the IVF-fit discipline, [[graft.ml.Ivf]]): the ONLY
  * full-corpus pass is the word histogram — one shuffle of (word,
  * count), with map-side partial aggregation doing the heavy lifting.
  * The merge loop then runs on the driver over the BOUNDED top-`cap`
  * histogram (`graft.bpe.vocabCap`, default 2^16): BPE statistics are
  * weighted by word frequency, so the Zipf head carries ~all the pair
  * mass and the unbounded tail only perturbs ranks below `minPairCount`
  * anyway. Truncation emits a driver warning. Encoding never shuffles:
  * a per-task memoized map over the text column (Zipf again — hit rate
  * approaches 1 after the first few thousand words of a partition).
  *
  * Everything is deterministic, so a vocabulary trained today encodes
  * identically in any later session: the histogram collect is ordered
  * (count desc, word asc), merge ties break lexicographically, and
  * encoding applies merges in rank order — the exact segmentation the
  * training loop itself produced.
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent (left, right) → left+right. */
  case class Merge(rank: Int, left: String, right: String) {
    def merged: String = left + right
  }

  /** (word, n) corpus histogram — the ONLY full-corpus pass in
    * training. Tokenization matches [[TextAnalysis.tokens]] (split on
    * whitespace, empties dropped) so corpus statistics elsewhere in the
    * library count the same words. */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Train `numMerges` merges on `docs`. The histogram is bounded to
    * the top-`vocabCap` words by (count desc, word asc) — a
    * deterministic, driver-safe collect (`orderBy.limit`, the bounded
    * pattern every driver-side fit in this library uses); pass
    * `vocabCap <= 0` (the default) to read `graft.bpe.vocabCap`
    * (default 65536). Merges whose best pair falls below
    * `minPairCount` stop training early. */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  minPairCount: Long = 2L,
                  vocabCap: Int = -1): Seq[Merge] =
    trainOnHistogram(boundedHistogram(docs, textCol, vocabCap),
      numMerges, minPairCount)

  /** The ONE driver-bounded histogram collect training runs on:
    * top-`cap` words by (count desc, word asc) — deterministic order,
    * truncation warned. Shared by [[trainMerges]] and [[trainVocab]]
    * so the corpus is scanned exactly once per training call. */
  private def boundedHistogram(docs: DataFrame, textCol: String,
                               vocabCap: Int): Seq[(String, Long)] = {
    val capL = if (vocabCap > 0) vocabCap.toLong
               else graft.GraftSession.longConf(docs.sparkSession,
                 "graft.bpe.vocabCap", 1L << 16)
    require(capL > 0, s"graft.bpe.vocabCap must be positive (got $capL) — " +
      "the histogram collect is driver-bounded BY this cap, there is no " +
      "uncapped mode")
    val cap = math.min(capL, Int.MaxValue - 1L).toInt
    // cap+1: one extra row detects truncation without a second count
    val hist = wordHistogram(docs, textCol)
      .orderBy(col("n").desc, col("word"))
      .limit(cap + 1)
      .collect()
    if (hist.length > cap)
      graft.functions.Warnings.driverWarn(
        s"bpe: word histogram truncated to top $cap words " +
          s"(graft.bpe.vocabCap) — tail frequencies below " +
          s"${hist(cap - 1).getLong(1)} are not counted")
    hist.take(cap).map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** The driver-side merge loop over an in-memory (word, weight)
    * histogram. Pair counts are maintained incrementally: merging pair
    * p only retracts/re-adds the words that (ever) contained p, so an
    * iteration costs O(words touched), not O(vocabulary). Ties on
    * count break to the lexicographically smallest (left, right) —
    * training is a pure function of the histogram. */
  def trainOnHistogram(wordCounts: Seq[(String, Long)], numMerges: Int,
                       minPairCount: Long = 2L): Seq[Merge] = {
    val words: Array[(mutable.ArrayBuffer[String], Long)] =
      wordCounts.map { case (w, c) => (toSymbols(w), c) }.toArray
    val counts = mutable.HashMap.empty[(String, String), Long]
    // word indices that have EVER contained a pair; stale members are
    // harmless (retract+re-add of an unaffected word is a net no-op)
    val where = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def touch(i: Int, sign: Long): Unit = {
      val (syms, w) = words(i)
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        val nc = counts.getOrElse(p, 0L) + sign * w
        if (nc == 0L) counts.remove(p) else counts(p) = nc
        if (sign > 0L) where.getOrElseUpdate(p, mutable.BitSet.empty) += i
        j += 1
      }
    }
    var i = 0
    while (i < words.length) { touch(i, 1L); i += 1 }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var continue = true
    while (continue && merges.length < numMerges && counts.nonEmpty) {
      var best: (String, String) = null
      var bc = Long.MinValue
      for ((p, c) <- counts)
        if (c > bc || (c == bc && pairLt(p, best))) { best = p; bc = c }
      if (bc < minPairCount) continue = false
      else {
        merges += Merge(merges.length, best._1, best._2)
        val affected = where.getOrElse(best, mutable.BitSet.empty).toArray
        var k = 0
        while (k < affected.length) {
          val idx = affected(k)
          touch(idx, -1L)
          words(idx) = (mergeIn(words(idx)._1, best), words(idx)._2)
          touch(idx, 1L)
          k += 1
        }
      }
    }
    merges.toSeq
  }

  /** Encode: one row per input row, `out` = the document's token
    * sequence (merges applied per word in rank order — the segmentation
    * training itself produced; tokens never cross word boundaries, the
    * BPE contract). Null text stays null. No shuffle: a plain projected
    * map with a per-task word→tokens memo. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge], out: String = "tokens"): DataFrame =
    docs.select(col(idCol), encoderUdf(merges)(col(textCol)).as(out))

  /** Per-document token statistics under a trained vocabulary:
    * (id, n_tokens, n_word_chars) — the compression-ratio inputs a
    * token-budget planner needs ([[Curation]] q90 pairs with this). */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[Merge]): DataFrame =
    encode(docs, idCol, textCol, merges)
      .select(col(idCol),
        size(col("tokens")).cast(LongType).as("n_tokens"),
        length(concat_ws("", col("tokens"))).cast(LongType)
          .as("n_word_chars"))

  /** The ONE tokenize-and-encode loop both UDFs share (a tokenization
    * tweak must never desynchronize [[encoderUdf]] and [[encodeIds]]):
    * split like [[TextAnalysis.tokens]] — NO String.trim (Java trim
    * strips every char <= U+0020, control chars included, where
    * Spark's trim strips spaces only; the split + nonEmpty filter
    * alone matches exactly) — then encode each word through the
    * per-closure memo. The memo lives in the closure: each task
    * deserializes its own copy (task-local, no locks), capped as a
    * backstop. */
  private def wordwise[T](perWord: String => Array[T]): String => Seq[T] = {
    val memo = mutable.HashMap.empty[String, Array[T]]
    (text: String) =>
      if (text == null) null
      else {
        val out = mutable.ArrayBuffer.empty[T]
        // script-aware boundary insertion first — the JVM twin of
        // TextAnalysis.scriptSpaced, so UDF-side words match the
        // engine's Column-side tokens on CJK/Thai text too
        val spaced = TextAnalysis.scriptSpacedStr(text)
        for (w <- spaced.split("\\s+") if w.nonEmpty) {
          if (memo.size > (1 << 16)) memo.clear()
          out ++= memo.getOrElseUpdate(w, perWord(w))
        }
        out.toSeq
      }
  }

  /** The whole-document encoder as a reusable UDF (tokenize like
    * [[TextAnalysis.tokens]], encode each word, concatenate). */
  def encoderUdf(merges: Seq[Merge]): UserDefinedFunction = {
    val ranks = rankMap(merges.map(m => (m.left, m.right)).toArray)
    udf(wordwise[String](w => encodeRanked(w, ranks)))
  }

  /** Pair → rank lookup, built ONCE per encoder closure (first rank
    * wins — trained merge lists never repeat a pair, this is a
    * belt-and-braces tie rule). VALIDATES the training invariant the
    * min-rank encoder's equivalence proof rests on: every pair side
    * must be a single code point or the result of an EARLIER merge.
    * Trained lists always satisfy it; a hand-built/imported list that
    * violates it would encode differently under min-rank vs rank-order
    * application — fail loudly instead of silently diverging. */
  private def rankMap(pairs: Array[(String, String)])
      : mutable.HashMap[(String, String), Int] = {
    val produced = mutable.HashSet.empty[String]
    var i = 0
    while (i < pairs.length) {
      val (l, r) = pairs(i)
      def ok(s: String) =
        s.codePointCount(0, s.length) == 1 || produced.contains(s)
      require(ok(l) && ok(r),
        s"merge list violates the training invariant at rank $i: " +
          s"('$l', '$r') references a multi-codepoint symbol no earlier " +
          "merge produced — not a trained BPE merge list")
      produced += l + r
      i += 1
    }
    val m = mutable.HashMap.empty[(String, String), Int]
    i = pairs.length - 1
    while (i >= 0) { m(pairs(i)) = i; i -= 1 }
    m
  }

  /** Segment one word — the GPT-2 encoder loop: repeatedly merge the
    * LOWEST-RANK pair present among the word's adjacent symbols,
    * leftmost-greedy per application. O(applied merges × word length)
    * per uncached word, independent of VOCABULARY size — the
    * scan-every-merge form paid O(numMerges) per word, which at a
    * production 30k–50k merge list dwarfs the word itself. Output is
    * identical to rank-order application: a merge's pair can only
    * arise after its constituent symbols exist (every post-merge
    * adjacency involves the just-created symbol, whose pairs rank
    * LATER in training), so the minimum present rank is always the
    * next one the rank-order scan would have applied. */
  private def encodeRanked(word: String,
                           ranks: mutable.HashMap[(String, String), Int])
      : Array[String] = {
    var syms = toSymbols(word)
    var continue = syms.length > 1 && ranks.nonEmpty
    while (continue) {
      var best: (String, String) = null
      var br = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < br) { br = r; best = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (best == null) continue = false
      else {
        syms = mergeIn(syms, best)
        if (syms.length < 2) continue = false
      }
    }
    syms.toArray
  }

  /** Segment one word under a merge list (rank = array order). Thin
    * spec-facing wrapper over [[encodeRanked]]; the hot paths
    * ([[encoderUdf]]/[[encodeIds]]) build the rank map once per
    * closure instead of once per word. */
  def encodeWord(word: String, pairs: Array[(String, String)]): Array[String] =
    encodeRanked(word, rankMap(pairs))

  // -------------------------------------------------------------------
  // Vocabulary — what a training pipeline actually consumes: a stable
  // token→id table (base alphabet first, sorted; then merge results in
  // rank order), plus id-level encoding.

  /** A trained vocabulary: the base alphabet (every code point seen in
    * the training histogram, sorted) + the merge results in rank
    * order. Token ids are the position in that sequence — stable,
    * contiguous, reproducible. */
  case class Vocab(alphabet: Seq[String], merges: Seq[Merge]) {
    lazy val tokens: Seq[String] = alphabet ++ merges.map(_.merged)
    lazy val idOf: Map[String, Int] = tokens.zipWithIndex.toMap
    def size: Int = tokens.size
  }

  /** [[trainMerges]] + the alphabet, as one [[Vocab]] — ONE corpus
    * pass: merges and alphabet both derive from the same collected
    * histogram. */
  def trainVocab(docs: DataFrame, textCol: String, numMerges: Int,
                 minPairCount: Long = 2L, vocabCap: Int = -1): Vocab = {
    val hist = boundedHistogram(docs, textCol, vocabCap)
    Vocab(
      hist.iterator.flatMap(w => toSymbols(w._1)).toSet.toSeq.sorted,
      trainOnHistogram(hist, numMerges, minPairCount))
  }

  /** Encode to TOKEN IDS — the sequence-packing input. Unknown
    * symbols (code points absent from the training alphabet) map to
    * `unkId` (default -1, the conventional "needs byte-fallback"
    * marker). Null text stays null. Same shuffle-free memoized map as
    * [[encode]]. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                vocab: Vocab, out: String = "token_ids",
                unkId: Int = -1): DataFrame = {
    val ranks = rankMap(vocab.merges.map(m => (m.left, m.right)).toArray)
    val ids = vocab.idOf
    val enc = udf(wordwise[Int](w =>
      encodeRanked(w, ranks).map(t => ids.getOrElse(t, unkId))))
    docs.select(col(idCol), enc(col(textCol)).as(out))
  }

  /** Persist a whole [[Vocab]] as `<name>` (id, token, kind, rank,
    * left, right) — one self-describing table. */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
                vocab: Vocab, name: String): Unit = {
    import spark.implicits._
    val base = vocab.alphabet.zipWithIndex.map { case (t, i) =>
      (i, t, "base", -1, null: String, null: String) }
    val merged = vocab.merges.map(m =>
      (vocab.alphabet.size + m.rank, m.merged, "merge", m.rank,
        m.left, m.right))
    (base ++ merged).toDF("id", "token", "kind", "rank", "left", "right")
      .write.mode("overwrite").saveAsTable(name)
  }

  /** Reload a [[saveVocab]] table (bounded collect, vocab-sized). */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
                name: String): Vocab = {
    val rows = spark.table(name).orderBy(col("id")).collect()
    Vocab(
      rows.filter(_.getString(2) == "base").map(_.getString(1)).toSeq,
      rows.filter(_.getString(2) == "merge").map(r =>
        Merge(r.getInt(3), r.getString(4), r.getString(5))).toSeq)
  }

  // -------------------------------------------------------------------
  // Persistence — a vocabulary is an epoch artifact like the dedup
  // index ([[DedupIndex]]): train once over the corpus, persist, then
  // every later job (or session) encodes against the saved merges.

  /** Persist a merge table as `<name>` (rank, left, right). */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[Merge], name: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right))
      .toDF("rank", "left", "right")
      .write.mode("overwrite").saveAsTable(name)
  }

  /** Load a merge table saved with [[saveMerges]] — a bounded collect
    * (vocabularies are merge-count-sized, never corpus-sized). */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 name: String): Seq[Merge] =
    spark.table(name).orderBy(col("rank")).collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2)))
      .toSeq

  // -------------------------------------------------------------------
  // External vocabulary import (r16) — run token budgets / packing /
  // encoding under a PRODUCTION tokenizer's merge table instead of a
  // corpus-trained one. The interchange format is the GPT-2-style
  // merges.txt (Radford et al. 2019, encoder.py; also what
  // HuggingFace tokenizers emit): an optional '#version: …' header,
  // then one "left right" pair per line, rank = line order.
  // Segmentation parity is the contract here; ID parity with a
  // vocab.json is out of scope (our [[Vocab]] ids are alphabet-then-
  // merges positional).

  /** Parse GPT-2-style merges.txt lines: ONLY a leading '#version'
    * header line and blank lines are skipped — real GPT-2 tables
    * contain merges whose symbols start with '#' ('# #', '## #', the
    * merges that build the ##/### tokens), so a blanket '#'-comment
    * rule would silently drop them and shift every later rank
    * (encoder.py skips exactly the first line; HuggingFace skips
    * '#version'). Every other line is EXACTLY "left right", fail-loud
    * on malformed lines — a silently dropped merge would segment every
    * downstream corpus differently. */
  def parseMergesTxt(lines: Iterator[String]): Seq[Merge] = {
    val out = mutable.ArrayBuffer.empty[Merge]
    var lineNo = 0
    var seenData = false
    for (ln <- lines) {
      lineNo += 1
      val t = ln.trim
      val versionHeader = !seenData && t.startsWith("#version")
      if (t.nonEmpty && !versionHeader) {
        seenData = true
        val sp = t.split(" ")
        require(sp.length == 2 && sp.forall(_.nonEmpty),
          s"merges.txt line $lineNo: expected 'left right', got '$ln'")
        out += Merge(out.length, sp(0), sp(1))
      }
    }
    out.toSeq
  }

  /** Read a merges.txt through the Hadoop filesystem (local, HDFS,
    * object stores alike) — a driver-side artifact read, vocabulary-
    * sized, never corpus-sized. */
  def loadMergesTxt(spark: org.apache.spark.sql.SparkSession,
                    path: String): Seq[Merge] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try parseMergesTxt(scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines())
    finally in.close()
  }

  /** Emit merges in the same merges.txt format (round-trips through
    * [[loadMergesTxt]]) — the hand-off artifact for tooling that
    * consumes the GPT-2 format. */
  def writeMergesTxt(spark: org.apache.spark.sql.SparkSession,
                     merges: Seq[Merge], path: String): Unit = {
    require(merges.forall(m => !m.left.contains(" ") &&
      !m.right.contains(" ")),
      "merges.txt cannot represent symbols containing spaces")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      out.write("#version: 0.2\n".getBytes("UTF-8"))
      merges.sortBy(_.rank).foreach(m =>
        out.write(s"${m.left} ${m.right}\n".getBytes("UTF-8")))
    } finally out.close()
  }

  /** GPT-2's byte→unicode alphabet (encoder.py bytes_to_unicode):
    * printable bytes '!'..'~', '¡'..'¬', '®'..'ÿ' map to themselves,
    * every other byte value shifts to 256+k in discovery order — the
    * 256-entry base alphabet an imported GPT-2 merge table builds on. */
  val Gpt2ByteAlphabet: Seq[String] = {
    val keep = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ'))
      .map(_.toInt).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) b.toChar.toString
      else { val c = (256 + n).toChar.toString; n += 1; c }
    }
  }

  /** Assemble a [[Vocab]] from imported merges: the alphabet is the
    * distinct single codepoints appearing in the merge symbols plus
    * `baseAlphabet` (pass [[Gpt2ByteAlphabet]] for a GPT-2 table so
    * bytes absent from every merge still encode), sorted. */
  def vocabFromMerges(merges: Seq[Merge],
                      baseAlphabet: Seq[String] = Nil): Vocab =
    Vocab(
      (merges.iterator.flatMap(m =>
        toSymbols(m.left) ++ toSymbols(m.right)).toSet ++
        baseAlphabet.toSet).toSeq.sorted,
      merges)

  /** GPT-2's pre-tokenizer (encoder.py `pat`): contractions, optional-
    * leading-space letter/digit/punct runs, then residual whitespace —
    * the split that makes word-initial 'Ġ…' merges reachable. */
  private val Gpt2Pat = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+",
    // UNICODE_CHARACTER_CLASS: Python's \\s is Unicode whitespace —
    // without the flag Java treats NBSP/U+2000-200A/U+3000 as
    // NON-whitespace, fusing them into punct pre-tokens and breaking
    // segmentation parity on real web text
    java.util.regex.Pattern.UNICODE_CHARACTER_CLASS)

  /** One pre-token's UTF-8 bytes through the byte→unicode alphabet
    * (space→'Ġ', newline→'Ċ', …) — encoder.py's byte mapping. */
  private def gpt2MapBytes(s: String): String = {
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bs.length)
    var i = 0
    while (i < bs.length) { sb.append(Gpt2ByteAlphabet(bs(i) & 0xFF)); i += 1 }
    sb.toString
  }

  /** Invert [[Gpt2ByteAlphabet]]: each codepoint of `s` maps back to
    * its byte and the bytes decode as UTF-8 — the decode side of the
    * GPT-2 byte mapping. To recover a document, concatenate the TOKEN
    * STRINGS first and decode ONCE: a token boundary may split a
    * multi-byte UTF-8 character (under a merge-free vocabulary every
    * non-ASCII character does), so decoding per token would replace
    * the split character with U+FFFD pairs. Fail-loud on codepoints
    * outside the alphabet. */
  def gpt2ByteDecode(s: String): String = {
    val bs = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      bs(i) = Gpt2ByteInverse.getOrElse(s.charAt(i),
        throw new IllegalArgumentException(
          s"gpt2ByteDecode: '${s.charAt(i)}' (U+${s.charAt(i).toInt.toHexString}) is not in the GPT-2 byte alphabet"))
      i += 1
    }
    new String(bs, java.nio.charset.StandardCharsets.UTF_8)
  }

  private lazy val Gpt2ByteInverse: Map[Char, Byte] =
    Gpt2ByteAlphabet.zipWithIndex.map { case (t, b) =>
      t.charAt(0) -> b.toByte }.toMap

  /** Encode to token ids under an IMPORTED GPT-2 merge table with full
    * SEGMENTATION parity: the raw text is split by GPT-2's own
    * pre-tokenizer regex (leading space retained on word tokens, so
    * 'Ġ'-prefixed word-initial merges fire), each pre-token's UTF-8
    * bytes map through [[Gpt2ByteAlphabet]], and the word-local merge
    * loop runs over the mapped symbols. Without this mapping an
    * imported GPT-2 table is mostly dead weight — raw words never
    * contain 'Ġ' and non-ASCII text is codepoints, not UTF-8-byte
    * symbols, so production token COUNTS (the budget/packing input)
    * come out materially wrong. Token IDS are [[Vocab]]-positional
    * (alphabet-then-merges); ID parity with a vocab.json is explicitly
    * out of scope. Unknown symbols map to `unkId`; null text stays
    * null. Same shuffle-free memoized-closure shape as [[encodeIds]].
    * Pass `vocabFromMerges(loadMergesTxt(...), Gpt2ByteAlphabet)`. */
  def encodeIdsGpt2(docs: DataFrame, idCol: String, textCol: String,
                    vocab: Vocab, out: String = "token_ids",
                    unkId: Int = -1): DataFrame = {
    val ranks = rankMap(vocab.merges.map(m => (m.left, m.right)).toArray)
    val ids = vocab.idOf
    // per-closure memo, the wordwise pattern: each task deserializes
    // its own copy — task-local, no locks, capped as a backstop
    val memo = mutable.HashMap.empty[String, Array[Int]]
    val enc = udf { (text: String) =>
      if (text == null) null
      else {
        val outIds = mutable.ArrayBuffer.empty[Int]
        val m = Gpt2Pat.matcher(text)
        while (m.find()) {
          val w = m.group()
          if (memo.size > (1 << 16)) memo.clear()
          outIds ++= memo.getOrElseUpdate(w,
            encodeRanked(gpt2MapBytes(w), ranks)
              .map(t => ids.getOrElse(t, unkId)))
        }
        outIds.toSeq
      }
    }
    docs.select(col(idCol), enc(col(textCol)).as(out))
  }

  // -------------------------------------------------------------------

  /** Unicode code points as strings (surrogate pairs stay whole). */
  private def toSymbols(w: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out
  }

  /** Replace adjacent (left, right) with left+right, leftmost-greedy,
    * non-overlapping — the classic BPE application order. Returns the
    * input buffer untouched when the pair is absent. */
  private def mergeIn(syms: mutable.ArrayBuffer[String],
                      p: (String, String)): mutable.ArrayBuffer[String] = {
    var found = false
    var j = 0
    while (!found && j < syms.length - 1) {
      found = syms(j) == p._1 && syms(j + 1) == p._2
      j += 1
    }
    if (!found) return syms
    val out = new mutable.ArrayBuffer[String](syms.length)
    j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
        out += p._1 + p._2
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out
  }

  private def pairLt(a: (String, String), b: (String, String)): Boolean =
    b == null || a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
}
