package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, document fingerprinting.
  *
  * All pure-Column (codegen'd, no UDFs) so they stay inside whole-stage
  * codegen and scale linearly with input — nothing here shuffles.
  */
object TextAnalysis {

  /** CJK ideographs (+ext A, compat) and kana, tokenized ONE PER
    * CODEPOINT — the standard cheap segmentation for scripts that
    * don't space-delimit words (what CCNet/Gopher-style pipelines do
    * before real segmenters): without it a Chinese/Japanese document
    * is ONE whitespace token and every downstream signal (minhash
    * grams, Gopher rules, LM grams, token budgets) silently degrades.
    * Hangul is NOT here: Korean text is space-delimited.
    * Spelled `\x{…}` — the ONE codepoint-escape syntax Java regex and
    * RE2 share, so a SQL oracle evaluates the SAME class. */
  val CjkCodepointClass: String =
    "[\\x{3400}-\\x{4dbf}\\x{4e00}-\\x{9fff}\\x{f900}-\\x{faff}" +
      "\\x{3040}-\\x{30ff}\\x{31f0}-\\x{31ff}]"

  /** The whitespace-split class, spelled EXPLICITLY because Java's
    * `\s` and RE2's `\s` disagree on U+000B (vertical tab — Java
    * includes it, RE2 does not): an explicit class is the only
    * spelling both engines read identically (the [[Html]] collapse
    * rule, applied to tokenization). Character-for-character equal to
    * Java `\s`, so Spark-side behavior is unchanged; the SQL mirrors
    * spell the same class. */
  val WsSplit: String = "[ \\t\\n\\f\\r\\x0B]+"

  /** Column-level let-binding: evaluate `a` and `b` exactly ONCE and
    * assemble the result from LAMBDA VARIABLES, which the body may
    * reference freely — the HOF-CSE workaround (lambda-variable
    * subtrees are excluded from Spark's subexpression elimination, so
    * a plain Column referenced k times evaluates k times). Cost: one
    * 1-element array allocation per side per row. Caveat, accepted:
    * the result is NULLABLE at the schema level (element_at) even
    * when the body never is. */
  private[text] def let2(a: Column, b: Column)(
      f: (Column, Column) => Column): Column =
    element_at(zip_with(array(a), array(b), f), 1)

  /** Thai, segmented at SCRIPT-RUN boundaries (not per codepoint —
    * Thai is alphabetic with combining vowels/tones; char-splitting
    * would shed bare combining marks as tokens). A Thai run embedded
    * in Latin text becomes its own token. */
  val ThaiRunClass: String = "[\\x{0e00}-\\x{0e7f}]+"

  /** Insert token boundaries around non-space-delimited scripts; a
    * no-op on text without those codepoints, so Latin-script corpora
    * tokenize exactly as before. Both replaces are codegen'd
    * scan-speed column work. */
  def scriptSpaced(text: Column): Column =
    regexp_replace(
      regexp_replace(text, s"($CjkCodepointClass)", " $1 "),
      s"($ThaiRunClass)", " $1 ")

  // precompiled: the JVM twin runs once per DOCUMENT inside encoder
  // UDFs — String.replaceAll would recompile both class patterns per
  // call (the Column side compiles once per task already)
  private val CjkPattern =
    java.util.regex.Pattern.compile(s"($CjkCodepointClass)")
  private val ThaiPattern =
    java.util.regex.Pattern.compile(s"($ThaiRunClass)")

  /** The JVM twin of [[scriptSpaced]] for driver/UDF-side
    * tokenization ([[Bpe]]) — same patterns, same semantics. */
  def scriptSpacedStr(text: String): String =
    ThaiPattern.matcher(
      CjkPattern.matcher(text).replaceAll(" $1 ")).replaceAll(" $1 ")

  /** Script-aware whitespace tokens, empties dropped: whitespace
    * split after [[scriptSpaced]] boundary insertion — bit-identical
    * to plain whitespace tokens on Latin text. */
  def tokens(text: Column): Column =
    filter(split(trim(scriptSpaced(text)), WsSplit), t => length(t) > 0)

  /** PLAIN whitespace tokens (no script spacing) — the tokenization
    * for operators that RECONSTRUCT text from tokens
    * ([[graft.text.Dedup.dropRepeatedSpans]], [[chunkByTokens]]):
    * rebuilding with `concat_ws(" ")` must be the inverse of the
    * split, and script-aware splitting would permanently inject
    * spaces between every CJK codepoint of an untouched document.
    * Consequence, documented: those operators match/cut/chunk at
    * whitespace-word granularity, so an unsegmented CJK run is one
    * unit — coarser matching, but text-preserving. Identical to
    * [[tokens]] on Latin text. */
  def wsTokens(text: Column): Column =
    filter(split(trim(text), WsSplit), t => length(t) > 0)

  /** Unicode normalization for training text — the cleanup pass real
    * pipelines run before any hashing/counting, because visually
    * identical strings must collide in dedup and count once in
    * vocabularies:
    *  1. strip control characters except \t \n \r;
    *  2. strip zero-width characters (ZWSP/ZWNJ/ZWJ, BOM) and the
    *     soft hyphen — invisible bytes that split tokens and defeat
    *     exact dedup;
    *  3. NFC-normalize (composed form), so "café" spelled e+combining
    *     acute equals the precomposed spelling.
    * NFC (not NFKC): compatibility folding is lossy (ligatures,
    * superscripts) and NFC is what SQL engines expose
    * (nfc_normalize), keeping the op oracle-mirrorable. Steps 1–2 are
    * codegen regex; NFC is a cheap scalar UDF (no Column form
    * exists). Null → null. */
  def normalizeUnicode(text: Column): Column = {
    val stripped = regexp_replace(regexp_replace(text,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "[\\x{200B}-\\x{200D}\\x{FEFF}\\x{00AD}]", "")
    NfcUdf(stripped)
  }

  private lazy val NfcUdf = udf((s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  /** Token count; null text → null (the SQL mirror), never size()'s -1. */
  def tokenCount(text: Column): Column =
    when(text.isNotNull, size(tokens(text)).cast(LongType))

  /** BPE-ish token count: runs of letters, single digits, or any other
    * non-space symbol each count as one token (a cheap, deterministic
    * stand-in for a real subword tokenizer's token count). */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast(LongType)

  /** Fraction of characters that are ASCII letters. */
  def alphaRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^A-Za-z]", "")).cast(DoubleType) /
        length(text))
      .otherwise(lit(0.0))

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^\\p{Punct}]", "")).cast(DoubleType) /
        length(text))
      .otherwise(lit(0.0))

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this", "be")

  /** Fraction of tokens that are stopwords (quality signal: natural prose
    * has a stable stopword rate; keyword spam / boilerplate does not).
    * ONE tokenization + ONE traversal, ratio computed in aggregate's
    * finish lambda: the earlier size(filter(toks))/size(toks) form
    * evaluated tokens() three times per row — HOF subtrees are not
    * subexpression-eliminated in interpreted projections, and this is
    * the hot term of every per-doc quality pass (q122 A/B at sf10:
    * 69 s → 46 s for the whole domain-quality gate). Values
    * identical. */
  def stopwordRatio(text: Column,
                    stopwords: Seq[String] = EnglishStopwords): Column =
    // coalesce-empty: aggregate(null array) is NULL, but this function
    // has always returned 0.0 for null text (size(null) = -1 routed the
    // old form to the otherwise branch) — null and '' behave alike here
    aggregate(tokens(lower(coalesce(text, lit("")))),
      struct(lit(0L).as("n"), lit(0L).as("s")),
      (a, t) => struct(
        (a.getField("n") + 1L).as("n"),
        (a.getField("s") + when(t.isin(stopwords.map(lit): _*), 1L)
          .otherwise(0L)).as("s")),
      a => when(a.getField("n") > 0,
        a.getField("s").cast(DoubleType) / a.getField("n"))
        .otherwise(lit(0.0)))

  /** Mean token length — one tokenization + one traversal (the
    * stopwordRatio finish-lambda form; the size/aggregate/size
    * spelling tokenized three times per row). */
  def meanTokenLength(text: Column): Column =
    // coalesce-empty: null text has always read 0.0 (see stopwordRatio)
    aggregate(tokens(coalesce(text, lit(""))),
      struct(lit(0L).as("n"), lit(0L).as("len")),
      (a, t) => struct((a.getField("n") + 1L).as("n"),
        (a.getField("len") + length(t)).as("len")),
      a => when(a.getField("n") > 0,
        a.getField("len").cast(DoubleType) / a.getField("n"))
        .otherwise(lit(0.0)))

  /** Composite quality score in [0,1]: favors texts with sane length,
    * high alpha ratio and a natural stopword rate. Deterministic. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast(DoubleType) / 500.0, lit(1.0))
    val alpha = alphaRatio(text)
    val stop = least(stopwordRatio(text) * 5.0, lit(1.0))
    round((lenScore + alpha + stop) / 3.0, 6)
  }

  /** Gopher quality-rule battery (Rae et al. 2021, Table A1) — the
    * standard pre-training document filter, each rule as its own flag
    * plus the conjunction. All pure-Column codegen, zero shuffle:
    *
    *   word_count_ok     50 ≤ words ≤ 100,000
    *   mean_word_len_ok  3 ≤ mean word length ≤ 10
    *   symbol_ratio_ok   (# of '#' or '…'/'...') / words < 0.1
    *   bullet_lines_ok   < 90% of lines start with a bullet
    *   ellipsis_lines_ok < 30% of lines end with an ellipsis
    *   alpha_words_ok    ≥ 80% of words contain an alphabetic char
    *   stopwords_ok      ≥ 2 distinct hits from Gopher's 8-stopword list
    *
    * (Bullet/ellipsis thresholds follow the paper: drop when ≥90% of
    * lines are bullets or ≥30% end in ellipsis.) */
  def gopherFlags(text: Column): Column =
    gopherFlagsImpl(text,
      array(GopherEnglishStops.map(lit): _*),
      t => t.rlike("[A-Za-z]"),
      lit(3.0))

  /** Gopher's own 8-stopword list (Rae et al. 2021 Table A1) — the
    * English anchor of the keyed variant below. */
  val GopherEnglishStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** [[gopherFlags]] keyed by a per-row language column (r16): the
    * three English-scoped rules swap in per-language signals —
    * stopword hits from [[QualityStopwords]] (zh/ja lists are
    * single-codepoint function words, exactly the tokens the
    * script-aware tokenizer emits), the "alphabetic" token check
    * becomes the language's letter class (CJK ideographs/kana,
    * Cyrillic), and the mean-word-length floor drops to 1 for
    * single-codepoint scripts where 3 would flunk every document.
    * Thai (unsegmented, tokenized as SCRIPT RUNS): the letter class
    * and word-length bounds follow the script (floor 1, cap relaxed
    * to 80 — a run is clause-sized), and the stopword rule is EXEMPT
    * (stopwords_ok reads true, r17) — exact token matching cannot hit
    * a function word embedded in a run, so the rule would
    * unconditionally flunk all Thai prose and `keep` would never
    * pass; Gopher's own scope is English, and exempting the one
    * inapplicable rule keeps the other six meaningful for th (a
    * substring-hit rule would change the fold's semantics for every
    * language and is deliberately not done here). Pinned by the q131
    * gate.
    * `gopherFlagsByLang(text, lit("en"))` ≡ [[gopherFlags]] except
    * the stopword list (Gopher's own 8 vs the quality table) — the
    * unkeyed form stays the gate-pinned English anchor. */
  def gopherFlagsByLang(text: Column, lang: Column): Column =
    // let2: lang evaluates once per ROW; inside the token fold only
    // the bound lambda variable is consulted (string compares), never
    // an embedded langId expression
    let2(lang, lit(0)) { (l, _) =>
      gopherFlagsImpl(text,
        stopword8For(l),
        t => when(l.isin("zh", "ja"), t.rlike(CjkLetterClass))
          .when(l === "th", t.rlike(ThaiLetterClass))
          .when(l === "ru", t.rlike(CyrillicLetterClass))
          .otherwise(t.rlike("[A-Za-z]")),
        // zh/ja tokens are single codepoints (floor 1); th tokens are
        // whole SCRIPT RUNS (floor 1, and the 10-char English cap
        // would flunk every document — a run is clause-sized, so the
        // cap relaxes to 80 rather than losing the rule entirely)
        when(l.isin("zh", "ja", "th"), lit(1.0)).otherwise(lit(3.0)),
        when(l === "th", lit(80.0)).otherwise(lit(10.0)),
        // the 50-token volume floor counts RUNS for th (~6 English
        // words each), so it scales down to 8 — otherwise the floor is
        // ~6x stricter for Thai than for the English anchor
        when(l === "th", lit(8L)).otherwise(lit(50L)),
        // th: stopword rule exempt (see doc above)
        stopRuleExempt = l === "th")
    }

  private def gopherFlagsImpl(text: Column, stopArr: Column,
                              isWordToken: Column => Column,
                              mwlLo: Column,
                              mwlHi: Column = lit(10.0),
                              wcLo: Column = lit(50L),
                              stopRuleExempt: Column = lit(false)): Column = {
    // ONE traversal of the token stream and ONE of the line list.
    // The flag-per-subexpression form re-evaluated tokens() ~8x per
    // row (HOF subtrees are excluded from subexpression elimination —
    // lambda variables break CSE), which made the per-doc Gopher pass
    // the q122-class hot spot. q102 A/B at sf10, each step measured:
    // 49 s (flag-per-subexpression) -> 25 s (single folds) -> 16 s
    // (one lower(t) per token via array_position + the symCount pack
    // in the let-binding, so keep's conjunction re-reads lambda
    // variables instead of re-running the two symbol scans). Values
    // are bit-identical: same counts, same thresholds, same field
    // order.
    // per-token fold: count, summed length, alphabetic-token count,
    // and a distinct-stopword bitmask (bit i = stopword i seen)
    val safeText = coalesce(text, lit(""))
    val tokAgg = aggregate(tokens(safeText),
      struct(lit(0L).as("n"), lit(0L).as("len"),
        lit(0L).as("alpha"), lit(0).as("mask")),
      (a, t) => struct(
        (a.getField("n") + 1L).as("n"),
        (a.getField("len") + length(t)).as("len"),
        (a.getField("alpha") +
          when(isWordToken(t), 1L).otherwise(0L)).as("alpha"),
        // ONE lower(t) per token: the 8-way when-chain re-lowercased
        // per branch; array_position scans the 8 literals against one
        // lowered value, and shiftleft-by-column turns the 1-based
        // index into the bit
        a.getField("mask").bitwiseOR({
          val idx = array_position(stopArr, lower(t))
          when(idx > 0, call_function("shiftleft", lit(1),
            (idx - 1L).cast(IntegerType))).otherwise(lit(0))
        }).as("mask")))
    // per-line fold: count, bullet-start count, ellipsis-end count
    val lineAgg = aggregate(
      filter(split(safeText, "\n"), l => length(trim(l)) > 0),
      struct(lit(0L).as("n"), lit(0L).as("bullet"), lit(0L).as("ell")),
      (a, l) => struct(
        (a.getField("n") + 1L).as("n"),
        (a.getField("bullet") + when(trim(l)
          .rlike("^([\\u2022\\u2023\\u25aa\\u25cf\\-\\*])"), 1L)
          .otherwise(0L)).as("bullet"),
        (a.getField("ell") + when(trim(l)
          .rlike("(\\.\\.\\.|\\u2026)$"), 1L).otherwise(0L)).as("ell")))
    // symbol occurrences: '#' by removed-length, ellipses by split count
    // (regexp-removal length ÷ pattern width is ambiguous across the
    // 1-char '…' and 3-char '...' forms)
    val symCount =
      (length(safeText) -
        length(regexp_replace(safeText, "#", ""))).cast(DoubleType) +
      (size(split(safeText, "\\.\\.\\.|\\u2026", -1)) - 1)
        .cast(DoubleType)
    // let-binding ([[let2]]): tf and the (line fold, symCount) pack
    // become LAMBDA VARIABLES, so the flag struct — including keep's
    // conjunction, which references every flag a second time — reads
    // each fold and the two symbol scans exactly once per row
    let2(tokAgg, struct(lineAgg.as("lf"), symCount.as("sym"))) {
      (tf, pack) =>
      val lf = pack.getField("lf")
      val sym = pack.getField("sym")
      val nW = tf.getField("n")
      val nWd = nW.cast(DoubleType)
      val mwl = when(nW > 0,
        tf.getField("len").cast(DoubleType) / nWd).otherwise(lit(0.0))
      val bulletFrac = when(lf.getField("n") > 0,
        lf.getField("bullet").cast(DoubleType) /
          lf.getField("n").cast(DoubleType)).otherwise(lit(0.0))
      val ellipsisFrac = when(lf.getField("n") > 0,
        lf.getField("ell").cast(DoubleType) /
          lf.getField("n").cast(DoubleType)).otherwise(lit(0.0))
      val alphaFrac = when(nW > 0,
        tf.getField("alpha").cast(DoubleType) / nWd).otherwise(lit(0.0))
      val stopHits = bit_count(tf.getField("mask"))
      val flags = Seq(
        "word_count_ok" -> (nW >= wcLo && nW <= 100000),
        "mean_word_len_ok" -> (mwl >= mwlLo && mwl <= mwlHi),
        "symbol_ratio_ok" ->
          when(nWd > 0, sym / nWd < 0.1).otherwise(lit(false)),
        "bullet_lines_ok" -> (bulletFrac < 0.9),
        "ellipsis_lines_ok" -> (ellipsisFrac < 0.3),
        "alpha_words_ok" -> (alphaFrac >= 0.8),
        "stopwords_ok" -> (stopRuleExempt || stopHits >= 2))
      struct((flags.map { case (n, c) => c.as(n) } :+
        flags.map(_._2).reduce(_ && _).as("keep")): _*)
    }
  }

  // ------------------------- per-language quality signals (r16) ----

  /** Per-language stopword tables for QUALITY signals — the top web
    * languages' most frequent function words. zh/ja entries are
    * single-codepoint function words: the script-aware tokenizer
    * emits CJK text one codepoint per token, so the same isin/
    * array_contains machinery covers them with no segmenter. Thai is
    * NOT here: its tokens are unsegmented script runs, so stopword
    * matching cannot apply — Thai quality falls back to the letter-
    * class signals only. QUALITY-only table: [[langId]] keeps its own
    * (gate-pinned, q48) detection table. */
  val QualityStopwords: Map[String, Seq[String]] = Map(
    "en" -> EnglishStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit",
      "ein", "zu", "den", "von", "im", "auf", "dem", "sich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "pour", "dans",
      "une", "des", "du", "en", "un", "au", "sur"),
    "es" -> Seq("el", "los", "las", "y", "es", "que", "por", "para",
      "una", "de", "en", "un", "con", "del", "se"),
    "it" -> Seq("il", "la", "le", "e", "che", "per", "una", "di",
      "in", "un", "con", "del", "non", "si", "sono"),
    "pt" -> Seq("o", "os", "as", "e", "que", "para", "uma", "de",
      "em", "um", "com", "do", "da", "se", "mais"),
    "nl" -> Seq("de", "het", "een", "en", "dat", "voor", "met", "van",
      "in", "op", "te", "niet", "aan", "zijn", "ook"),
    "ru" -> Seq("и", "в", "не", "на", "что", "с", "это", "как", "по",
      "но", "из", "у", "за", "от", "для"),
    "zh" -> Seq("的", "了", "是", "在", "和", "有", "我", "不", "这", "他"),
    "ja" -> Seq("の", "に", "は", "を", "た", "が", "で", "て", "と", "し"))

  /** Letter classes for the non-Latin scripts the keyed quality
    * signals cover — codepoints spelled explicitly (the cross-engine
    * regex policy; DuckDB mirrors spell the same ranges \x{…}). */
  val CjkLetterClass: String =
    "[\\u3040-\\u30ff\\u31f0-\\u31ff\\u3400-\\u4dbf" +
      "\\u4e00-\\u9fff\\uf900-\\ufaff]"
  val CyrillicLetterClass: String = "[\\u0400-\\u04ff]"
  val ThaiLetterClass: String = "[\\u0e00-\\u0e7f]"

  /** The quality-stopword ARRAY for a (per-row) language column;
    * unknown / unlisted languages fall back to English — the same
    * default the unkeyed signals always used. */
  def stopwordArrayFor(lang: Column): Column =
    QualityStopwords.toSeq.sortBy(_._1)
      .foldRight(array(EnglishStopwords.map(lit): _*)) {
        case ((l, ws), acc) =>
          when(lang === l, array(ws.map(lit): _*)).otherwise(acc)
      }

  /** First 8 quality stopwords per language (the Gopher-rule arity —
    * its distinct-hit bitmask is 8 bits wide); English keeps Gopher's
    * OWN 8-word list so `gopherFlagsByLang(_, lit("en"))` matches the
    * paper's rule, not the general quality table. */
  private def stopword8For(lang: Column): Column =
    QualityStopwords.toSeq.sortBy(_._1)
      .foldRight(array(GopherEnglishStops.map(lit): _*)) {
        case ((l, ws), acc) =>
          val eight = if (l == "en") GopherEnglishStops else ws.take(8)
          when(lang === l, array(eight.map(lit): _*)).otherwise(acc)
      }

  /** Run a battery of language-keyed signals under ONE langId
    * evaluation per row. A caller composing several ByLang signals in
    * one expression (a filter predicate especially — predicate
    * pushdown substitutes a materialized lang COLUMN back into every
    * conjunct) would otherwise pay one full detector run per signal;
    * here the detector output is let2-bound and the body receives the
    * bound lambda variable. */
  def withLangBound(text: Column)(f: Column => Column): Column =
    let2(langId(text), lit(0)) { (l, _) => f(l) }

  /** General row-level let-binding, public: evaluate `a` ONCE per row
    * and hand the body a lambda variable. The tool for composing an
    * EXPENSIVE derived column (an HTML extraction chain, a decoded
    * body) into several downstream signals inside one expression —
    * Spark's subexpression elimination skips HOF subtrees and both
    * CollapseProject and filter pushdown substitute a referenced alias
    * into every consumer, so without the binding the producer re-runs
    * once per signal (measured on the composed crawl front end: the
    * boilerplate-extraction battery ran ~8x per row). */
  def bound(a: Column)(f: Column => Column): Column =
    let2(a, lit(0)) { (x, _) => f(x) }

  /** [[stopwordRatio]] keyed by a per-row language column: ONE fold
    * (the same single-traversal discipline), membership against the
    * lang-selected array. The array (and through it `lang`) is
    * [[let2]]-BOUND — evaluated once per ROW, never per token: an
    * embedded `langId(text)` argument would otherwise re-run the
    * whole language detector for every token of every document
    * (measured 128 s → 2 s on the q126 shape at sf0.1). `lit("en")`
    * reproduces [[stopwordRatio]] bit-identically (same list, same
    * fold, same null policy). */
  def stopwordRatioByLang(text: Column, lang: Column): Column =
    let2(stopwordArrayFor(lang), lit(0)) { (sw, _) =>
      aggregate(tokens(lower(coalesce(text, lit("")))),
        struct(lit(0L).as("n"), lit(0L).as("s")),
        (a, t) => struct(
          (a.getField("n") + 1L).as("n"),
          (a.getField("s") +
            when(array_contains(sw, t), 1L)
              .otherwise(0L)).as("s")),
        a => when(a.getField("n") > 0,
          a.getField("s").cast(DoubleType) / a.getField("n"))
          .otherwise(lit(0.0)))
    }

  /** [[alphaRatio]] keyed by language: the "letter" class follows the
    * script — CJK ideographs/kana for zh/ja/th-adjacent text,
    * Cyrillic for ru, [A-Za-z] otherwise. Each branch keeps a LITERAL
    * regex (compiled once), never a per-row pattern column. */
  def alphaRatioByLang(text: Column, lang: Column): Column = {
    def ratio(cls: String) = when(length(text) > 0,
      length(regexp_replace(text,
        "[^" + cls.stripPrefix("[").stripSuffix("]") + "]", ""))
        .cast(DoubleType) / length(text)).otherwise(lit(0.0))
    // let2: `lang` evaluates once per row even when the caller embeds
    // a full langId(text) expression (3 branch tests otherwise = 3
    // detector runs)
    let2(lang, lit(0)) { (l, _) =>
      when(l.isin("zh", "ja"), ratio(CjkLetterClass))
        .when(l === "th", ratio(ThaiLetterClass))
        .when(l === "ru", ratio(CyrillicLetterClass))
        .otherwise(alphaRatio(text))
    }
  }

  /** [[qualityScore]] keyed by language: same composite (length,
    * letter ratio, 5× capped stopword rate — mean of three, 6dp),
    * with the letter class and stopword table following the lang
    * column. `lit("en")` ≡ [[qualityScore]] bit-identically. */
  def qualityScoreByLang(text: Column, lang: Column): Column =
    // bind lang ONCE for all three components (each would otherwise
    // evaluate its own copy of an embedded langId argument)
    let2(lang, lit(0)) { (l, _) =>
      val lenScore = least(length(text).cast(DoubleType) / 500.0, lit(1.0))
      val alpha = alphaRatioByLang(text, l)
      val stop = least(stopwordRatioByLang(text, l) * 5.0, lit(1.0))
      round((lenScore + alpha + stop) / 3.0, 6)
    }

  /** Detection stopword tables — the LATIN-script vote candidates.
    * en/de/fr/es are the original (gate-pinned) lists, unchanged;
    * it/pt/nl (r17) use DISTINCTIVE function words chosen to avoid
    * the high-frequency cross-language collisions ("de" fr/es/nl,
    * "en" es/nl/fr, "que" fr/es/pt, "o"/"e" es-conjunction/pt) so
    * adding candidates cannot outvote an existing language on text
    * the old 4-way vote already classified — verified empirically:
    * zero prediction flips on the full sf0.1 corpus. ru/zh/ja/th are
    * NOT vote candidates: they are SCRIPT-routed (Cyrillic/kana/CJK/
    * Thai presence) before the vote ever runs. */
  private val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "pour", "dans", "une"),
    "es" -> Seq("el", "los", "las", "y", "es", "que", "por", "para", "una"),
    "it" -> Seq("il", "che", "di", "per", "non", "sono", "della", "più",
      "anche"),
    "pt" -> Seq("não", "uma", "em", "do", "da", "os", "com", "mais", "foi"),
    "nl" -> Seq("het", "een", "dat", "van", "niet", "op", "te", "zijn",
      "ook"))

  /** Kana block (hiragana + katakana + katakana phonetic extensions) —
    * the ja/zh discriminator: running Japanese text always carries
    * kana (particles, inflections); Chinese never does. */
  val KanaClass: String = "[\\u3040-\\u30ff\\u31f0-\\u31ff]"

  /** Stopword/script-heuristic language ID (r17: script-class routing
    * first, then an argmax stopword vote over ALL seven Latin-script
    * table languages). Routing precedence, each a bounded-prefix
    * presence test:
    *
    *   kana → ja   (kanji ⊂ CJK, so ja must outrank the zh test;
    *                all-kanji Japanese still reads zh — documented)
    *   CJK ideograph → zh
    *   Thai script → th
    *   Cyrillic → ru
    *   otherwise: stopword vote over en/de/fr/es/it/pt/nl (ties by
    *   language-code order — deterministic), no hits → unknown.
    *
    * Before r17 the vote covered only en/de/fr/es and CJK routed
    * straight to zh — a Japanese doc was scored against CHINESE
    * function words downstream and it/pt/nl/ru were undetectable, so
    * the keyed-quality stack silently fell back to the English table
    * on 4 of its 10 claimed languages. A real system would use char
    * n-gram profiles; the Spark-side shape (pure Column, zero
    * shuffle) is identical. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val langs = LangStopwords.toSeq.sortBy(_._1)
    // ONE traversal of the token array accumulating all seven language
    // counts at once (aggregate over an int-array accumulator), argmax
    // in the finish lambda. The per-language size(filter(...)) form
    // re-evaluated tokens(lower(text)) once per language in `best` and
    // AGAIN per language in the tie-broken pick chain — HOF subtrees
    // are excluded from subexpression elimination, so the 7-language
    // vote cost ~56 tokenizations per row (measured 6x on q114;
    // optimization guide §1.2 step 2: fix per-task work). Semantics
    // are bit-identical: counts are exact-token isin hits, argmax ties
    // break to the FIRST language in code order (array_position finds
    // the first occurrence over the same sorted order), zero hits →
    // "unknown", and null text → "unknown" via the coalesce (the old
    // when-chain's null conditions fell through to the same literal).
    val zero = array(langs.map(_ => lit(0)): _*)
    val langNames = array(langs.map { case (l, _) => lit(l) }: _*)
    val vote = aggregate(
      toks,
      zero,
      (acc, t) => zip_with(
        acc,
        array(langs.map { case (_, sw) =>
          when(t.isin(sw.map(lit): _*), lit(1)).otherwise(lit(0)) }: _*),
        (a, b) => a + b),
      acc => {
        val best = array_max(acc)
        when(best > 0,
          element_at(langNames, array_position(acc, best).cast("int")))
          .otherwise(lit("unknown"))
      })
    scriptRouted(text, coalesce(vote, lit("unknown")))
  }

  /** The shared script-routing chain: kana → ja, CJK → zh, Thai → th,
    * Cyrillic → ru, else fall through to `vote`. One definition so
    * [[langId]] and [[langIdByJoin]] cannot drift. */
  private def scriptRouted(text: Column, vote: Column): Column =
    when(hasScript(text, KanaClass), lit("ja"))
      .when(hasCjk(text), lit("zh"))
      .when(hasScript(text, ThaiLetterClass), lit("th"))
      .when(hasScript(text, CyrillicLetterClass), lit("ru"))
      .otherwise(vote)

  /** Script-presence check, bounded to the first 4096 chars so a
    * pathological multi-MB document doesn't pay a full-text regex scan
    * — a doc whose FIRST in-script codepoint appears beyond 4 KB of
    * out-of-script prefix is overwhelmingly not that script anyway. */
  private def hasScript(text: Column, cls: String): Column =
    substring(text, 1, 4096).rlike(cls)

  /** CJK-ideograph presence (the zh route). Deliberately the HAN block
    * only — kana is checked separately (and first) for ja. */
  private def hasCjk(text: Column): Column =
    hasScript(text, "[\\u4e00-\\u9fff]")

  /** Scalable language ID: explode tokens → broadcast-join the stopword
    * table → per-(doc, lang) counts with partial aggregation → argmax.
    * Unlike the pure-Column [[langId]] (which re-evaluates the token array
    * per language), every stage is codegen'd and the per-doc state that
    * crosses the shuffle is one count per matched language. Same
    * script-routing chain and vote table as [[langId]] — the two forms
    * agree doc-for-doc (spec-pinned). Returns (idCol, pred_lang); docs
    * with no stopword hits and no routed script → "unknown". */
  def langIdByJoin(df: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val swRows = LangStopwords.toSeq.flatMap { case (lang, ws) =>
      ws.map(w => (lang, w)) }
    val sw = spark.createDataFrame(swRows).toDF("cand_lang", "tok")
    val toks = df.select(col(idCol),
      explode(tokens(lower(col(textCol)))).as("tok"))
    val counts = toks.join(broadcast(sw), "tok")
      .groupBy(col(idCol), col("cand_lang")).agg(count(lit(1)).as("n"))
    // argmax with the (n DESC, cand_lang ASC) tiebreak as a partial-
    // aggregatable min-of-struct — structs compare lexicographically, so
    // min((-n, lang)) picks max n then min lang. Replaces a window
    // (shuffle + per-doc sort) with a combinable aggregate.
    val best = counts.groupBy(col(idCol))
      .agg(min(struct((-col("n")).as("negn"),
        col("cand_lang").as("l"))).as("m"))
      .select(col(idCol), col("m.l").as("best_lang"))
    df.select(col(idCol), col(textCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol),
        scriptRouted(col(textCol),
          coalesce(col("best_lang"), lit("unknown"))).as("pred_lang"))
  }

  /** Token-window document chunking — the standard training-data prep op:
    * split each document into chunks of `chunkTokens` whitespace tokens
    * with `overlap` tokens carried between consecutive chunks. Pure
    * column work per row (no shuffle); emits (…, chunk_idx, chunk_text).
    * Deterministic, so oracle-checkable. */
  def chunkByTokens(df: org.apache.spark.sql.DataFrame, textCol: String,
                    chunkTokens: Int, overlap: Int)
      : org.apache.spark.sql.DataFrame = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val step = chunkTokens - overlap
    // wsTokens: chunk_text is REBUILT from the tokens — see [[wsTokens]]
    val toks = wsTokens(col(textCol))
    // chunk starts: 1, 1+step, … while start <= nTokens (1-based slice)
    val nChunks = greatest(
      ceil((size(toks) - lit(overlap)).cast(DoubleType) / step)
        .cast(IntegerType), lit(1))
    val chunks = transform(sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(toks, i * step + 1, lit(chunkTokens))))
    df.withColumn("__chunks", chunks)
      .select(df.columns.filter(_ != textCol).map(col).toIndexedSeq :+
        posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk_text")): _*)
  }

  /** Rolling-hash document fingerprint: fold token lengths through a
    * polynomial hash mod 1e9+7. Stable across engines (no overflow — the
    * accumulator stays < 31e9+max token length). */
  def fingerprint(text: Column): Column =
    aggregate(transform(tokens(text), t => length(t).cast(LongType)),
      lit(0L), (acc, v) => (acc * 31L + v) % 1000000007L)

  // ------------------------------------------------------------------
  // Repetition signals (the Gopher repetition-filter family, Rae et al.
  // 2021 Table A1): repetitious documents — boilerplate, scraped
  // navigation, keyword spam — are filtered on duplicate-line and
  // top-n-gram character fractions before training.

  /** Non-empty lines of a document. */
  def docLines(text: Column): Column =
    filter(split(text, "\n"), l => length(trim(l)) > 0)

  /** (n, chars) fold over a line array — the shared kernel of the
    * dup-line ratios (one traversal per array reference instead of a
    * re-split per size()/aggregate() — the gopherFlags HOF-CSE rule). */
  private def lineStats(ls: Column): Column =
    aggregate(ls,
      struct(lit(0L).as("n"), lit(0L).as("chars")),
      (a, l) => struct((a.getField("n") + 1L).as("n"),
        (a.getField("chars") + length(l)).as("chars")))

  /** Both dup-line ratios in ONE struct — (dup_line_ratio,
    * dup_line_char_ratio): total − distinct on line counts and on
    * line characters. Two folds (all lines, distinct lines), each
    * evaluated once under a zip_with let-binding; the separate-ratio
    * form re-split the document ~6x per row. */
  def dupLineRatios(text: Column): Column = {
    // coalesce-empty: null text has always read (0.0, 0.0) — the
    // pre-fold forms routed size(null) = -1 to their otherwise branch.
    // Nested let-bindings: the document is split into lines ONCE (the
    // outer transform binds ls), then both folds bind under [[let2]]
    // so the two ratios read them freely
    val safe = coalesce(text, lit(""))
    element_at(transform(array(docLines(safe)), ls =>
      let2(lineStats(ls), lineStats(array_distinct(ls))) { (a, d) =>
        struct(
          when(a.getField("n") > 0,
            (a.getField("n") - d.getField("n")).cast(DoubleType) /
              a.getField("n")).otherwise(lit(0.0)).as("dup_line_ratio"),
          when(a.getField("chars") > 0,
            (a.getField("chars") - d.getField("chars")).cast(DoubleType) /
              a.getField("chars")).otherwise(lit(0.0))
            .as("dup_line_char_ratio"))
      }), 1)
  }

  /** Fraction of non-empty lines that are repeats of an earlier line
    * (occurrences after the first of each distinct line / total lines).
    * O(lines) per row — the repeat count falls out of total − distinct,
    * no per-line membership scans. */
  def dupLineRatio(text: Column): Column =
    dupLineRatios(text).getField("dup_line_ratio")

  /** Fraction of line CHARACTERS inside repeated line occurrences
    * (Gopher counts characters, not lines — one giant duplicated
    * boilerplate block weighs more than many short ones). */
  def dupLineCharRatio(text: Column): Column =
    dupLineRatios(text).getField("dup_line_char_ratio")

  /** Word n-grams WITH duplicates (unlike `Dedup.wordNgrams`): needed to
    * count the most frequent gram. Documents with fewer than n tokens
    * yield no grams. */
  def wordNgramsRaw(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Per-doc char mass (count × gram length) of the most frequent word
    * n-gram — relational, with NO gram strings anywhere: grams travel as
    * (xxhash64 of n token hashes, length = Σ token lengths + n−1), so
    * the two shuffles carry (id, long) keys and a long, never text.
    * Variants measured at sf0.1 under honest timing (r12): string-keyed
    * relational 5.4 s; in-row array_sort + HOF run-length scan 7.8 s
    * (interpreted lambdas lose to the codegen'd exchange); this form
    * 0.9 s. A fused both-sizes-in-one-explode variant (tag each gram
    * struct with n, concat the arrays, one (id,n,g) shuffle) measured
    * SLOWER at sf0.1 AND 10× (r13: 8.6 s vs 11.7 s at sf1) — the
    * per-row concat materialization costs more than the extra scans
    * while Spark runs the two subtrees' stages concurrently; revisit
    * only on genuinely IO-bound storage where a corpus scan dominates.
    * Ties break like max(struct(count, mass)): highest count
    * first, then mass, so a long-but-rare gram cannot inflate the
    * ratio. */
  private def topGramCharMass(df: org.apache.spark.sql.DataFrame,
                              idCol: String, textCol: String, n: Int,
                              out: String): org.apache.spark.sql.DataFrame = {
    val toks = tokens(col(textCol))
    val gramStructs =
      when(size(col("__th")) >= n,
        transform(sequence(lit(1), size(col("__th")) - (n - 1)), i =>
          struct(
            xxhash64((0 until n).map(j =>
              element_at(col("__th"), i + lit(j))): _*).as("g"),
            ((0 until n).map(j => element_at(col("__tl"), i + lit(j)))
              .reduce(_ + _) + lit((n - 1).toLong)).as("len"))))
      .otherwise(array().cast(ArrayType(StructType(Seq(
        StructField("g", LongType, nullable = false),
        StructField("len", LongType, nullable = false))))))
    df.select(col(idCol),
        transform(toks, t => xxhash64(t)).as("__th"),
        transform(toks, t => length(t).cast(LongType)).as("__tl"))
      .select(col(idCol), explode(gramStructs).as("ge"))
      .select(col(idCol), col("ge.g").as("g"), col("ge.len").as("len"))
      .groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("cnt"), max(col("len")).as("len"))
      .groupBy(col(idCol))
      .agg(max(struct(col("cnt").as("c"),
        (col("cnt") * col("len")).as("mass")))
        .getField("mass").as(out))
  }

  /** Per-document repetition stats: duplicate-line ratios (pure codegen
    * column work) plus the character fraction of the single most
    * frequent word 2-gram and 3-gram (see [[topGramCharMass]] — the
    * relational form whose shuffles carry only longs). */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), dupLineRatios(col(textCol)).as("__r"),
        length(col(textCol)).cast(LongType).as("n_chars"))
      .select(col(idCol),
        round(col("__r.dup_line_ratio"), 6).as("dup_line_ratio"),
        round(col("__r.dup_line_char_ratio"), 6).as("dup_line_char_ratio"),
        col("n_chars"))
      .join(topGramCharMass(df, idCol, textCol, 2, "top2"), Seq(idCol), "left")
      .join(topGramCharMass(df, idCol, textCol, 3, "top3"), Seq(idCol), "left")
      .select(col(idCol), col("dup_line_ratio"), col("dup_line_char_ratio"),
        round(coalesce(col("top2"), lit(0L)).cast(DoubleType) /
          greatest(col("n_chars"), lit(1L)), 6).as("top2gram_ratio"),
        round(coalesce(col("top3"), lit(0L)).cast(DoubleType) /
          greatest(col("n_chars"), lit(1L)), 6).as("top3gram_ratio"))
}
