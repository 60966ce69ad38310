package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first stage of every crawl pipeline
  * (the reference has no counterpart; north-star surface like the rest
  * of the text-curation family). All pure-Column regex/replace work:
  * codegen'd, zero shuffle, runs at scan speed and composes with
  * pushdown. The regex subset is deliberately RE2-safe (no
  * backreferences, no lookaround) so a SQL engine's regex evaluates
  * the SAME transforms — the q108 oracle mirrors these expressions
  * verbatim in DuckDB.
  *
  * Scope (documented): tag-level extraction — script/style/comment
  * blocks removed, tags stripped, the common named entities decoded,
  * whitespace collapsed. Boilerplate REMOVAL (link-density trafilatura
  * heuristics) is a separate, model-ish concern layered on top of
  * [[TextAnalysis]] quality signals; malformed-HTML recovery follows
  * the regexes (an unclosed <script> swallows to end of document, the
  * conventional fail-closed direction for training data).
  *
  * Known cross-engine corner, accepted: `(?i)` is ASCII-only in Java
  * but Unicode-folding in RE2, so exotic case-fold lookalikes (the
  * long s U+017F in `<ſcript>`) are treated as tags by an RE2 oracle
  * and not here — real HTML tag names are ASCII, and the gate's
  * synthesized markup is too. The `\s` width difference (U+000B) IS
  * handled: the collapse class is spelled explicitly.
  */
object Html {

  /** script/style/comment blocks, then every remaining tag. The `|$`
    * alternative makes an UNCLOSED block swallow to end of document
    * (fail-closed: script/style text never leaks into training text). */
  private def stripTags(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?(</script>|$)", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?(</style>|$)", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?(-->|$)", " ")
    regexp_replace(noComment, "<[^>]+>", " ")
  }

  /** The common named/numeric entities (fixed chain — identical
    * literal replaces on any engine). `&amp;` LAST so `&amp;lt;`
    * decodes to the literal `&lt;`, not `<` (the standard single-pass
    * decode order). */
  private def decodeEntities(c: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
      "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (k, v)) => regexp_replace(acc, k, v) }
  }

  /** Visible text: blocks removed, tags stripped, entities decoded,
    * whitespace collapsed and trimmed. Null html → null. The collapse
    * class is spelled out explicitly because Java's `\s` and RE2's
    * `\s` DISAGREE on U+000B (vertical tab) — an explicit class is
    * the only spelling both engines read identically. */
  def extractText(html: Column): Column =
    when(html.isNotNull,
      trim(regexp_replace(decodeEntities(stripTags(html)),
        "[ \\t\\n\\f\\r\\x0B]+", " ")))

  /** First <title> element's decoded text ('' when absent). */
  def title(html: Column): Column =
    when(html.isNotNull, trim(decodeEntities(
      regexp_extract(html, "(?is)<title\\b[^>]*>(.*?)</title>", 1))))

  /** href values of <a> tags, in document order. `\shref` (not bare
    * `href`) so attribute names merely ENDING in href — data-href and
    * friends — can't hijack the capture. */
  def links(html: Column): Column =
    when(html.isNotNull, regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*?\\shref\\s*=\\s*\"([^\"]*)\""), lit(1)))

  // -------------------------------------------------------------------
  // Boilerplate removal — the stage between tag-level extraction and
  // quality filtering (the jusText/trafilatura idea, v1-simplified):
  // segment the page into BLOCKS at block-level tag boundaries, score
  // each block by word count and link density, keep content blocks.
  // Navigation bars, footers, and "related links" rows are short
  // and/or link-dominated; article text is neither. All pure-Column
  // (regex + HOFs) and RE2-safe, so a SQL oracle evaluates the SAME
  // segmentation and scoring (the q115 gate mirrors it verbatim).

  /** Block-level boundary tags: splitting on these leaves inline
    * markup (<a>, <b>, <span>, …) INSIDE blocks, where link density
    * is measured. */
  val BlockTagRe: String =
    "(?i)</?(?:p|div|section|article|main|td|th|tr|li|ul|ol|table|" +
      "h1|h2|h3|h4|h5|h6|header|footer|nav|aside|blockquote|br|hr|" +
      "body|html|head|title|form|figure|figcaption|dl|dt|dd|pre)" +
      "\\b[^>]*>"

  private val WsClass = "[ \\t\\n\\f\\r\\x0B]+"

  /** A block's visible text: inline tags stripped, entities decoded,
    * whitespace collapsed. */
  private def blockText(b: Column): Column =
    trim(regexp_replace(decodeEntities(
      regexp_replace(b, "<[^>]+>", " ")), WsClass, " "))

  /** Characters of text inside the block's <a> elements (an UNCLOSED
    * anchor contributes nothing — fail-open toward keeping: a parse
    * ambiguity should never delete prose). */
  private def linkChars(b: Column): Column =
    coalesce(aggregate(
      regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
      lit(0L), (acc, a) => acc + length(blockText(a))), lit(0L))

  /** Boilerplate-dropped page text as
    * struct(clean_text, n_blocks, n_kept): script/style/comment
    * blocks removed, the page split at [[BlockTagRe]] boundaries,
    * then a block is KEPT iff it has at least `minWords`
    * script-aware tokens AND at most `maxLinkDensity` of its
    * characters inside anchors. `n_blocks` counts nonempty-text
    * blocks. One projection per row — zero shuffle, scan speed,
    * composes with [[extractText]]'s pushdown-friendly shape. */
  def dropBoilerplate(html: Column, minWords: Int = 5,
                      maxLinkDensity: Double = 0.4): Column = {
    val noHidden = regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?(</script>|$)", " "),
      "(?is)<style\\b[^>]*>.*?(</style>|$)", " "),
      "(?s)<!--.*?(-->|$)", " ")
    // score every block ONCE into (text, link chars) structs — the
    // naive filter-then-transform form re-ran the ~10-regex blockText
    // chain up to 4x per block (A/B at sf1, q115 shape: 18.8 s ->
    // 13.8 s; the residual cost is the interpreted HOF lambdas, linear
    // and embarrassingly parallel); this is also exactly the struct
    // shape the DuckDB mirror evaluates
    val scored = filter(
      transform(split(noHidden, BlockTagRe), b =>
        struct(blockText(b).as("t"), linkChars(b).as("lc"))),
      s => length(s.getField("t")) > 0)
    val kept = filter(scored, s =>
      size(TextAnalysis.tokens(s.getField("t"))) >= minWords &&
        s.getField("lc").cast("double") <=
          lit(maxLinkDensity) * length(s.getField("t")).cast("double"))
    when(html.isNotNull, struct(
      array_join(transform(kept, _.getField("t")), " ").as("clean_text"),
      size(scored).cast("long").as("n_blocks"),
      size(kept).cast("long").as("n_kept")))
  }

  /** True when the page opts out of indexing via
    * `<meta name="robots" content="… noindex …">` — crawl pipelines
    * honor it by dropping the page before training (the polite-crawl
    * convention). Attribute ORDER is free in HTML, so the check is
    * per-<meta>-tag: extract every meta tag, then require BOTH a
    * robots name and a noindex token in the same tag (quoted or bare
    * content values). RE2-safe, mirrorable, zero shuffle. Null html →
    * null. */
  def metaRobotsNoindex(html: Column): Column = {
    val tags = regexp_extract_all(html, lit("(?is)<meta\\b[^>]*>"), lit(0))
    // whitespace REQUIRED before the attribute name (data-name= must
    // not count — the links() `\shref` rule) and a word boundary
    // closing the noindex token (noindexing must not count)
    when(html.isNotNull, exists(tags, t =>
      t.rlike("(?is)\\sname\\s*=\\s*[\"']?robots\\b") &&
        t.rlike("(?is)\\scontent\\s*=\\s*(\"[^\"]*\\bnoindex\\b" +
          "|'[^']*\\bnoindex\\b|[^\"'\\s>]*\\bnoindex\\b)")))
  }

  /** The whole extraction as one projection:
    * (id, title, text, links, n_links). */
  def extractAll(df: org.apache.spark.sql.DataFrame, idCol: String,
                 htmlCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol),
      title(col(htmlCol)).as("title"),
      extractText(col(htmlCol)).as("text"),
      links(col(htmlCol)).as("links"),
      when(col(htmlCol).isNotNull,
        size(links(col(htmlCol))).cast("long")).as("n_links"))
}
