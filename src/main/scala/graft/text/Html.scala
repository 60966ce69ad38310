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
