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
    * whitespace collapsed and trimmed. Null html → null. */
  def extractText(html: Column): Column =
    when(html.isNotNull,
      trim(regexp_replace(decodeEntities(stripTags(html)), "\\s+", " ")))

  /** First <title> element's decoded text ('' when absent). */
  def title(html: Column): Column =
    when(html.isNotNull, trim(decodeEntities(
      regexp_extract(html, "(?is)<title\\b[^>]*>(.*?)</title>", 1))))

  /** href values of <a> tags, in document order. */
  def links(html: Column): Column =
    when(html.isNotNull, regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*?href\\s*=\\s*\"([^\"]*)\""), lit(1)))

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
