package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL surface for web-corpus pipelines (C4/RefinedWeb-style curation):
  * extract links from document text, reduce them to registrable hosts,
  * and let the caller aggregate per-domain stats (the standard signal
  * for source filtering, dedup-by-origin, and robots/blocklist joins).
  * Pure codegen column work; RE2-safe patterns so a native oracle can
  * apply them verbatim. */
object Urls {

  val UrlRe: String = "https?://[^\\s]+"
  /** host = everything after the scheme up to the first /, :, ?, or #. */
  val DomainRe: String = "https?://([^/\\s:?#]+)"

  /** All http(s) URLs in the text, in order. */
  def extract(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(0))

  /** Host part of one URL ('' when the pattern misses). */
  def domain(url: Column): Column =
    regexp_extract(url, DomainRe, 1)
}
