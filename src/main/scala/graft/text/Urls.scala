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

  /** Canonicalize an absolute http(s) URL — the normalization step
    * BEFORE URL-keyed dedup/joins (two spellings of one page must
    * collide). The common-subset rules, each a pure-Column RE2-safe
    * regex a SQL oracle can mirror verbatim:
    *   1. trim;
    *   2. drop the fragment (`#…`);
    *   3. lowercase scheme + host (path, query, and RFC 3986
    *      userinfo are case-significant and stay);
    *   4. drop default ports (`:80` for http, `:443` for https);
    *   5. drop tracking params (`utm_*`, `gclid`, `fbclid`) wherever
    *      they sit in the query string, then a dangling `?`;
    *   6. drop the trailing slash of a bare-host URL.
    * Steps 1–3 apply to ANY absolute scheme (ftp:// hosts case-fold
    * too); 4–6 are http(s)-shaped by pattern. Relative inputs get
    * steps 1–2 only (nothing to case-fold — fail-safe passthrough,
    * not an error). Null stays null. */
  def normalize(url: Column): Column = {
    // scheme :// [userinfo@] host rest — userinfo is case-SIGNIFICANT
    // (RFC 3986) and must not fold; only scheme + host lowercase
    val parts = "(?s)^([a-zA-Z][a-zA-Z0-9+.-]*)://((?:[^/?#@]*@)?)([^/?#]*)(.*)$"
    val t = regexp_replace(trim(url), "(?s)#.*$", "")
    val cased = when(t.rlike(parts),
      concat(lower(regexp_extract(t, parts, 1)), lit("://"),
        regexp_extract(t, parts, 2),
        lower(regexp_extract(t, parts, 3)),
        regexp_extract(t, parts, 4))).otherwise(t)
    val noPort = regexp_replace(regexp_replace(cased,
      "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    // tracker removal is scoped to the QUERY STRING: split at the
    // first '?', clean only the query, reassemble — an `&utm_…=`
    // lookalike in the PATH must survive (and a query VALUE may
    // legally contain '?', which the in-query patterns tolerate)
    val base = regexp_extract(noPort, "(?s)^([^?]*)", 1)
    val query = regexp_extract(noPort, "(?s)^[^?]*(\\?.*)$", 1)
    val trackers = "(utm_[^=&#]*|gclid|fbclid)"
    val cleanedQ = regexp_replace(regexp_replace(regexp_replace(query,
      s"&$trackers=[^&#]*", ""),
      s"^\\?$trackers=[^&#]*&", "?"),
      s"(?s)^\\?$trackers=[^&#]*$$", "")
    val noTrack = concat(base, regexp_replace(cleanedQ, "^\\?$", ""))
    regexp_replace(noTrack,
      "^([a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#]+)/$", "$1")
  }
}
