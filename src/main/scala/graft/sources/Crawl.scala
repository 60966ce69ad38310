package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The crawl front end as ONE call — [[Warc.read]] records in, clean
  * training-text documents out — the crawl-side counterpart of
  * [[graft.text.Dedup.standardPipeline]] (compose the two for
  * WARC → training corpus):
  *
  *   HTTP envelope strip (status + headers off, chunked decoding) →
  *   charset-aware body decode (header param → meta sniff → UTF-8) →
  *   2xx + robots-noindex drop → boilerplate removal (block
  *   segmentation + link-density scoring) → NFC/zero-width normalize →
  *   language ID + language-keyed quality and Gopher symbol gates.
  *
  * Every stage is a shuffle-free projection or filter, so the same
  * call works on a batch frame AND inside a streaming micro-batch
  * (no state, no watermark — wire it into
  * [[graft.streaming.StreamingDedup.ingest]] for continuous
  * ingestion). Cost note: the language detector runs once per row in
  * the keep-filter (one [[graft.text.TextAnalysis.withLangBound]]
  * battery) and once more for the output lang column of SURVIVORS —
  * computing lang before the filter would be substituted back into
  * every conjunct by predicate pushdown and cost the same, paid on
  * dropped rows too (measured on the q126 shape; see BASELINE.md r16
  * pipeline stamp). */
object Crawl {

  /** Records → (record_id, url, lang, charset, clean_text). Non-HTTP
    * records pass through with their payload as the body (the
    * [[Warc.stripHttp]] rule); non-2xx responses and robots-noindex
    * pages drop; documents below `minQuality` (language-keyed
    * composite score) or failing Gopher's symbol-ratio rule drop. */
  def cleanDocs(records: DataFrame,
                minQuality: Double = 0.3): DataFrame = {
    import graft.text.{Html, TextAnalysis}
    val decoded = Warc.decodeBody(Warc.stripHttp(records), out = "__body")
    // ONE struct per row binds the extraction chain AND the language
    // detector (TextAnalysis.bound / withLangBound): without the
    // bindings every downstream signal re-ran the whole boilerplate
    // battery — alias substitution through projections/filters plus
    // no HOF subexpression elimination made the composed call ~8
    // extractions per row (measured: 33 s -> see BASELINE r16 for the
    // A/B at sf0.1 on the q130 shape)
    val scoreStruct = TextAnalysis.bound(
      TextAnalysis.normalizeUnicode(
        Html.dropBoilerplate(col("__body")).getField("clean_text"))) {
      clean =>
        TextAnalysis.withLangBound(clean) { l =>
          struct(clean.as("clean_text"), l.as("lang"),
            (TextAnalysis.qualityScoreByLang(clean, l) >= minQuality &&
              TextAnalysis.gopherFlagsByLang(clean, l)
                .getField("symbol_ratio_ok")).as("keep"))
        }
    }
    decoded
      .filter(col("http_status").isNull || // non-HTTP capture: keep
        (col("http_status") >= 200 && col("http_status") < 300))
      .filter(!coalesce(Html.metaRobotsNoindex(col("__body")), lit(false)))
      .select(col("record_id"), col("target_uri").as("url"),
        col("charset"), scoreStruct.as("__s"))
      .filter(col("__s.keep"))
      .select(col("record_id"), col("url"), col("__s.lang").as("lang"),
        col("charset"), col("__s.clean_text").as("clean_text"))
  }
}
