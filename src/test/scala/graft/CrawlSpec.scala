package graft

import org.apache.spark.sql.functions._
import graft.sources.{Crawl, Warc}

/** The one-call crawl front end: WARC records → clean docs, batch and
  * streaming. */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private val goodText = "the quick brown fox jumps over the lazy dog " +
    "and it is a very good day for all of the people in this town to " +
    "walk outside and enjoy the weather with friends and family members"

  private def rec(id: String, uri: String, payload: Array[Byte],
                  ct: String = "application/http; msgtype=response") =
    ("f", id, "response", uri, "2026-01-01T00:00:00Z", ct,
      payload.length.toLong, payload)

  private def page(body: String, status: Int = 200,
                   ct: String = "text/html; charset=utf-8") =
    Warc.wrapHttp(body.getBytes("UTF-8"), status = status,
      contentType = ct)

  private def rows = {
    val html = "<html><head><title>T</title></head><body>" +
      "<nav><a href=\"/\">Home page</a> <a href=\"/a\">About us</a> " +
      "<a href=\"/c\">Contact info</a></nav>" +
      s"<p>$goodText</p></body></html>"
    val zhBody = "<meta charset=\"GBK\">" +
      ("这是一个很好的例子。我们在这里有他的书。不是我的书。他说这是好的。" * 8)
    Seq(
      rec("r1", "https://ex.com/good", page(html)),
      rec("r2", "https://ex.com/missing", page(html, status = 404)),
      rec("r3", "https://ex.com/noindex", page(
        "<html><head><meta name=\"robots\" content=\"noindex\"></head>" +
          s"<body><p>$goodText</p></body></html>")),
      rec("r4", "https://ex.com/junk", page(
        "<html><body><p>#### #### #### #### #### #### ####</p>" +
          "</body></html>")),
      rec("r5", "https://ex.com/zh", Warc.wrapHttp(
        zhBody.getBytes("GBK"), status = 200, contentType = "text/html")),
      rec("r6", "https://ex.com/plain", goodText.getBytes("UTF-8"),
        ct = "text/plain"))
      .toDF("file", "record_id", "warc_type", "target_uri", "warc_date",
        "content_type", "content_length", "payload")
  }

  test("cleanDocs: 2xx gate, robots drop, boilerplate strip, charset " +
       "decode, language-keyed quality — one call") {
    val out = Crawl.cleanDocs(rows).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("r1", "r5", "r6"),
      s"expected r1/r5/r6 to survive, got ${out.keySet}")
    val r1 = out("r1")
    assert(r1.getString(2) == "en" && r1.getString(3) == "UTF-8")
    val clean1 = r1.getString(4)
    assert(clean1.contains("quick brown fox") &&
      !clean1.contains("Home page"), s"boilerplate leaked: $clean1")
    val r5 = out("r5")
    assert(r5.getString(2) == "zh" && r5.getString(3) == "GBK",
      s"zh page must decode via the meta-sniffed charset: $r5")
    assert(r5.getString(4).contains("这是一个很好的例子"))
    // non-HTTP capture passes through, decoded under the UTF-8 default
    assert(out("r6").getString(3) == "UTF-8" &&
      out("r6").getString(4).contains("quick brown fox"))
  }

  test("cleanDocs is streaming-compatible: the same call runs inside " +
       "readStream (no state, no watermark)") {
    val dir = java.nio.file.Files.createTempDirectory("crawlstream")
    val src = dir.resolve("in").toString
    rows.write.parquet(src)
    val stream = spark.readStream.schema(Warc.schema).parquet(src)
    assert(stream.isStreaming)
    val q = Crawl.cleanDocs(stream).writeStream
      .format("memory").queryName("crawl_clean")
      .option("checkpointLocation", dir.resolve("ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("crawl_clean").select("record_id")
      .collect().map(_.getString(0)).toSet
    assert(got == Set("r1", "r5", "r6"), s"streaming survivors: $got")
  }
}
