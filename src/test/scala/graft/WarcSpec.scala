package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.Warc
import graft.sources.Warc.Record

/** WARC (ISO 28500) container parsing: length-driven payloads, gzip
  * members, multi-file reads, fail-loud truncation. */
class WarcSpec extends SparkSpec {

  private val recs = Seq(
    Record("<urn:uuid:1>", "response", "https://ex.com/1",
      "2026-01-01T00:00:00Z", "text/html",
      "<html>hello</html>".getBytes(UTF_8)),
    // binary payload CONTAINING a version line + CRLFs: only
    // length-driven parsing survives this
    Record("<urn:uuid:2>", "response", "https://ex.com/2",
      "2026-01-01T00:00:01Z", "application/octet-stream",
      "WARC/1.0\r\n\r\nnot a record\u0000\u0001".getBytes(UTF_8)),
    Record("<urn:uuid:3>", "warcinfo", "", "2026-01-01T00:00:02Z",
      "application/warc-fields", Array.emptyByteArray))

  private def bytesOf(rs: Seq[Record]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    Warc.writeStream(rs.iterator, bos)
    bos.toByteArray
  }

  test("stream round-trip incl. a payload that embeds WARC markers " +
       "and an empty payload") {
    val back = Warc.parseStream(
      new ByteArrayInputStream(bytesOf(recs)), "mem").toSeq
    assert(back.map(_.recordId) == recs.map(_.recordId))
    assert(back.map(_.warcType) == Seq("response", "response", "warcinfo"))
    back.zip(recs).foreach { case (b, r) =>
      assert(java.util.Arrays.equals(b.payload, r.payload), b.recordId)
    }
  }

  test("Warc.write (r16): distributed read→write→read round-trip, " +
       "gzip + plain shards, HTTP-framed payloads survive intact") {
    import org.apache.spark.sql.functions.col
    // records incl. an HTTP-framed payload (chunked!) and a payload
    // embedding WARC markers — the two hard cases for any re-emit
    val body = "curated page <b>kept</b> after filtering".getBytes(UTF_8)
    val rs = recs :+ Record("<urn:uuid:4>", "response",
      "https://ex.com/4", "2026-01-01T00:00:03Z",
      "application/http; msgtype=response",
      Warc.wrapHttp(body, 200, "text/html", chunked = true))
    val srcDir = java.nio.file.Files.createTempDirectory("win").toString
    val fos = new FileOutputStream(s"$srcDir/in.warc")
    Warc.writeStream(rs.iterator, fos); fos.close()
    val df = Warc.read(spark, s"$srcDir/*.warc")
    for (gz <- Seq(true, false)) {
      val outDir = java.nio.file.Files
        .createTempDirectory(s"wout$gz").toString
      val shards = Warc.write(df.repartition(2), outDir, gzip = gz)
      assert(shards.nonEmpty && shards.size <= 2)
      assert(shards.forall(_.endsWith(
        if (gz) ".warc.gz" else ".warc")))
      val back = Warc.read(spark,
        s"$outDir/*.warc${if (gz) ".gz" else ""}")
      val a = df.select("record_id", "warc_type", "target_uri",
        "warc_date", "content_type", "payload").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4),
          r.getAs[Array[Byte]](5).toSeq)).toSet
      val b = back.select("record_id", "warc_type", "target_uri",
        "warc_date", "content_type", "payload").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4),
          r.getAs[Array[Byte]](5).toSeq)).toSet
      assert(a == b, s"gzip=$gz round-trip drifted")
      // the HTTP envelope still strips cleanly after the round-trip
      val stripped = Warc.stripHttp(
        back.filter(col("record_id") === "<urn:uuid:4>"))
        .select("http_status", "body").collect()(0)
      assert(stripped.getInt(0) == 200)
      assert(java.util.Arrays.equals(
        stripped.getAs[Array[Byte]](1), body))
    }
    // null/empty record ids fail loudly — WARC requires stable ids
    val bad = df.withColumn("record_id",
      org.apache.spark.sql.functions.lit(""))
    val e = intercept[Exception] {
      Warc.write(bad, java.nio.file.Files
        .createTempDirectory("wbad").toString)
    }
    assert(e.getMessage.contains("record_id") ||
      Option(e.getCause).exists(_.getMessage.contains("record_id")))
  }

  test("read(): plain + gzip files in one glob, file-per-task grain") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    val f1 = new FileOutputStream(s"$dir/a.warc")
    f1.write(bytesOf(recs.take(2))); f1.close()
    val f2 = new java.util.zip.GZIPOutputStream(
      new FileOutputStream(s"$dir/b.warc.gz"))
    f2.write(bytesOf(recs.drop(2))); f2.close()
    val df = Warc.read(spark, s"$dir/*.warc*")
    assert(df.count() == 3)
    val byId = df.collect().map(r =>
      r.getString(1) -> (r.getString(3), r.getLong(6))).toMap
    assert(byId("<urn:uuid:1>") == (("https://ex.com/1", 18L)))
    assert(byId("<urn:uuid:3>")._2 == 0L)
    // payload bytes survive the gz member
    val p2 = df.filter(df("record_id") === "<urn:uuid:2>")
      .head().getAs[Array[Byte]]("payload")
    assert(java.util.Arrays.equals(p2, recs(1).payload))
  }

  test("header folding joins continuation lines; out-of-range or " +
       "non-numeric Content-Length fails loudly (never hangs)") {
    val folded = ("WARC/1.0\r\nWARC-Record-ID: <urn:uuid:9>\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: https://ex.com/very\r\n long:path\r\n" +
      "WARC-Date: d\r\nContent-Type: t\r\nContent-Length: 2\r\n\r\n" +
      "ok\r\n\r\n").getBytes(UTF_8)
    val r = Warc.parseStream(new ByteArrayInputStream(folded), "f").toSeq
    assert(r.head.targetUri == "https://ex.com/very long:path")
    assert(new String(r.head.payload, UTF_8) == "ok")
    for (bad <- Seq("abc", "-1", "4294967296")) {
      val g = s"WARC/1.0\r\nContent-Length: $bad\r\n\r\n".getBytes(UTF_8)
      val e = intercept[java.io.IOException] {
        Warc.parseStream(new ByteArrayInputStream(g), "badfile").toSeq
      }
      assert(e.getMessage.contains("badfile"), e.getMessage)
    }
  }

  test("stripHttp: splits status/content-type/body from " +
       "application/http payloads; non-http records pass through") {
    import org.apache.spark.sql.functions.col
    val body1 = "<html><p>hello &amp; goodbye</p></html>".getBytes(UTF_8)
    val body2 = "chunked body with\r\nembedded CRLFs".getBytes(UTF_8)
    val httpRecs = Seq(
      Record("<urn:uuid:h1>", "response", "https://ex.com/h1",
        "2026-01-01T00:00:00Z", "application/http; msgtype=response",
        Warc.wrapHttp(body1, 200, "text/html; charset=utf-8")),
      Record("<urn:uuid:h2>", "response", "https://ex.com/h2",
        "2026-01-01T00:00:01Z", "application/http;msgtype=response",
        Warc.wrapHttp(body2, 404, "text/plain", chunked = true)),
      // a non-HTTP payload must pass through untouched
      recs(1))
    val dir = java.nio.file.Files.createTempDirectory("warchttp").toString
    val f = new FileOutputStream(s"$dir/h.warc")
    f.write(bytesOf(httpRecs)); f.close()
    val df = Warc.stripHttp(Warc.read(spark, s"$dir/h.warc"))
    val byId = df.collect().map(r => r.getAs[String]("record_id") ->
      ((Option(r.getAs[Integer]("http_status")),
        Option(r.getAs[String]("http_content_type")),
        r.getAs[Array[Byte]]("body")))).toMap
    assert(byId("<urn:uuid:h1>")._1 == Some(200))
    assert(byId("<urn:uuid:h1>")._2 == Some("text/html; charset=utf-8"))
    assert(java.util.Arrays.equals(byId("<urn:uuid:h1>")._3, body1))
    assert(byId("<urn:uuid:h2>")._1 == Some(404))
    assert(java.util.Arrays.equals(byId("<urn:uuid:h2>")._3, body2),
      new String(byId("<urn:uuid:h2>")._3, UTF_8))
    // pass-through: nulls + body == payload
    assert(byId("<urn:uuid:2>")._1.isEmpty && byId("<urn:uuid:2>")._2.isEmpty)
    assert(java.util.Arrays.equals(byId("<urn:uuid:2>")._3, recs(1).payload))
    // the envelope never leaks: no body contains an HTTP header line
    assert(df.filter(col("body").cast("string")
      .contains("Content-Type:")).count() == 0)
  }

  test("splitHttpPayload: odd-but-real envelopes parse clean (bare-LF " +
       "endings, folded + colon-less headers, multi-chunk framing); " +
       "truncation and bad chunk sizes fail loudly") {
    // bare-LF line endings + a folded header + a colon-less junk line
    val lf = ("HTTP/1.0 301 Moved\nLocation: https://ex.com/\n" +
      "X-Long: part one\n and part two\njunk garbage line\n\nBODY")
      .getBytes(UTF_8)
    val p1 = Warc.splitHttpPayload(lf, "r1")
    assert(p1.http_status == Some(301))
    assert(new String(p1.body, UTF_8) == "BODY")
    // multi-chunk + chunk extension + trailer ignored
    val mc = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4;ext=1\r\nWiki\r\n5\r\npedia\r\n0\r\nX-Trailer: t\r\n\r\n")
      .getBytes(UTF_8)
    val p2 = Warc.splitHttpPayload(mc, "r2")
    assert(new String(p2.body, UTF_8) == "Wikipedia")
    // headers only, terminator at EOF → empty body
    val ho = "HTTP/1.1 204 No Content\r\nServer: x\r\n\r\n".getBytes(UTF_8)
    assert(Warc.splitHttpPayload(ho, "r3").body.isEmpty)
    // REPEATED headers comma-join (RFC 7230 list semantics), never
    // last-wins: a second Transfer-Encoding line must not erase the
    // 'chunked' token or wire framing survives into the body
    val rep = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n" +
      "Transfer-Encoding: identity\r\n\r\n" +
      "4\r\nWiki\r\n0\r\n\r\n").getBytes(UTF_8)
    assert(new String(Warc.splitHttpPayload(rep, "r5").body, UTF_8) ==
      "Wiki")
    val rep2 = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n" +
      "4\r\nWiki\r\n0\r\n\r\n").getBytes(UTF_8)
    assert(new String(Warc.splitHttpPayload(rep2, "r6").body, UTF_8) ==
      "Wiki")
    // repeated SINGLETON headers stay last-wins (comma-joining two
    // Content-Type lines would flip the charset sniff to the first
    // declaration and break exact-match filters)
    val dupCt = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=iso-8859-1\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n\r\nbody")
      .getBytes(UTF_8)
    assert(Warc.splitHttpPayload(dupCt, "rct").http_content_type
      .contains("text/html; charset=utf-8"))
    // empty payload: a legal empty capture, nulls + empty body
    val pe = Warc.splitHttpPayload(Array.emptyByteArray, "r4")
    assert(pe.http_status.isEmpty && pe.body.isEmpty)
    // fail loud: no terminator / bad status / bad chunk size / cut chunk
    for ((bad, what) <- Seq(
        "HTTP/1.1 200 OK\r\nContent-Type: text/html" -> "terminator",
        "NOTHTTP 200\r\n\r\nx" -> "status line",
        ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
          "zz\r\nabc") -> "chunk size",
        ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
          "ff\r\nshort") -> "EOF inside")) {
      val e = intercept[java.io.IOException] {
        Warc.splitHttpPayload(bad.getBytes(UTF_8), "rbad")
      }
      assert(e.getMessage.contains("rbad") &&
        e.getMessage.toLowerCase.contains(what.toLowerCase.take(9)),
        s"$what: ${e.getMessage}")
    }
  }

  test("decodeBodyBytes: header charset wins over meta, meta sniff " +
       "works, unknown labels and bad bytes fail OPEN (UTF-8 + U+FFFD)") {
    val gbk = java.nio.charset.Charset.forName("GBK")
    val latin = java.nio.charset.StandardCharsets.ISO_8859_1
    // declared via header param — body has NO meta
    val (t1, c1) = Warc.decodeBodyBytes(
      "中文测试".getBytes(gbk), "text/html; charset=GBK")
    assert(t1 == "中文测试" && c1 == "GBK")
    // declared ONLY via meta tag
    val metaBody = """<meta charset="ISO-8859-1"><p>café résumé</p>"""
    val (t2, c2) = Warc.decodeBodyBytes(metaBody.getBytes(latin),
      "text/html")
    assert(t2 == metaBody && c2 == "ISO-8859-1")
    // header BEATS a conflicting meta (the HTTP/HTML5 precedence)
    val lying = """<meta charset="GBK">café""".getBytes(latin)
    val (t3, c3) = Warc.decodeBodyBytes(lying,
      "text/html; charset=ISO-8859-1")
    assert(c3 == "ISO-8859-1" && t3.endsWith("café"))
    // unknown/unsupported label → UTF-8 fallback, never a throw
    val (t4, c4) = Warc.decodeBodyBytes("plain ascii".getBytes("UTF-8"),
      "text/html; charset=not-a-charset")
    assert(t4 == "plain ascii" && c4 == "UTF-8")
    val (_, c5) = Warc.decodeBodyBytes("x".getBytes("UTF-8"),
      "text/html; charset= !!")
    assert(c5 == "UTF-8")
    // malformed UTF-8 bytes decode to U+FFFD — one mojibake page must
    // not kill a shard; downstream quality filters drop it
    val bad = Array[Byte]('o', 'k', 0xC3.toByte, 0x28, 'x')
    val (t6, _) = Warc.decodeBodyBytes(bad, "text/html; charset=UTF-8")
    assert(t6.contains('�') && t6.startsWith("ok") && t6.endsWith("x"))
    // null body passes through as nulls
    assert(Warc.decodeBodyBytes(null, "text/html") == ((null, null)))
    // 'charset=' INSIDE another attribute's value must not hijack the
    // decode (a description mentioning charset=utf-16be would turn
    // the page into U+FFFD soup) — only a real charset attribute or
    // an http-equiv content-type content param counts
    val desc = ("""<meta name="description" content="set charset=utf-16be here">""" +
      "<p>plain utf8 text</p>").getBytes("UTF-8")
    val (t7, c7) = Warc.decodeBodyBytes(desc, "text/html")
    assert(c7 == "UTF-8" && t7.contains("plain utf8 text"), s"$c7")
    // the http-equiv form IS honored
    val he = ("""<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">caf""" + "é")
    val (t8, c8) = Warc.decodeBodyBytes(
      he.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
      "text/html")
    assert(c8 == "ISO-8859-1" && t8.endsWith("café"), s"$c8 $t8")
  }

  test("truncated payload fails loudly with file and position") {
    val whole = bytesOf(recs.take(1))
    val cut = java.util.Arrays.copyOf(whole, whole.length - 8)
    val e = intercept[java.io.IOException] {
      Warc.parseStream(new ByteArrayInputStream(cut), "cut.warc").toSeq
    }
    assert(e.getMessage.contains("cut.warc") &&
      e.getMessage.contains("EOF"), e.getMessage)
    val garbage = "not a warc\r\n\r\n".getBytes(UTF_8)
    val e2 = intercept[java.io.IOException] {
      Warc.parseStream(new ByteArrayInputStream(garbage), "g").toSeq
    }
    assert(e2.getMessage.contains("version line"), e2.getMessage)
  }
}
