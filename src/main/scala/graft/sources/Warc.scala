package graft.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) reading — the container format web crawls ship in
  * (CommonCrawl's .warc / .warc.gz shards). Built from the public
  * format definition: each record is a `WARC/1.x` version line,
  * CRLF-separated named headers, CRLF CRLF, a `Content-Length`-sized
  * payload block, CRLF CRLF. Parsing is LENGTH-DRIVEN (the payload is
  * read by its declared byte count, never by scanning for a
  * delimiter), so binary payloads and payloads containing `WARC/1.0`
  * text parse correctly.
  *
  * Scale shape: one task per FILE (`binaryFiles`), records streamed —
  * never a whole-file byte array per record. That grain is the honest
  * one: crawl shards are ~1 GB gzip members and gzip is not
  * splittable, so file-level parallelism over thousands of shards is
  * exactly how production WARC ingestion parallelizes (a 100 TB crawl
  * is ~100k files). `.gz` names gunzip inline. Malformed records fail
  * loudly with the file name and byte position — a truncated shard
  * should stop an ingest, not silently shorten the corpus.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("record_id", StringType),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType)))

  /** All records of every matched .warc / .warc.gz file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path)
      .flatMap { case (file, pds) =>
        val raw = new BufferedInputStream(pds.open())
        val in = if (file.endsWith(".gz"))
          new java.util.zip.GZIPInputStream(raw) else raw
        // a limit/early-stop consumer never exhausts the iterator —
        // the task-completion hook reclaims the fd either way
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: Throwable => () }
          })
        parseStream(in, file).map { r =>
          Row(file, r.recordId, r.warcType, r.targetUri, r.date,
            r.contentType, r.payload.length.toLong, r.payload)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  final case class Record(recordId: String, warcType: String,
                          targetUri: String, date: String,
                          contentType: String, payload: Array[Byte])

  /** Stream records off `in`; the iterator owns the stream and closes
    * it at EOF. */
  def parseStream(in: InputStream, file: String): Iterator[Record] =
    new Iterator[Record] {
      private var nextRec: Record = null
      private var done = false
      private var pos = 0L

      private def readLine(): String = {
        // CRLF-terminated header line (WARC mandates CRLF; accept bare
        // LF too — fail-soft on the line ending only, never on lengths)
        val buf = new ByteArrayOutputStream(128)
        var c = in.read()
        pos += 1
        while (c != -1 && c != '\n') {
          buf.write(c)
          c = in.read()
          pos += 1
        }
        if (c == -1 && buf.size == 0) null
        else {
          val s = new String(buf.toByteArray, UTF_8)
          if (s.endsWith("\r")) s.dropRight(1) else s
        }
      }

      private def advance(): Unit = {
        if (done) return
        // skip inter-record blank lines
        var line = readLine()
        while (line != null && line.isEmpty) line = readLine()
        if (line == null) { done = true; in.close(); return }
        if (!line.startsWith("WARC/"))
          fail(s"expected a WARC/1.x version line, got '${line.take(40)}'")
        val headers = scala.collection.mutable.Map.empty[String, String]
        var lastKey: String = null
        var h = readLine()
        while (h != null && h.nonEmpty) {
          if (h.charAt(0) == ' ' || h.charAt(0) == '\t') {
            // ISO 28500 header folding: a leading-whitespace line
            // continues the PREVIOUS field's value
            if (lastKey == null) fail("continuation line before any header")
            headers(lastKey) = headers(lastKey) + " " + h.trim
          } else {
            val i = h.indexOf(':')
            if (i <= 0) fail(s"malformed header line '${h.take(40)}'")
            lastKey = h.substring(0, i).trim.toLowerCase
            headers(lastKey) = h.substring(i + 1).trim
          }
          h = readLine()
        }
        if (h == null) fail("EOF inside a record's header block")
        val lenStr = headers.getOrElse("content-length",
          fail("record without Content-Length"))
        val len = lenStr.toLongOption.getOrElse(
          fail(s"non-numeric Content-Length '${lenStr.take(20)}'"))
        // JVM arrays cap a record at ~2 GiB; real WARC records are
        // far below (the spec recommends ~1 GiB shard TARGETS, not
        // records) — out-of-range lengths are corruption, fail loudly
        if (len < 0 || len > Int.MaxValue - 8)
          fail(s"Content-Length $len out of range [0, 2^31)")
        val n0 = len.toInt
        val payload = new Array[Byte](n0)
        var off = 0
        while (off < n0) {
          val n = in.read(payload, off, n0 - off)
          if (n <= 0) fail(s"EOF inside a $n0-byte payload at offset $off")
          off += n
          pos += n
        }
        nextRec = Record(
          headers.getOrElse("warc-record-id", ""),
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", ""),
          headers.getOrElse("warc-date", ""),
          headers.getOrElse("content-type", ""),
          payload)
      }

      private def fail(msg: String): Nothing = {
        try in.close() catch { case _: Throwable => () }
        done = true
        throw new java.io.IOException(
          s"WARC parse error in $file near byte $pos: $msg")
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): Record = {
        if (!hasNext) throw new EOFException(file)
        val r = nextRec
        nextRec = null
        r
      }
    }

  /** Write records as one WARC stream (test/synthesis twin of
    * [[parseStream]] — strict CRLF form). */
  def writeStream(records: Iterator[Record], out: OutputStream): Unit = {
    for (r <- records) {
      val hdr = new StringBuilder
      hdr ++= "WARC/1.0\r\n"
      hdr ++= s"WARC-Record-ID: ${r.recordId}\r\n"
      hdr ++= s"WARC-Type: ${r.warcType}\r\n"
      if (r.targetUri.nonEmpty) hdr ++= s"WARC-Target-URI: ${r.targetUri}\r\n"
      hdr ++= s"WARC-Date: ${r.date}\r\n"
      hdr ++= s"Content-Type: ${r.contentType}\r\n"
      hdr ++= s"Content-Length: ${r.payload.length}\r\n\r\n"
      out.write(hdr.toString.getBytes(UTF_8))
      out.write(r.payload)
      out.write("\r\n\r\n".getBytes(UTF_8))
    }
    out.flush()
  }
}
