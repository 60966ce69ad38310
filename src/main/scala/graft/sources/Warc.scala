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
            lastKey = h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
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

  // -------------------------------------------------------------------
  // HTTP envelope stripping — real CommonCrawl `response` records carry
  // `Content-Type: application/http; msgtype=response` payloads: a
  // status line + HTTP headers + CRLF CRLF + the body. Training
  // pipelines need the BODY (feeding the raw payload into HTML
  // extraction would embed `Content-Type:` headers in training text).

  /** Parsed HTTP message parts; `body` is the raw entity bytes
    * (chunked transfer-coding decoded). */
  final case class HttpParts(http_status: Option[Int],
                             http_content_type: Option[String],
                             body: Array[Byte])

  /** Append (http_status, http_content_type, body) to a [[read]]
    * frame. Records whose WARC Content-Type is `application/http`
    * (any msgtype/params) get their HTTP envelope split off: status
    * code from the status line, the HTTP `Content-Type` header (the
    * body's real type — the WARC-level one only says "http"), and the
    * body bytes with `Transfer-Encoding: chunked` framing decoded
    * (raw captures keep the wire form). Non-HTTP payloads pass
    * through: null status/type, body = payload. Per-row imperative
    * binary work, so a UDF (the binary-decode carve-out — there is no
    * Column form for byte scanning); the projection stays shuffle-free
    * and composes with the one-task-per-shard read grain.
    *
    * Fail-loud policy: an `application/http` payload with no header
    * terminator or a malformed/truncated chunk framing throws with the
    * record id — a corrupt shard should stop an ingest, not leak
    * envelope bytes into a corpus. An EMPTY application/http payload
    * (a legal empty capture) yields nulls + empty body. */
  def stripHttp(records: DataFrame, payloadCol: String = "payload",
                contentTypeCol: String = "content_type",
                idCol: String = "record_id"): DataFrame = {
    import org.apache.spark.sql.functions._
    val split = udf((payload: Array[Byte], recordId: String) =>
      splitHttpPayload(payload, recordId))
    val isHttp = lower(col(contentTypeCol))
      .rlike("^\\s*application/http\\s*(;.*)?$")
    records.withColumn("__http",
        when(isHttp, split(col(payloadCol), col(idCol))))
      .withColumn("http_status", col("__http.http_status"))
      .withColumn("http_content_type", col("__http.http_content_type"))
      .withColumn("body",
        when(isHttp, col("__http.body")).otherwise(col(payloadCol)))
      .drop("__http")
  }

  /** HTTP headers defined with #(…) list syntax (RFC 7230/9110) —
    * the ones whose repeats are semantically one comma-joined list.
    * Everything else is a singleton where a repeat is a sender bug
    * and last-wins is the browser-compatible read. */
  private val ListValuedHeaders: Set[String] = Set(
    "transfer-encoding", "content-encoding", "connection", "via",
    "vary", "warning", "cache-control", "pragma", "upgrade", "te",
    "trailer", "accept", "accept-charset", "accept-encoding",
    "accept-language", "allow", "link")

  /** Split one `application/http` payload: status line + headers +
    * CRLF CRLF + body. Bare-LF header endings tolerated (the
    * [[parseStream]] fail-soft rule: line endings only, never
    * lengths). */
  def splitHttpPayload(payload: Array[Byte], recordId: String): HttpParts = {
    if (payload == null || payload.isEmpty)
      return HttpParts(None, None, Array.emptyByteArray)
    def fail(msg: String): Nothing = throw new java.io.IOException(
      s"HTTP envelope parse error in record $recordId: $msg")
    // header/body boundary: first CRLFCRLF (or bare LFLF); headers are
    // ASCII by spec, so a byte scan is exact
    var i = 0
    var bodyAt = -1
    var headerEnd = -1
    while (bodyAt < 0 && i < payload.length) {
      if (payload(i) == '\n') {
        if (i + 1 < payload.length && payload(i + 1) == '\n') {
          headerEnd = i; bodyAt = i + 2
        } else if (i + 2 < payload.length && payload(i + 1) == '\r' &&
                   payload(i + 2) == '\n') {
          headerEnd = i; bodyAt = i + 3
        } else if (i + 1 == payload.length) {
          // message with headers only (no body): terminator at EOF
          headerEnd = i; bodyAt = i + 1
        }
      }
      i += 1
    }
    if (bodyAt < 0) fail("no blank-line header terminator in an " +
      "application/http payload (truncated capture?)")
    val head = new String(payload, 0, headerEnd,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    // Locale.ROOT everywhere: default-locale case folding corrupts
    // ASCII protocol tokens under tr/az locales (dotless-i), which
    // would silently skip chunk decoding — the exact silent failure
    // the fail-loud policy exists to prevent
    if (lines.isEmpty ||
        !lines(0).toUpperCase(java.util.Locale.ROOT).startsWith("HTTP/"))
      fail(s"status line is not HTTP/x.y: '${lines.headOption.getOrElse("").take(40)}'")
    val statusParts = lines(0).split("\\s+", 3)
    // ASCII-digit + toIntOption: Character.isDigit accepts Unicode
    // digits and an over-long run would throw a bare, un-tagged
    // NumberFormatException from toInt
    val status = statusParts.lift(1)
      .filter(s => s.nonEmpty && s.forall(c => c >= '0' && c <= '9'))
      .flatMap(_.toIntOption)
      .getOrElse(fail(s"malformed status line '${lines(0).take(40)}'"))
    // headers, with ISO folding (leading whitespace = continuation)
    val hdrs = scala.collection.mutable.Map.empty[String, String]
    var lastKey: String = null
    var li = 1
    while (li < lines.length) {
      val h = lines(li)
      if (h.nonEmpty) {
        if (h.charAt(0) == ' ' || h.charAt(0) == '\t') {
          if (lastKey != null) hdrs(lastKey) = hdrs(lastKey) + " " + h.trim
        } else {
          val c = h.indexOf(':')
          if (c > 0) {
            lastKey = h.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
            val v = h.substring(c + 1).trim
            // repeated LIST-VALUED headers comma-join (RFC 7230 §3.2.2
            // — a second Transfer-Encoding line must not erase an
            // earlier 'chunked' token, or wire framing silently
            // survives into the body); repeated SINGLETON headers stay
            // last-wins: comma-joining two Content-Type lines would
            // produce 'text/html; charset=a, text/html; charset=b',
            // silently flipping the charset sniff to the FIRST
            // declaration and breaking exact-match filters, where
            // last-wins matches browser handling of duplicates
            hdrs(lastKey) =
              if (ListValuedHeaders(lastKey))
                hdrs.get(lastKey).map(_ + ", " + v).getOrElse(v)
              else v
          } // a colon-less garbage header line is skipped, not fatal —
            // real crawls contain them and the body boundary is already
            // exact (the blank line), so nothing can be misattributed
        }
      }
      li += 1
    }
    val raw = java.util.Arrays.copyOfRange(payload, bodyAt, payload.length)
    val chunked = hdrs.get("transfer-encoding")
      .exists(_.toLowerCase(java.util.Locale.ROOT).split(",")
        .map(_.trim).contains("chunked"))
    val body = if (chunked) decodeChunked(raw, fail) else raw
    HttpParts(Some(status), hdrs.get("content-type"), body)
  }

  /** Decode HTTP/1.1 chunked transfer coding: hex-size line, data,
    * CRLF, …, 0-size terminator (trailers ignored). Length-driven like
    * the WARC parse itself; malformed sizes / truncation fail loudly
    * via `fail`. */
  private def decodeChunked(raw: Array[Byte],
                            fail: String => Nothing): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length)
    var p = 0
    def line(): String = {
      val s = p
      while (p < raw.length && raw(p) != '\n') p += 1
      if (p >= raw.length) fail("EOF inside chunk-size line")
      val e = if (p > s && raw(p - 1) == '\r') p - 1 else p
      p += 1
      new String(raw, s, e - s,
        java.nio.charset.StandardCharsets.ISO_8859_1)
    }
    var continue = true
    while (continue) {
      val sizeTok = line().split(";")(0).trim // chunk extensions dropped
      val size = try java.lang.Long.parseLong(sizeTok, 16)
        catch { case _: NumberFormatException =>
          fail(s"malformed chunk size '${sizeTok.take(20)}'") }
      if (size < 0 || size > Int.MaxValue - 8)
        fail(s"chunk size $size out of range")
      if (size == 0L) continue = false
      else {
        if (p + size > raw.length)
          fail(s"EOF inside a $size-byte chunk at offset $p")
        out.write(raw, p, size.toInt)
        p += size.toInt
        // chunk data is followed by CRLF (tolerate bare LF)
        if (p < raw.length && raw(p) == '\r') p += 1
        if (p >= raw.length || raw(p) != '\n')
          fail("missing CRLF after chunk data")
        p += 1
      }
    }
    out.toByteArray
  }

  // -------------------------------------------------------------------
  // Charset-aware body decoding — the pothole after the HTTP envelope:
  // real crawl bodies are NOT all UTF-8 (legacy latin-1/windows-1252,
  // GBK/Shift_JIS/EUC-KR pages abound). Casting the body to string
  // assumes UTF-8 and mojibakes everything else.

  private val CharsetParamRe = java.util.regex.Pattern.compile(
    "(?i)charset\\s*=\\s*\"?([\\w.:+-]+)")
  private val MetaTagRe = java.util.regex.Pattern.compile(
    "(?is)<meta\\b[^>]*>")
  private val AttrRe = java.util.regex.Pattern.compile(
    "(?is)([\\w-]+)\\s*=\\s*(\"[^\"]*\"|'[^']*'|[^\\s>]+)")

  /** HTML5-style meta charset sniff over the decoded head: honors a
    * real `charset` ATTRIBUTE or an `http-equiv=Content-Type` tag's
    * content charset param — attribute-level parsing, so `charset=`
    * appearing inside some OTHER attribute's value (a description
    * that merely mentions it) can never hijack the decode (a bogus
    * charset + REPLACE would silently turn a good page into U+FFFD
    * soup). */
  private def sniffMetaCharset(head: String): Option[String] = {
    val tags = MetaTagRe.matcher(head)
    while (tags.find()) {
      val am = AttrRe.matcher(tags.group(0))
      var charset: Option[String] = None
      var httpEquivCt = false
      var content: Option[String] = None
      while (am.find()) {
        val vRaw = am.group(2)
        val v = if (vRaw.length >= 2 &&
            (vRaw.head == '"' || vRaw.head == '\'')) {
          vRaw.substring(1, vRaw.length - 1)
        } else vRaw
        am.group(1).toLowerCase(java.util.Locale.ROOT) match {
          case "charset" => charset = Some(v.trim).filter(_.nonEmpty)
          case "http-equiv" =>
            httpEquivCt = v.trim.equalsIgnoreCase("content-type")
          case "content" => content = Some(v)
          case _ => ()
        }
      }
      if (charset.isDefined) return charset
      if (httpEquivCt) {
        val fromCt = content.flatMap { c =>
          val m = CharsetParamRe.matcher(c)
          if (m.find()) Option(m.group(1)) else None
        }
        if (fromCt.isDefined) return fromCt
      }
    }
    None
  }

  /** Decode one body using the HTML5/HTTP resolution order:
    * 1. `charset=` parameter of the HTTP Content-Type;
    * 2. `<meta charset=…>` / `<meta http-equiv … charset=…>` sniffed
    *    from the first 1024 bytes (read as latin-1 — ASCII-compatible
    *    for every charset this applies to);
    * 3. UTF-8.
    * Returns (text, canonical charset name actually used). Unknown or
    * unsupported charset labels fall back to UTF-8. Malformed byte
    * sequences decode to U+FFFD (CodingErrorAction.REPLACE) — the
    * OPPOSITE direction from the framing parsers' fail-loud: one
    * mojibake page must not kill a 1 GB shard, and replacement-heavy
    * text is exactly what the downstream langid/quality filters
    * exist to drop. Null body → (null, null). */
  def decodeBodyBytes(body: Array[Byte],
                      httpContentType: String): (String, String) = {
    if (body == null) return (null, null)
    def find(p: java.util.regex.Pattern, s: String): Option[String] = {
      val m = p.matcher(s)
      if (m.find()) Option(m.group(1)) else None
    }
    val declared = Option(httpContentType)
      .flatMap(ct => find(CharsetParamRe, ct))
      .orElse {
        val head = new String(body, 0, math.min(body.length, 1024),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        sniffMetaCharset(head)
      }
    val cs = declared
      .filter(n => try java.nio.charset.Charset.isSupported(n)
        catch { case _: java.nio.charset.IllegalCharsetNameException => false })
      .map(java.nio.charset.Charset.forName)
      .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    (dec.decode(java.nio.ByteBuffer.wrap(body)).toString, cs.name())
  }

  /** Append (`out` = decoded text, `charset` = canonical name used) to
    * a [[stripHttp]] frame — shuffle-free projection, same binary-
    * decode UDF carve-out. */
  def decodeBody(records: DataFrame, bodyCol: String = "body",
                 contentTypeCol: String = "http_content_type",
                 out: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions._
    val dec = udf((b: Array[Byte], ct: String) => decodeBodyBytes(b, ct))
    records.withColumn("__dec", dec(col(bodyCol), col(contentTypeCol)))
      .withColumn(out, col("__dec._1"))
      .withColumn("charset", col("__dec._2"))
      .drop("__dec")
  }

  /** Render a body into an HTTP response envelope (test/synthesis twin
    * of [[splitHttpPayload]]); `chunked` frames the body as a single
    * chunk + terminator. */
  def wrapHttp(body: Array[Byte], status: Int, contentType: String,
               chunked: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream(body.length + 128)
    val hdr = new StringBuilder
    hdr ++= s"HTTP/1.1 $status OK\r\n"
    hdr ++= s"Content-Type: $contentType\r\n"
    hdr ++= "Server: graft-test\r\n"
    if (chunked) hdr ++= "Transfer-Encoding: chunked\r\n"
    else hdr ++= s"Content-Length: ${body.length}\r\n"
    hdr ++= "\r\n"
    out.write(hdr.toString.getBytes(UTF_8))
    if (chunked) {
      out.write(s"${body.length.toHexString}\r\n".getBytes(UTF_8))
      out.write(body)
      out.write("\r\n0\r\n\r\n".getBytes(UTF_8))
    } else out.write(body)
    out.toByteArray
  }

  /** Distributed WARC write (r16): one `.warc` / `.warc.gz` shard per
    * partition through the Hadoop filesystem — the write-side twin of
    * [[read]]'s file-per-task grain, so a filtered corpus hands off
    * in the same format and parallelism it arrived in. Rows must
    * carry [[schema]]'s identity columns (`record_id`, `warc_type`,
    * `target_uri`, `warc_date`, `content_type`, `payload`); a null /
    * empty `record_id` fails loudly (WARC requires one, and inventing
    * ids here would silently break cross-shard dedup downstream).
    * Size the shards with `df.repartition(n)` BEFORE the call (gzip
    * members are not splittable — the same ~1 GiB-target note as the
    * reader).
    *
    * Commit protocol (tasks retry and speculate — a direct
    * create-overwrite of the final path would let a killed twin
    * attempt truncate a committed shard, and a half-failed job would
    * leave partial output indistinguishable from a complete run):
    * each attempt writes a DOT-PREFIXED attempt-unique temp file
    * (hidden from `*.warc.gz` globs) and renames it to the final
    * part name as its last act — on HDFS-like filesystems the rename
    * fails if the destination exists, so a duplicate commit fails
    * loudly; on local/POSIX filesystems rename overwrites, which is
    * benign here (twin attempts of the same partition produce
    * identical bytes) but means the loud-fail guard is HDFS-only.
    * The driver clears prior output up front (overwrite semantics,
    * both extensions), sweeps orphaned temp files from killed
    * attempts after the job, and writes `_SUCCESS` last. Readers
    * checking the marker can therefore trust any part file they see;
    * a twin finishing after the sweep can at worst leave a hidden
    * .inprogress temp behind, never a visible shard.
    * Returns the shard paths (bounded: one per non-empty
    * partition). */
  def write(df: org.apache.spark.sql.DataFrame, dir: String,
            gzip: Boolean = true): Seq[String] = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val ext = if (gzip) ".warc.gz" else ".warc"
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val dfs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // overwrite semantics: stale shards/markers/temps from a prior
    // (possibly crashed) run must not survive next to fresh output
    if (dfs.exists(dirPath))
      dfs.listStatus(dirPath).map(_.getPath)
        // BOTH extensions: a gzip=false rerun over a gzip=true dir must
        // not leave the old .warc.gz shards under the fresh _SUCCESS
        // (the reader globs both forms)
        .filter(p => p.getName.endsWith(".warc") ||
          p.getName.endsWith(".warc.gz") ||
          p.getName == "_SUCCESS" || p.getName.startsWith("."))
        .foreach(p => dfs.delete(p, false))
    else dfs.mkdirs(dirPath)
    val paths = df.select("record_id", "warc_type", "target_uri",
        "warc_date", "content_type", "payload")
      .rdd.mapPartitionsWithIndex { case (i, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          val attempt = org.apache.spark.TaskContext.get() match {
            case null => 0L
            case tc => tc.taskAttemptId()
          }
          val fin = new org.apache.hadoop.fs.Path(dir, f"part-$i%05d$ext")
          val tmp = new org.apache.hadoop.fs.Path(dir,
            f".part-$i%05d-attempt-$attempt$ext.inprogress")
          val fs = fin.getFileSystem(bc.value.value)
          val raw = fs.create(tmp, true)
          val out: OutputStream =
            if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
          try writeStream(it.map { r =>
            val id = r.getString(0)
            require(id != null && id.nonEmpty,
              s"Warc.write: null/empty record_id in shard $i — WARC " +
                "records need stable ids; carry them through the " +
                "pipeline or mint them upstream")
            Record(id,
              Option(r.getString(1)).getOrElse("response"),
              Option(r.getString(2)).getOrElse(""),
              Option(r.getString(3)).getOrElse(""),
              Option(r.getString(4)).getOrElse("application/octet-stream"),
              Option(r.getAs[Array[Byte]](5)).getOrElse(Array.emptyByteArray))
          }, out)
          finally out.close()
          if (!fs.rename(tmp, fin))
            throw new java.io.IOException(
              s"Warc.write: commit rename failed for shard $i " +
                s"(attempt $attempt) — destination exists or fs error")
          Iterator.single(fin.toString)
        }
      }.collect().toSeq.sorted
    // job committed: sweep temp files from killed/speculative attempts,
    // then the marker
    dfs.listStatus(dirPath).map(_.getPath)
      .filter(_.getName.endsWith(".inprogress"))
      .foreach(p => dfs.delete(p, false))
    val marker = new org.apache.hadoop.fs.Path(dirPath, "_SUCCESS")
    dfs.create(marker, true).close()
    paths
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
