package graft.multimodal

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL media decoders over opaque binary columns — pure JVM, no native
  * libs: PPM (P6) by hand, PNG/JPEG/BMP/GIF via the JDK's ImageIO, WAV
  * PCM via javax.sound.sampled. These replace the r9 decode stub for the
  * formats the JDK can open; exotic codecs (video, webp, mp3) remain a
  * documented swap-in at [[Multimodal.extractFeatures]]'s batch boundary.
  *
  * Scale shape: every entry point is a partition-preserving
  * mapPartitions over (id, payload) — no shuffle, batch-friendly, and
  * the payload column prunes away for downstream consumers that only
  * read the extracted features.
  */
object Decode {

  // ImageIO defaults every ImageInputStream/ImageOutputStream to a
  // DISK cache — a temp file created, written, and deleted per
  // encode/decode call. Under a 32-thread decode stage that serializes
  // on /tmp and erases scan parallelism (measured: the sf0.1 video
  // corpus decoded no faster on 32 tasks than on 1 before this).
  // In-memory cache streams are what a batch decoder wants; the class
  // loads once per executor JVM, so the switch rides classloading.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded image summary: dimensions + per-channel means in [0,1] —
    * the cheap content fingerprint a curation pipeline filters on. */
  case class ImageFeatures(doc_id: Long, format: String, width: Int,
                           height: Int, mean_r: Double, mean_g: Double,
                           mean_b: Double)

  /** Decoded audio summary (PCM WAV): stream metadata + RMS level. */
  case class AudioFeatures(doc_id: Long, sample_rate: Int, channels: Int,
                           n_frames: Long, rms: Double)

  // ------------------------------------------------------------- PPM

  /** Parse a binary PPM (P6) payload: "P6\n<w> <h>\n<max>\n" + RGB
    * bytes. Hand-rolled because PPM is THE no-deps interchange format
    * for testing decode plumbing; returns null-safe None on garbage. */
  def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
    if (bytes == null || bytes.length < 11 ||
        bytes(0) != 'P' || bytes(1) != '6') return None
    // header tokens: whitespace-separated ints, '#' comments to EOL
    var i = 2
    def token(): Option[Int] = {
      while (i < bytes.length &&
             (bytes(i).toChar.isWhitespace || bytes(i) == '#')) {
        if (bytes(i) == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
        else i += 1
      }
      val start = i
      while (i < bytes.length && bytes(i).toChar.isDigit) i += 1
      if (i == start) None
      else Some(new String(bytes, start, i - start).toInt)
    }
    for {
      w <- token(); h <- token(); mx <- token()
      // 1-byte samples only: maxval > 255 means 2-byte big-endian
      // samples (PPM spec) — reject rather than read MSB/LSB bytes as
      // separate pixels and report confidently-wrong means
      if w > 0 && h > 0 && mx > 0 && mx <= 255
    } yield {
      i += 1 // single whitespace after maxval
      val n = w.toLong * h
      var (sr, sg, sb) = (0L, 0L, 0L)
      var p = i
      var px = 0L
      while (px < n && p + 2 < bytes.length) {
        sr += bytes(p) & 0xFF; sg += bytes(p + 1) & 0xFF
        sb += bytes(p + 2) & 0xFF
        p += 3; px += 1
      }
      val d = math.max(1L, px) * mx.toDouble
      (w, h, sr / d, sg / d, sb / d)
    }
  }

  /** Encode a SOLID-COLOR P6 payload — the deterministic generator the
    * gate query and tests run the decoder against. */
  def encodeSolidPpm(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = header.length
    var px = 0
    while (px < w * h) {
      out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
      i += 3; px += 1
    }
    out
  }

  // ----------------------------------------------------- ImageIO path

  /** Decode any JDK-supported raster format (PNG/JPEG/BMP/GIF/WBMP);
    * returns (width, height, meanR, meanG, meanB) with means in [0,1]. */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double, Double, Double)] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    img match {
      case None => None
      case Some(im) =>
        val (w, h) = (im.getWidth, im.getHeight)
        val px = bulkRgb(im)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < px.length) {
          val rgb = px(i)
          sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF
          sb += rgb & 0xFF
          i += 1
        }
        val d = w.toLong * h * 255.0
        Some((w, h, sr / d, sg / d, sb / d))
    }
  }

  /** Whole-raster sRGB fetch in ONE call — `getRGB(0,0,w,h,buf,0,w)`
    * walks the raster internally instead of paying a bounds-checked
    * color-model conversion call per pixel (the per-pixel loop was
    * measurable at production image sizes; values are identical). */
  private def bulkRgb(im: java.awt.image.BufferedImage): Array[Int] =
    im.getRGB(0, 0, im.getWidth, im.getHeight,
      new Array[Int](im.getWidth * im.getHeight), 0, im.getWidth)

  /** Nearest-neighbor resize of any JDK-decodable image → raw RGB bytes
    * (3 per pixel, row-major) — the normalized tensor shape a model
    * forward pass consumes. */
  def resizeToRgb(bytes: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) return None
    val decoded =
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    decoded.map { im =>
      val out = new Array[Byte](outW * outH * 3)
      var y = 0
      while (y < outH) {
        val sy = math.min(im.getHeight - 1, y * im.getHeight / outH)
        var x = 0
        while (x < outW) {
          val sx = math.min(im.getWidth - 1, x * im.getWidth / outW)
          val rgb = im.getRGB(sx, sy)
          val o = (y * outW + x) * 3
          out(o) = ((rgb >> 16) & 0xFF).toByte
          out(o + 1) = ((rgb >> 8) & 0xFF).toByte
          out(o + 2) = (rgb & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      out
    }
  }

  // ----------------------------------------------- perceptual hashing

  /** Decode any supported image payload into one unified raster:
    * (width, height, row-major 0xRRGGBB ints). PPM (P6) parses by
    * hand, everything else through ImageIO — the same dispatch rule
    * as [[imageFeatures]]; undecodable payloads are None, never a
    * task kill. */
  def decodeRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes == null || bytes.isEmpty) return None
    if (bytes.length > 1 && bytes(0) == 'P' && bytes(1) == '6')
      return decodePpmRaster(bytes)
    val img =
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    img.map { im =>
      val px = bulkRgb(im)
      var i = 0
      while (i < px.length) { px(i) &= 0xFFFFFF; i += 1 }
      (im.getWidth, im.getHeight, px)
    }
  }

  private def decodePpmRaster(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodePpm(bytes).map { case (w, h, _, _, _) =>
      // re-walk the header the same way decodePpm did to find the
      // pixel offset (dup of ~6 lines beats exposing parser internals)
      var i = 2
      var seen = 0
      while (seen < 3 && i < bytes.length) {
        while (i < bytes.length &&
               (bytes(i).toChar.isWhitespace || bytes(i) == '#')) {
          if (bytes(i) == '#') while (i < bytes.length && bytes(i) != '\n') i += 1
          else i += 1
        }
        while (i < bytes.length && bytes(i).toChar.isDigit) i += 1
        seen += 1
      }
      i += 1 // single whitespace after maxval
      val px = new Array[Int](w * h)
      var p = 0
      while (p < w * h && i + 2 < bytes.length) {
        px(p) = ((bytes(i) & 0xFF) << 16) | ((bytes(i + 1) & 0xFF) << 8) |
          (bytes(i + 2) & 0xFF)
        i += 3; p += 1
      }
      (w, h, px)
    }

  /** Box-averaged grayscale downscale to exactly gw×gh cells:
    * integer ITU-R 601 luma (299r+587g+114b)/1000, cell (cx,cy)
    * averaging source pixels [cx·w/gw,(cx+1)·w/gw) × [cy·h/gh,
    * (cy+1)·h/gh). Box averaging (not nearest-neighbor) makes the
    * hash EXACTLY scale-invariant for grid-aligned content (a k×
    * upscale averages back to the identical cell values) and robust
    * to recompression noise (averaged over the cell, not sampled at
    * one point). */
  private def boxGray(w: Int, h: Int, px: Array[Int],
                      gw: Int, gh: Int): Array[Int] = {
    val out = new Array[Int](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh
      val y1 = math.min(h, math.max(y0 + 1, (cy + 1) * h / gh))
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw
        val x1 = math.min(w, math.max(x0 + 1, (cx + 1) * w / gw))
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = px(y * w + x)
            sum += (299 * ((p >> 16) & 0xFF) + 587 * ((p >> 8) & 0xFF) +
              114 * (p & 0xFF)) / 1000
            x += 1
          }
          y += 1
        }
        out(cy * gw + cx) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** 64-bit difference hash (dHash): 9×8 box-averaged grayscale,
    * bit (row·8+col) set iff gray[row][col+1] > gray[row][col] —
    * the standard gradient fingerprint. Scale/aspect-normalizing by
    * construction; two images within a few bits are near-duplicates.
    * None for undecodable or degenerate (sub-1×1) payloads. */
  def dHash(bytes: Array[Byte]): Option[Long] =
    decodeRaster(bytes).flatMap { case (w, h, px) =>
      dHashFromRaster(w, h, px)
    }

  /** The dHash bit construction over a decoded raster — the ONE
    * implementation both [[dHash]] and [[imageSignatures]] call, so a
    * grid/bit-order tweak can never make the batch path hash
    * differently from the public scalar API. */
  private def dHashFromRaster(w: Int, h: Int,
                              px: Array[Int]): Option[Long] =
    if (w < 1 || h < 1) None
    else {
      val g = boxGray(w, h, px, 9, 8)
      var sig = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (g(r * 9 + c + 1) > g(r * 9 + c)) sig |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      Some(sig)
    }

  /** 128-bit difference hash: the 64 horizontal-gradient bits of
    * [[dHash]] (lo half, bit-identical — the two hashes agree by
    * construction) plus 64 vertical-gradient bits from an 8×9 grid
    * (hi half, bit c·8+r set iff gray[r+1][c] > gray[r][c]).
    *
    * Why it exists — the SCALE path, not a better hash: 64-bit
    * signatures band into 4×16-bit buckets, and a symmetric
    * multi-probe pair join carries an n²/2^16-per-band candidate term
    * that turns superlinear around 10^5–10^6 media (measured: the sf1
    * video corpus, 150k signatures, ran 25× sf0.1's wall — BASELINE
    * r17). The 128-bit hash rides [[graft.text.Dedup
    * .simhashNearDups128]]'s 4×32-bit bands: the same term is
    * n²/2^32 — negligible to ~10^8 per shard — with the pigeonhole
    * recall guarantee at d ≤ 3 exact-band / d ≤ 7 multi-probe.
    * Distances on the 128-bit hash are roughly 2× the 64-bit ones for
    * the same perceptual gap (twice the bits; measured matrix in
    * DecodeSpec/BASELINE). */
  def dHash128(bytes: Array[Byte]): Option[(Long, Long)] =
    decodeRaster(bytes).flatMap { case (w, h, px) =>
      if (w < 1 || h < 1) None
      else dHashFromRaster(w, h, px).map(lo => (lo, vHashFromRaster(w, h, px)))
    }

  /** The vertical-gradient 64 bits of [[dHash128]] (8×9 grid,
    * bit c·8+r set iff gray[r+1][c] > gray[r][c]). */
  private def vHashFromRaster(w: Int, h: Int, px: Array[Int]): Long = {
    val g = boxGray(w, h, px, 8, 9)
    var hi = 0L
    var c = 0
    while (c < 8) {
      var r = 0
      while (r < 8) {
        if (g((r + 1) * 8 + c) > g(r * 8 + c)) hi |= 1L << (c * 8 + r)
        r += 1
      }
      c += 1
    }
    hi
  }

  /** 64-bit average hash (aHash): 8×8 box-averaged grayscale, bit set
    * iff the cell is brighter than the 64-cell mean. Cheaper and
    * blunter than [[dHash]] — kept as the second opinion a borderline
    * near-dup verdict can cross-check. */
  def aHash(bytes: Array[Byte]): Option[Long] =
    decodeRaster(bytes).flatMap { case (w, h, px) =>
      if (w < 1 || h < 1) None
      else {
        val g = boxGray(w, h, px, 8, 8)
        val mean = g.map(_.toLong).sum / 64
        var sig = 0L
        var i = 0
        while (i < 64) { if (g(i) > mean) sig |= 1L << i; i += 1 }
        Some(sig)
      }
    }

  /** Perceptual signature row: dims + dHash, null hash for payloads
    * no decoder opens (the fail path REPORTS, never kills a task). */
  case class ImageSig(img_id: Long, format: String, width: Int,
                      height: Int, dhash: Option[Long])

  /** Perceptual-hash signatures over a binary image column — the
    * partition-preserving batch shape of [[imageFeatures]], emitting
    * the 64-bit dHash a near-dup pass bands on. Downstream:
    * `sigs.select(col("img_id"), col("dhash").as("simhash"))` feeds
    * [[graft.text.Dedup.simhashNearDups]] unchanged — image near-dup
    * detection IS the text SimHash machinery on a different
    * fingerprint (pigeonhole banding, bucket caps, multi-probe recall
    * lever all carry over). */
  def imageSignatures(df: DataFrame, idCol: String, payloadCol: String,
                      batchSize: Int = 64): Dataset[ImageSig] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          decodeRaster(payload) match {
            case Some((w, h, px)) =>
              val fmt =
                if (payload.length > 1 && payload(0) == 'P' &&
                    payload(1) == '6') "ppm" else "imageio"
              ImageSig(id, fmt, w, h, dHashFromRaster(w, h, px))
            case None => ImageSig(id, "unknown", -1, -1, None)
          }
        })
      }
  }

  /** Image near-duplicate pairs: [[imageSignatures]] → the 64-bit
    * Hamming banding of [[graft.text.Dedup.simhashNearDups]]
    * (4×16-bit pigeonhole bands, capped buckets, optional bit-flip
    * multi-probe). Returns (id_a, id_b, hamming); undecodable images
    * carry null hashes and never pair. */
  def nearDupImagePairs(df: DataFrame, idCol: String, payloadCol: String,
                        maxDistance: Int = 6,
                        maxBucket: Int = 1000,
                        multiProbe: Boolean = false): DataFrame = {
    val sigs = imageSignatures(df, idCol, payloadCol).toDF()
      .where(col("dhash").isNotNull)
      .select(col("img_id").as(idCol), col("dhash").as("simhash"))
    graft.text.Dedup.simhashNearDups(sigs, idCol,
      maxDistance = maxDistance, maxBucket = maxBucket,
      multiProbe = multiProbe)
  }

  /** Render a deterministic 9×8-cell test pattern from a 64-bit seed
    * as a PNG at `cell` pixels per cell (via ImageIO's PNG writer) —
    * the generator gates and specs run the perceptual-hash path
    * against. Cell gray = a byte carved from xxhash-style mixing of
    * (seed, cell index), so patterns differ across seeds and the k×
    * upscale of a seed box-averages back to identical cell values. */
  def encodePatternPng(seed: Long, cell: Int): Array[Byte] = {
    require(cell >= 1, s"cell must be >= 1 (got $cell)")
    val im = new java.awt.image.BufferedImage(
      9 * cell, 8 * cell, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        // splitmix64-style finalizer: decorrelates cell grays so two
        // seeds rarely share a full 72-cell pattern
        var z = seed + 0x9E3779B97F4A7C15L * (cy * 9 + cx + 1)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        val gray = ((z ^ (z >>> 31)) & 0xFF).toInt
        val rgb = (gray << 16) | (gray << 8) | gray
        var y = cy * cell
        while (y < (cy + 1) * cell) {
          var x = cx * cell
          while (x < (cx + 1) * cell) { im.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        cx += 1
      }
      cy += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** Re-encode any JDK-decodable image as JPEG at an explicit quality
    * — the lossy-recompression twin generator (q123's re-encode
    * robustness gate runs dHash against its own JPEG round-trip).
    * None for undecodable payloads. */
  def reencodeJpeg(bytes: Array[Byte], quality: Float = 0.75f): Option[Array[Byte]] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    img.flatMap { im0 =>
      // JPEG writers reject alpha; repaint into RGB
      val im = new java.awt.image.BufferedImage(
        im0.getWidth, im0.getHeight,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = im.createGraphics()
      g.drawImage(im0, 0, 0, null)
      g.dispose()
      // same report-don't-kill contract as the decoders: an encode
      // failure (unwritable ImageIO cache, a null output stream)
      // returns None, and the writer/stream always dispose
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      var ios: javax.imageio.stream.ImageOutputStream = null
      try {
        val params = writer.getDefaultWriteParam
        params.setCompressionMode(
          javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(quality)
        val bos = new java.io.ByteArrayOutputStream()
        ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(im, null, null),
          params)
        ios.flush()
        Some(bos.toByteArray)
      } catch { case _: Exception => None }
      finally {
        writer.dispose()
        if (ios != null)
          try ios.close() catch { case _: Exception => () }
      }
    }
  }

  // ------------------------------------------------------------- WAV

  /** Parsed RIFF/WAVE PCM header: sample rate, bits (8|16), channels,
    * and the frame-truncated [start, start+len) data-chunk window into
    * the payload bytes. */
  private case class WavPcm(sampleRate: Int, bits: Int, channels: Int,
                            dataStart: Int, dataLen: Int)

  /** Hand-rolled RIFF/WAVE PCM header parse — r17: the javax.sound
    * path (AudioSystem.getAudioInputStream) funnels EVERY call through
    * the synchronized provider registry (sun.media.sound
    * JDK13Services), which serializes a 32-core decode stage on one
    * global lock: measured 89.5 µs/payload single-threaded but LOWER
    * aggregate throughput with 32 threads than with one (5.3k vs
    * 11.2k payloads/s) on an idle box, and q127's signature pass read
    * 6.5 s for 20k tiny WAVs that cost 0.3 core-seconds of real work.
    * The accept/reject semantics match the javax.sound path on every
    * payload this repo produces or gates (DecodeSpec pins them), with
    * one INTENTIONAL narrowing (r18 advisory): format tag 1 (plain
    * PCM) only — A-law(6)/µ-law(7) report None as before, but
    * WAVE_FORMAT_EXTENSIBLE(0xFFFE)-wrapped PCM, which the JDK's
    * reader unwrapped, now also reports None rather than decoding;
    * bits 8 (unsigned) or 16 (signed LE) only; a
    * malformed/truncated header is None; the data window is truncated
    * to whole FRAMES (the AudioInputStream frame-length bound) and to
    * the bytes actually present (a mid-data truncation decodes the
    * prefix, as before). RIFF chunk walk honors word alignment
    * (odd-length chunks pad one byte). */
  private def parseWavPcm(bytes: Array[Byte]): Option[WavPcm] = {
    if (bytes == null || bytes.length < 12) return None
    @inline def u16(i: Int): Int =
      (bytes(i) & 0xFF) | ((bytes(i + 1) & 0xFF) << 8)
    @inline def u32(i: Int): Long =
      (bytes(i) & 0xFFL) | ((bytes(i + 1) & 0xFFL) << 8) |
        ((bytes(i + 2) & 0xFFL) << 16) | ((bytes(i + 3) & 0xFFL) << 24)
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'A' ||
        bytes(10) != 'V' || bytes(11) != 'E') return None
    var pos = 12
    var fmtTag = -1; var channels = 0; var sampleRate = 0; var bits = 0
    var dataStart = -1; var dataLen = 0
    while (pos + 8 <= bytes.length && dataStart < 0) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = u32(pos + 4)
      if (len < 0 || len > Int.MaxValue) return None
      val body = pos + 8
      if (id == "fmt " && len >= 16 && body + 16 <= bytes.length) {
        fmtTag = u16(body)
        channels = u16(body + 2)
        sampleRate = u32(body + 4).toInt
        bits = u16(body + 14)
      } else if (id == "data") {
        if (fmtTag < 0) return None // data before fmt: malformed
        dataStart = body
        dataLen = math.min(len, (bytes.length - body).toLong).toInt
      }
      if (dataStart < 0) {
        // chunks are word-aligned: odd lengths carry one pad byte.
        // Advance in LONG arithmetic (r18, advisory fix): a declared
        // len near Int.MaxValue made `body + len.toInt` wrap negative,
        // so the `pos + 8 <= length` guard passed and the header read
        // threw an uncaught IndexOutOfBoundsException — one crafted
        // ~30-byte payload killed the task, violating the module's
        // report-don't-kill contract. A next offset past the last
        // possible header slot means the walk is over with no data
        // chunk found — the same None the loop exit would conclude.
        // (When the data chunk IS found above, the loop ends on the
        // `dataStart < 0` condition and no advance is needed — a huge
        // declared data len still decodes its truncated prefix.)
        val next = body.toLong + len + (len & 1L)
        if (next > bytes.length.toLong - 8) return None
        pos = next.toInt
      }
    }
    if (dataStart < 0 || fmtTag != 1 || channels < 1 || sampleRate <= 0 ||
        (bits != 8 && bits != 16)) return None
    // frame-truncate, as the AudioInputStream length bound did
    val frameSize = (bits / 8) * channels
    Some(WavPcm(sampleRate, bits, channels, dataStart,
      dataLen - dataLen % frameSize))
  }

  /** Decode a PCM WAV payload: stream metadata + RMS of the normalized
    * samples (16-bit signed LE or 8-bit unsigned PCM; companded A-law/
    * µ-law report None, not a garbage RMS). Hand-rolled header parse —
    * see [[parseWavPcm]] for why javax.sound is not used here. */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] =
    parseWavPcm(bytes).map { w =>
      var (sum2, n) = (0.0, 0L)
      if (w.bits == 16) {
        var i = w.dataStart
        val end = w.dataStart + w.dataLen
        while (i + 1 < end) {
          val s = (((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort
            / 32768.0)
          sum2 += s * s; n += 1; i += 2
        }
      } else {
        var i = w.dataStart
        val end = w.dataStart + w.dataLen
        while (i < end) {
          val s = ((bytes(i) & 0xFF) - 128) / 128.0
          sum2 += s * s; n += 1; i += 1
        }
      }
      (w.sampleRate, w.channels, n / math.max(1, w.channels),
        math.sqrt(sum2 / math.max(1L, n)))
    }

  /** Decode a PCM WAV payload to channel-averaged mono samples in
    * [-1,1] plus the sample rate — the raster-equivalent for audio
    * fingerprinting. None for non-PCM/undecodable payloads. Hand-
    * rolled header parse — see [[parseWavPcm]]. */
  def decodeWavSamples(bytes: Array[Byte]): Option[(Int, Array[Double])] =
    parseWavPcm(bytes).map { w =>
      val ch = math.max(1, w.channels)
      val raw: Array[Double] =
        if (w.bits == 16) {
          val out = new Array[Double](w.dataLen / 2)
          var i = 0
          while (i + 1 < w.dataLen) {
            out(i / 2) = (((bytes(w.dataStart + i + 1) << 8) |
              (bytes(w.dataStart + i) & 0xFF)).toShort / 32768.0)
            i += 2
          }
          out
        } else {
          val out = new Array[Double](w.dataLen)
          var i = 0
          while (i < w.dataLen) {
            out(i) = ((bytes(w.dataStart + i) & 0xFF) - 128) / 128.0
            i += 1
          }
          out
        }
      val n = raw.length / ch
      val mono = new Array[Double](n)
      var i = 0
      while (i < n) {
        var s = 0.0; var c = 0
        while (c < ch) { s += raw(i * ch + c); c += 1 }
        mono(i) = s / ch
        i += 1
      }
      (w.sampleRate, mono)
    }

  /** 64-bit audio energy-contour fingerprint — the [[dHash]] of the
    * time axis: 65 box-averaged frame energies (per-frame RMS over 65
    * equal spans of the mono stream), bit i set iff frame i+1 is
    * louder than frame i. Duration-normalizing by construction (fixed
    * frame count), amplitude-invariant (comparisons, not levels), and
    * sample-rate-invariant for content whose envelope survives
    * resampling — the properties a near-dup pass needs against
    * re-encoded copies. Production systems fingerprint chroma
    * (Chromaprint); the envelope contour is the dependency-free stand-
    * in — the Spark-side shape downstream (64-bit signature → Hamming
    * banding) is identical whatever the feature. None for undecodable
    * or sub-65-sample payloads. */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    decodeWavSamples(bytes).flatMap { case (_, mono) =>
      fingerprintFromMono(mono)
    }

  /** The contour hash over already-decoded mono samples —
    * [[audioSignatures]] fingerprints from its own decode instead of
    * paying a second one per payload. */
  private def fingerprintFromMono(mono: Array[Double]): Option[Long] = {
    val frames = 65
    val n = mono.length
    if (n < frames) None
    else {
      val e = new Array[Double](frames)
      var k = 0
      while (k < frames) {
        val lo = (k.toLong * n / frames).toInt
        val hi = ((k + 1).toLong * n / frames).toInt
        var s = 0.0; var i = lo
        while (i < hi) { s += mono(i) * mono(i); i += 1 }
        e(k) = math.sqrt(s / math.max(1, hi - lo))
        k += 1
      }
      var sig = 0L
      var b = 0
      while (b < 64) {
        if (e(b + 1) > e(b)) sig |= 1L << b
        b += 1
      }
      Some(sig)
    }
  }

  // --------------------------------------- spectral (chromaprint-lite)

  /** Trim leading/trailing silence: keep the span [first,last] of
    * samples whose |s| exceeds `rel`·peak. The cheap, deterministic
    * prerequisite for time-shift-robust fingerprints — a copy with
    * 0.5 s of leading silence trims back to the identical sample
    * array. Returns the input untouched when nothing exceeds (all-
    * silence stays all-silence rather than becoming empty). */
  def trimSilence(mono: Array[Double], rel: Double = 0.005): Array[Double] = {
    if (mono == null || mono.isEmpty) return mono
    var peak = 0.0
    var i = 0
    while (i < mono.length) {
      val a = math.abs(mono(i)); if (a > peak) peak = a; i += 1
    }
    val thr = rel * peak
    if (peak == 0.0) return mono
    var lo = 0
    while (lo < mono.length && math.abs(mono(lo)) <= thr) lo += 1
    var hi = mono.length - 1
    while (hi > lo && math.abs(mono(hi)) <= thr) hi -= 1
    if (lo == 0 && hi == mono.length - 1) mono
    else java.util.Arrays.copyOfRange(mono, lo, hi + 1)
  }

  /** Goertzel energies — single-bin DFTs (O(n) per bin, no FFT plan,
    * pure JVM) — at every frequency in `coeffs` over one sample span,
    * FUSED into a single pass over the samples (r18): each Goertzel
    * recurrence `s0 = x + coeff·s1 − s2` is a serial dependency chain
    * (latency-bound, ~4–5 cycles/sample), so running the 48 bins one
    * after another cost 48 latency-bound passes; interleaving all bins
    * per sample gives the CPU 48 INDEPENDENT chains to overlap
    * (throughput-bound) and reads the span once. Per-bin arithmetic is
    * bit-identical to the textbook one-bin loop this replaces: the
    * recurrence order, the energy term s1² + s2² − coeff·s1·s2, and
    * the per-bin state are untouched — only the loop nest is
    * transposed (bins are mutually independent). `s1`/`s2` are
    * caller-provided scratch (zeroed here) so the frame loop never
    * allocates. */
  private[graft] def goertzelAll(s: Array[Double], lo: Int, hi: Int,
                          coeffs: Array[Double], nBins: Int,
                          s1: Array[Double], s2: Array[Double],
                          out: Array[Double]): Unit = {
    java.util.Arrays.fill(s1, 0, nBins, 0.0)
    java.util.Arrays.fill(s2, 0, nBins, 0.0)
    var i = lo
    while (i < hi) {
      val x = s(i)
      var f = 0
      while (f < nBins) {
        val s0 = x + coeffs(f) * s1(f) - s2(f)
        s2(f) = s1(f); s1(f) = s0
        f += 1
      }
      i += 1
    }
    var f = 0
    while (f < nBins) {
      out(f) = s1(f) * s1(f) + s2(f) * s2(f) - coeffs(f) * s1(f) * s2(f)
      f += 1
    }
  }

  /** Equal-tempered semitone frequencies over 4 octaves from A2 =
    * 110 Hz (110·2^(k/12), k = 0..47) — the chroma fold maps k → k mod
    * 12, so an octave shift (e.g. the same tone rendered at 2× the
    * sample rate) lands in the SAME pitch class. */
  private val ChromaFreqs: Array[Double] =
    Array.tabulate(48)(k => 110.0 * math.pow(2.0, k / 12.0))

  /** Chromaprint-lite 64-bit spectral fingerprint — the production-
    * grade alternative to [[audioFingerprint]]'s envelope contour,
    * behind the SAME 64-bit Hamming banding:
    *
    *   1. trim silence ([[trimSilence]], rel 0.005) — this is what
    *      makes it time-shift-robust; the envelope contour is not
    *      (q127's offset twin pins the measured gap);
    *   2. 49 equal frames over the trimmed mono;
    *   3. per frame: RMS energy + 12-bin chroma (Goertzel at the 48
    *      semitone frequencies, folded mod 12; evaluated at true Hz
    *      via the decoded sample rate, so the fold is rate- AND
    *      octave-invariant);
    *   4. bits 0..47 = energy transitions e(k+1) > e(k) (the temporal
    *      half — what discriminates same-tone different-envelope
    *      content); bits 48..59 = global chroma profile c(b) >
    *      c((b+1) mod 12) (the spectral half — what discriminates
    *      different-pitch content); bits 60..63 = per-quarter dominant
    *      pitch class == global dominant (coarse pitch trajectory).
    *
    * None for undecodable or sub-49-sample payloads. Like Chromaprint
    * itself, bits are robust-not-exact under re-encode: q127 pins the
    * measured twin distances and the banding distance is chosen from
    * that table (BASELINE.md r17). */
  def chromaFingerprint(bytes: Array[Byte]): Option[Long] =
    decodeWavSamples(bytes).flatMap { case (sr, mono0) =>
      chromaFromMono(sr, mono0)
    }

  private def chromaFromMono(sr: Int, mono0: Array[Double]): Option[Long] = {
    val mono = trimSilence(mono0)
    val frames = 49
    val n = mono.length
    if (n < frames || sr <= 0) return None
    val energy = new Array[Double](frames)
    val chroma = Array.ofDim[Double](frames, 12)
    // Per-payload hoists for the fused Goertzel pass ([[goertzelAll]]):
    // ChromaFreqs is ascending, so the `fr < sr/2` Nyquist gate keeps
    // exactly the prefix [0, cut); the 2·cos coefficients depend only
    // on (freq, sr) and were recomputed 49× each before. Skipped bins
    // (f ≥ cut) contribute nothing, exactly as the old per-bin guard.
    var cut = 0
    while (cut < 48 && ChromaFreqs(cut) < sr / 2.0) cut += 1
    val coeffs = new Array[Double](cut)
    var cf = 0
    while (cf < cut) {
      coeffs(cf) = 2.0 * math.cos(2.0 * math.Pi * ChromaFreqs(cf) / sr)
      cf += 1
    }
    val gs1 = new Array[Double](cut)
    val gs2 = new Array[Double](cut)
    val gout = new Array[Double](cut)
    var k = 0
    while (k < frames) {
      val lo = (k.toLong * n / frames).toInt
      val hi = ((k + 1).toLong * n / frames).toInt
      var s = 0.0; var i = lo
      while (i < hi) { s += mono(i) * mono(i); i += 1 }
      energy(k) = math.sqrt(s / math.max(1, hi - lo))
      goertzelAll(mono, lo, hi, coeffs, cut, gs1, gs2, gout)
      var f = 0
      while (f < cut) {
        chroma(k)(f % 12) += gout(f) / math.max(1, hi - lo)
        f += 1
      }
      k += 1
    }
    var sig = 0L
    var b = 0
    while (b < 48) {
      if (energy(b + 1) > energy(b)) sig |= 1L << b
      b += 1
    }
    // global chroma profile: per-frame-normalized so loud frames don't
    // own the vote
    val global = new Array[Double](12)
    k = 0
    while (k < frames) {
      var tot = 0.0; var c = 0
      while (c < 12) { tot += chroma(k)(c); c += 1 }
      if (tot > 0) { c = 0; while (c < 12) {
        global(c) += chroma(k)(c) / tot; c += 1 } }
      k += 1
    }
    // noise-floor the profile before comparing: bins under 1% of the
    // peak are spectral leakage whose ordering flips with frame length
    // (a pure tone at 2× the rate leaks differently into the 11 quiet
    // bins — measured 7-15 coin-flip bits before this clamp)
    var gmax = 0.0
    b = 0
    while (b < 12) { if (global(b) > gmax) gmax = global(b); b += 1 }
    b = 0
    while (b < 12) { if (global(b) < 0.01 * gmax) global(b) = 0.0; b += 1 }
    b = 0
    while (b < 12) {
      if (global(b) > global((b + 1) % 12)) sig |= 1L << (48 + b)
      b += 1
    }
    val domGlobal = global.indices.maxBy(global)
    var q = 0
    while (q < 4) {
      val qlo = q * 12
      val qhi = if (q == 3) frames else (q + 1) * 12
      val qsum = new Array[Double](12)
      k = qlo
      while (k < qhi) {
        var c = 0
        while (c < 12) { qsum(c) += chroma(k)(c); c += 1 }
        k += 1
      }
      if (qsum.indices.maxBy(qsum) == domGlobal) sig |= 1L << (60 + q)
      q += 1
    }
    Some(sig)
  }

  /** Audio signature row: stream metadata + BOTH 64-bit fingerprints
    * from one decode — `afp` the envelope contour, `cfp` the
    * chromaprint-lite spectral hash; null for payloads no decoder
    * opens (the fail path REPORTS, never kills a task). */
  case class AudioSig(aud_id: Long, sample_rate: Int, n_samples: Long,
                      afp: Option[Long], cfp: Option[Long])

  /** Envelope fingerprints over a binary WAV column — the same
    * partition-preserving batch shape as [[imageSignatures]]. The
    * payload bytes stay in the scan stage; downstream consumers carry
    * only (id, 8-byte fingerprint). */
  def audioSignatures(df: DataFrame, idCol: String, payloadCol: String,
                      batchSize: Int = 64): Dataset[AudioSig] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          decodeWavSamples(payload) match {
            case Some((sr, mono)) =>
              AudioSig(id, sr, mono.length.toLong,
                fingerprintFromMono(mono), chromaFromMono(sr, mono))
            case None => AudioSig(id, -1, -1L, None, None)
          }
        })
      }
  }

  /** Audio near-duplicate pairs: [[audioSignatures]] → the 64-bit
    * Hamming banding of [[graft.text.Dedup.simhashNearDups]] — the
    * audio counterpart of [[nearDupImagePairs]]. Undecodable payloads
    * carry null fingerprints and never pair. */
  def nearDupAudioPairs(df: DataFrame, idCol: String, payloadCol: String,
                        maxDistance: Int = 6,
                        maxBucket: Int = 1000,
                        multiProbe: Boolean = false): DataFrame = {
    val sigs = audioSignatures(df, idCol, payloadCol).toDF()
      .where(col("afp").isNotNull)
      .select(col("aud_id").as(idCol), col("afp").as("simhash"))
    graft.text.Dedup.simhashNearDups(sigs, idCol,
      maxDistance = maxDistance, maxBucket = maxBucket,
      multiProbe = multiProbe)
  }

  /** Render a deterministic 65-segment amplitude envelope from a
    * 64-bit seed as mono PCM16 WAV — the audio twin of
    * [[encodePatternPng]]. Segment k holds `segSamples` samples of a
    * period-8 sine at amplitude `gain`·a(k), a(k) stepping through 16
    * coarse levels derived from an LCG of (seed,k) with equal ADJACENT
    * levels re-rolled — so every frame comparison is decided by a gap
    * ≥25× the PCM16 quantization noise and the fingerprint is exactly
    * reproducible across sample rates and gains. `segSamples` must be
    * a multiple of 8 (whole sine periods → per-segment RMS exactly
    * gain·a(k)/√2). `padSamples` prepends that many zero samples —
    * the leading-silence twin the offset-robustness gate (q127
    * variant 3) dedups against. */
  def encodeEnvelopeWav(seed: Long, sampleRate: Int,
                        segSamples: Int = 64,
                        gain: Double = 1.0,
                        padSamples: Int = 0): Array[Byte] = {
    require(segSamples % 8 == 0, s"segSamples must be 8-aligned: $segSamples")
    val segs = 65
    val samples = new Array[Short](padSamples + segs * segSamples)
    var prevLevel = -1
    var k = 0
    while (k < segs) {
      // splitmix64-style finalizer, same as encodePatternPng: the
      // additive-LCG mix used before r17 was near-PERIODIC in k (low
      // bits cycled with period 16), so distinct seeds produced
      // colliding fingerprints — MeasureMediaTwins caught every doc's
      // nearest cross-doc distance at 0
      var x = seed + 0x9E3779B97F4A7C15L * (k + 1)
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^= (x >>> 31)
      var level = ((x % 16) + 16) % 16
      if (level == prevLevel) level = (level + 1) % 16
      prevLevel = level.toInt
      val amp = gain * (0.2 + 0.6 * level / 15.0)
      // one quantized period, tiled: the waveform is periodic in 8
      // samples, so 8 Short values per segment replace segSamples
      // math.sin calls (the generator runs once per payload per row —
      // it was the gate's hot loop)
      val period = new Array[Short](8)
      var p = 0
      while (p < 8) {
        period(p) = (amp * SinePeriod8(p) * 32767.0).toShort
        p += 1
      }
      var j = 0
      while (j < segSamples) {
        samples(padSamples + k * segSamples + j) = period(j & 7)
        j += 1
      }
      k += 1
    }
    encodePcm16Wav(sampleRate, samples)
  }

  private val SinePeriod8: Array[Double] =
    Array.tabulate(8)(j => math.sin(2.0 * math.Pi * j / 8.0))

  /** Encode mono PCM16 WAV — deterministic generator for tests/gates. */
  def encodePcm16Wav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  // ------------------------------------------------- Dataset surfaces

  /** Image features over a binary column: partition-preserving, batch
    * shape identical to [[Multimodal.extractFeatures]]. PPM decodes by
    * hand; everything else goes through ImageIO; undecodable payloads
    * yield (format="unknown", -1 dims) rather than dropping rows —
    * curation filters decide, the decoder reports. */
  def imageFeatures(df: DataFrame, idCol: String, payloadCol: String,
                    batchSize: Int = 64): Dataset[ImageFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          val ppm = Option(payload)
            .filter(b => b.length > 1 && b(0) == 'P' && b(1) == '6')
            .flatMap(decodePpm)
          ppm.map { case (w, h, r, g, b) =>
            ImageFeatures(id, "ppm", w, h, r, g, b)
          }.orElse(decodeImage(payload).map { case (w, h, r, g, b) =>
            ImageFeatures(id, "imageio", w, h, r, g, b)
          }).getOrElse(
            ImageFeatures(id, "unknown", -1, -1, 0.0, 0.0, 0.0))
        })
      }
  }

  /** Audio features over a binary WAV column — same partition-preserving
    * batch shape. */
  def audioFeatures(df: DataFrame, idCol: String, payloadCol: String,
                    batchSize: Int = 64): Dataset[AudioFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          decodeWav(payload)
            .map { case (sr, ch, n, rms) => AudioFeatures(id, sr, ch, n, rms) }
            .getOrElse(AudioFeatures(id, -1, -1, -1L, 0.0))
        })
      }
  }

  // ------------------------------------------------------------ video

  /** Video coverage, pure JVM: AVI/MJPEG containers parse by hand
    * (RIFF chunk walk → the `movi` list's `##dc`/`##db` frames, each a
    * JPEG that ImageIO opens) and animated GIF frames read through
    * ImageIO's multi-image API. Codecs with inter-frame prediction
    * (H.264/VP9/AV1 in mp4/webm) stay at the documented batch-boundary
    * swap-in — there is no JDK decoder, and a wrong-but-plausible
    * bitstream parse is worse than a reported unknown. GIF caveat,
    * documented not hidden: frames are hashed as STORED — an optimizer
    * that writes sub-rect deltas with disposal modes would need full
    * canvas compositing (the production swap-in); the synthesis here
    * writes full frames. */

  private def leInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** AVI/MJPEG frame payloads (JPEG bytes per frame) via a RIFF chunk
    * walk. None when the payload is not a RIFF/AVI or carries no video
    * frames; truncated containers yield the frames that fit (a partial
    * crawl capture still contributes its intact prefix). */
  def decodeAviFrames(bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 12) return None
    def fourcc(i: Int) = new String(bytes, i, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val frames = Seq.newBuilder[Array[Byte]]
    try {
      // outer walk: chunks are [fourcc][le32 size][payload][pad to even]
      var i = 12
      val end = math.min(bytes.length, 8L + leInt(bytes, 4)).toInt
      while (i + 8 <= end) {
        val cc = fourcc(i)
        val sz = leInt(bytes, i + 4)
        if (sz < 0) return Some(frames.result()) // corrupt size: stop
        if (cc == "LIST" && i + 12 <= end && fourcc(i + 8) == "movi") {
          var j = i + 12
          val lend = math.min(end, i + 8 + sz)
          while (j + 8 <= lend) {
            val fcc = fourcc(j)
            val fsz = leInt(bytes, j + 4)
            if (fsz < 0 || j + 8 + fsz > lend) { j = lend } // truncated
            else {
              if (fcc.endsWith("dc") || fcc.endsWith("db"))
                frames += java.util.Arrays.copyOfRange(
                  bytes, j + 8, j + 8 + fsz)
              j += 8 + fsz + (fsz & 1)
            }
          }
        }
        i += 8 + sz + (sz & 1)
      }
    } catch { case _: Exception => () } // report what parsed, never kill
    val out = frames.result()
    if (out.isEmpty) None else Some(out)
  }

  /** Animated-GIF frames as decoded rasters via ImageIO's multi-image
    * reader. None for non-GIF payloads or a reader failure. */
  def decodeGifRasters(bytes: Array[Byte],
                       maxFrames: Int = 64): Option[Seq[(Int, Int, Array[Int])]] = {
    if (bytes == null || bytes.length < 6) return None
    if (!(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')) return None
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val r = readers.next()
      try {
        r.setInput(iis)
        val n = math.min(r.getNumImages(true), maxFrames)
        if (n <= 0) return None
        Some((0 until n).map { k =>
          val im = r.read(k)
          val px = bulkRgb(im)
          var i = 0
          while (i < px.length) { px(i) &= 0xFFFFFF; i += 1 }
          (im.getWidth, im.getHeight, px)
        })
      } finally r.dispose()
    } catch { case _: Exception => None }
    finally if (iis != null) {
      try iis.close() catch { case _: Exception => () }
    }
  }

  /** Frame rasters from any supported video payload, sampled down to
    * ≤ `maxFrames` at an INTEGER stride (every ⌈n/maxFrames⌉-th
    * frame): AVI/MJPEG by RIFF magic, animated GIF by GIF magic.
    * Integer stride matters for the fingerprint's invariance claim — a
    * fractional-position sampler picks some source frames twice on a
    * k×-duplicated stream (24 frames into 16 slots hits every 3rd slot
    * twice), skewing the majority vote; with integer stride a dup
    * stream whose BASE fits in maxFrames samples each source frame
    * exactly once. Returns (container, rasters); None for anything
    * else — REPORT, never kill. */
  def decodeVideoRasters(bytes: Array[Byte], maxFrames: Int = 16)
      : Option[(String, Seq[(Int, Int, Array[Int])])] = {
    def sampled[A](xs: Seq[A]): Seq[A] =
      if (xs.size <= maxFrames) xs
      else {
        val stride = (xs.size + maxFrames - 1) / maxFrames
        (0 until xs.size by stride).map(xs)
      }
    decodeAviFrames(bytes) match {
      case Some(jpegs) =>
        val rasters = sampled(jpegs).flatMap(decodeRaster)
        if (rasters.isEmpty) None else Some(("avi", rasters))
      case None =>
        decodeGifRasters(bytes).map(fr => ("gif", sampled(fr)))
    }
  }

  /** Temporal majority-bit video fingerprint: dHash every sampled
    * frame, set vhash bit b iff a STRICT majority of frame hashes set
    * bit b. Invariances by construction: exact under frame duplication
    * when the base stream fits in `maxFrames` (the integer-stride
    * sampler then picks each source frame exactly once — see
    * [[decodeVideoRasters]]; beyond that, approximate) and robust to
    * per-frame JPEG noise (a flipped bit in a minority of frames never
    * reaches majority). Shot-REORDERING also preserves it (a set, not
    * a sequence) — callers that must distinguish re-cuts pair it with
    * n_frames or a frame-hash sequence check. None when no frame
    * decodes. */
  def videoFingerprint(bytes: Array[Byte], maxFrames: Int = 16): Option[Long] =
    decodeVideoRasters(bytes, maxFrames).flatMap { case (_, rasters) =>
      fingerprintFromHashes(rasters.flatMap { case (w, h, px) =>
        dHashFromRaster(w, h, px) })
    }

  private def fingerprintFromHashes(hs: Seq[Long]): Option[Long] =
    if (hs.isEmpty) None
    else {
      var sig = 0L
      var b = 0
      while (b < 64) {
        var ones = 0
        hs.foreach(h => if (((h >>> b) & 1L) == 1L) ones += 1)
        if (2 * ones > hs.size) sig |= 1L << b
        b += 1
      }
      Some(sig)
    }

  /** Video signature row: container/dims/frame count + the 64-bit
    * temporal fingerprint; unknown/-1/null for payloads no parser
    * opens. */
  case class VideoSig(vid_id: Long, container: String, width: Int,
                      height: Int, n_frames: Int, vhash: Option[Long])

  /** Temporal fingerprints over a binary video column — the same
    * partition-preserving batch shape as [[imageSignatures]]; the
    * heavy payload bytes stay in the scan stage, downstream banding
    * shuffles only (id, 8-byte hash). */
  def videoSignatures(df: DataFrame, idCol: String, payloadCol: String,
                      maxFrames: Int = 16,
                      batchSize: Int = 16): Dataset[VideoSig] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          decodeVideoRasters(payload, maxFrames) match {
            case Some((container, rasters)) =>
              val (w, h, _) = rasters.head
              VideoSig(id, container, w, h, rasters.size,
                fingerprintFromHashes(rasters.flatMap {
                  case (fw, fh, px) => dHashFromRaster(fw, fh, px) }))
            case None => VideoSig(id, "unknown", -1, -1, -1, None)
          }
        })
      }
  }

  /** 128-bit temporal fingerprint — [[videoFingerprint]]'s majority
    * vote over per-frame [[dHash128]] halves; the scale path for
    * corpora where 64-bit banding's n²/2^16 candidate term bites
    * (see [[dHash128]]). Same invariances (exact under frame
    * duplication when the base fits `maxFrames`). */
  def videoFingerprint128(bytes: Array[Byte],
                          maxFrames: Int = 16): Option[(Long, Long)] =
    decodeVideoRasters(bytes, maxFrames).flatMap { case (_, rasters) =>
      val hs = rasters.flatMap { case (w, h, px) =>
        if (w < 1 || h < 1) None
        else dHashFromRaster(w, h, px)
          .map(lo => (lo, vHashFromRaster(w, h, px)))
      }
      for {
        lo <- fingerprintFromHashes(hs.map(_._1))
        hi <- fingerprintFromHashes(hs.map(_._2))
      } yield (lo, hi)
    }

  /** 128-bit signature rows over a binary video column — feeds
    * [[graft.text.Dedup.simhashNearDups128]] (`simhash_lo`/
    * `simhash_hi`); same partition-preserving batch shape. */
  def videoSignatures128(df: DataFrame, idCol: String,
                         payloadCol: String, maxFrames: Int = 16,
                         batchSize: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(payloadCol).cast(BinaryType))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(_.map { case (id, payload) =>
          videoFingerprint128(payload) match {
            case Some((lo, hi)) =>
              (id, Option(lo), Option(hi))
            case None => (id, Option.empty[Long], Option.empty[Long])
          }
        })
      }
      .toDF(idCol, "simhash_lo", "simhash_hi")
  }

  /** Minimal AVI/MJPEG writer — the video twin generator (and a usable
    * sink for MJPEG export): RIFF('AVI ') → LIST(hdrl){avih,
    * LIST(strl){strh 'vids'/'MJPG', strf BITMAPINFOHEADER}} →
    * LIST(movi){'00dc' frames}. Every player/parser field a reader
    * needs is populated; no idx1 (readers treat it as optional;
    * [[decodeAviFrames]] never needs it). */
  def encodeMjpegAvi(jpegFrames: Seq[Array[Byte]], width: Int,
                     height: Int, fps: Int = 10): Array[Byte] = {
    require(jpegFrames.nonEmpty, "encodeMjpegAvi: no frames")
    require(fps > 0, s"fps must be positive: $fps")
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
      bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF)
    }
    def cc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val maxFrame = jpegFrames.map(_.length).max
    val moviBody = jpegFrames.map(f => 8 + f.length + (f.length & 1)).sum
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffBody = 4 + (8 + hdrlBody) + (8 + 4 + moviBody)
    cc("RIFF"); le32(riffBody); cc("AVI ")
    cc("LIST"); le32(hdrlBody); cc("hdrl")
    cc("avih"); le32(56)
    le32(1000000 / fps); le32(maxFrame * fps); le32(0)
    le32(0x10) // AVIF_HASINDEX off, AVIF_ISINTERLEAVED off; 0x10 = frames field valid
    le32(jpegFrames.size); le32(0); le32(1); le32(maxFrame)
    le32(width); le32(height); le32(0); le32(0); le32(0); le32(0)
    cc("LIST"); le32(4 + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); le32(56)
    cc("vids"); cc("MJPG"); le32(0); le32(0); le32(0)
    le32(1); le32(fps) // dwScale / dwRate → fps frames per second
    le32(0); le32(jpegFrames.size); le32(maxFrame); le32(-1); le32(0)
    bos.write(0); bos.write(0); bos.write(0); bos.write(0) // rcFrame lt
    // rcFrame right/bottom as two le16s
    bos.write(width & 0xFF); bos.write((width >> 8) & 0xFF)
    bos.write(height & 0xFF); bos.write((height >> 8) & 0xFF)
    cc("strf"); le32(40)
    le32(40); le32(width); le32(height)
    bos.write(1); bos.write(0)   // biPlanes = 1
    bos.write(24); bos.write(0)  // biBitCount = 24
    cc("MJPG"); le32(width * height * 3); le32(0); le32(0); le32(0); le32(0)
    cc("LIST"); le32(4 + moviBody); cc("movi")
    jpegFrames.foreach { f =>
      cc("00dc"); le32(f.length); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0) // RIFF chunks pad to even
    }
    bos.toByteArray
  }

  /** Pattern-frame MJPEG AVI for the q132 twins: `nFrames` frames,
    * frame k = [[encodePatternPng]](frameSeed(seed,k)) re-encoded as
    * JPEG at `quality`. `dupFrames` repeats each frame back-to-back —
    * the frame-rate-resample twin (the majority-bit fingerprint is
    * exact under it by construction). */
  def encodePatternAvi(seed: Long, nFrames: Int = 12, cell: Int = 2,
                       quality: Float = 0.85f, dupFrames: Int = 1,
                       fps: Int = 10): Array[Byte] = {
    val frames = (0 until nFrames).flatMap { k =>
      val jpg = reencodeJpeg(encodePatternPng(frameSeed(seed, k), cell),
        quality).get
      Seq.fill(dupFrames)(jpg)
    }
    encodeMjpegAvi(frames, 9 * cell, 8 * cell, fps * dupFrames)
  }

  /** Per-frame seed mix for [[encodePatternAvi]]/[[encodePatternGif]]
    * — splitmix over (seed, frame) so frames within a video differ and
    * videos of different seeds decorrelate. */
  def frameSeed(seed: Long, k: Int): Long = {
    var z = seed + 0x9E3779B97F4A7C15L * (k + 1001)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z ^ (z >>> 27)
  }

  /** The SAME pattern frames as an animated GIF (ImageIO sequence
    * writer) — the cross-container twin. GIF is palette-quantized, so
    * the per-frame rasters (and thus the fingerprint) are NEAR the AVI
    * twin's, not exact; q132 pins the measured bound. */
  def encodePatternGif(seed: Long, nFrames: Int = 12,
                       cell: Int = 2): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    var ios: javax.imageio.stream.ImageOutputStream = null
    try {
      ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { k =>
        val im = javax.imageio.ImageIO.read(new ByteArrayInputStream(
          encodePatternPng(frameSeed(seed, k), cell)))
        writer.writeToSequence(
          new javax.imageio.IIOImage(im, null, null), null)
      }
      writer.endWriteSequence()
      ios.flush()
      bos.toByteArray
    } finally {
      writer.dispose()
      if (ios != null) try ios.close() catch { case _: Exception => () }
    }
  }
}
