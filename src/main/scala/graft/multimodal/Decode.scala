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
        var (sr, sg, sb) = (0L, 0L, 0L)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF
            sb += rgb & 0xFF
            x += 1
          }
          y += 1
        }
        val d = w.toLong * h * 255.0
        Some((w, h, sr / d, sg / d, sb / d))
    }
  }

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

  // ------------------------------------------------------------- WAV

  /** Decode a PCM WAV payload via javax.sound: stream metadata + RMS of
    * the normalized samples (16-bit signed or 8-bit unsigned PCM). */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val ch = fmt.getChannels
        val data = in.readAllBytes()
        val bigEndian = fmt.isBigEndian
        var (sum2, n) = (0.0, 0L)
        if (bits == 16) {
          var i = 0
          while (i + 1 < data.length) {
            val lo = data(if (bigEndian) i + 1 else i) & 0xFF
            val hi = data(if (bigEndian) i else i + 1)
            val s = ((hi << 8) | lo).toShort / 32768.0
            sum2 += s * s; n += 1; i += 2
          }
        } else if (bits == 8) {
          var i = 0
          while (i < data.length) {
            val s = ((data(i) & 0xFF) - 128) / 128.0
            sum2 += s * s; n += 1; i += 1
          }
        } else return None
        Some((fmt.getSampleRate.toInt, ch, n / math.max(1, ch),
          math.sqrt(sum2 / math.max(1L, n))))
      } finally in.close()
    } catch { case _: Exception => None }
  }

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
}
