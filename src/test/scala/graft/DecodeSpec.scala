package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.multimodal.Decode

/** Real pure-JVM media decode (r10): PPM by hand, PNG/BMP via the JDK's
  * ImageIO, WAV PCM via javax.sound — the decode step of the multimodal
  * pipeline is no longer a stub for JDK-decodable formats. */
class DecodeSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("PPM roundtrip: encodeSolidPpm → decodePpm recovers dims + means") {
    val bytes = Decode.encodeSolidPpm(7, 5, 200, 100, 50)
    val Some((w, h, r, g, b)) = Decode.decodePpm(bytes)
    assert((w, h) == (7, 5))
    assert(math.abs(r - 200 / 255.0) < 1e-9)
    assert(math.abs(g - 100 / 255.0) < 1e-9)
    assert(math.abs(b - 50 / 255.0) < 1e-9)
  }

  test("PPM decode handles comments and rejects garbage") {
    val withComment = ("P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++
      Array.fill(12)(10.toByte))
    assert(Decode.decodePpm(withComment).exists(_._1 == 2))
    assert(Decode.decodePpm("not an image".getBytes).isEmpty)
    assert(Decode.decodePpm(null).isEmpty)
  }

  test("ImageIO decode: a solid PNG yields exact dims and channel means") {
    val bytes = pngBytes(9, 4, 0x40A0F0) // r=0x40 g=0xA0 b=0xF0
    val Some((w, h, r, g, b)) = Decode.decodeImage(bytes)
    assert((w, h) == (9, 4))
    assert(math.abs(r - 0x40 / 255.0) < 1e-9)
    assert(math.abs(g - 0xA0 / 255.0) < 1e-9)
    assert(math.abs(b - 0xF0 / 255.0) < 1e-9)
  }

  test("resizeToRgb: nearest-neighbor downscale of a 2-tone PNG") {
    // left half red, right half blue → 2x1 resize = one red + one blue px
    val im = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      im.setRGB(x, y, if (x < 4) 0xFF0000 else 0x0000FF)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val Some(rgb) = Decode.resizeToRgb(bos.toByteArray, 2, 1)
    assert(rgb.length == 6)
    assert((rgb(0) & 0xFF) == 255 && (rgb(2) & 0xFF) == 0)   // red px
    assert((rgb(3) & 0xFF) == 0 && (rgb(5) & 0xFF) == 255)   // blue px
  }

  test("WAV decode: PCM16 sine has the right metadata and RMS ~ A/sqrt2") {
    val sr = 8000
    val n = 800 // 100 Hz × 10 full periods
    val amp = 0.5
    val samples = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * 100 * i / sr) * amp * 32767).toShort)
    val wav = Decode.encodePcm16Wav(sr, samples)
    val Some((rate, ch, frames, rms)) = Decode.decodeWav(wav)
    assert(rate == sr && ch == 1 && frames == n)
    assert(math.abs(rms - amp / math.sqrt(2)) < 1e-3, s"rms=$rms")
    assert(Decode.decodeWav("nope".getBytes).isEmpty)
  }

  test("imageFeatures over a DataFrame: mixed PPM + PNG + garbage, " +
       "partition-preserving (no shuffle)") {
    val rows = Seq(
      (1L, Decode.encodeSolidPpm(4, 4, 10, 20, 30)),
      (2L, pngBytes(3, 3, 0x102030)),
      (3L, "garbage".getBytes),
      (4L, null.asInstanceOf[Array[Byte]]))
    val df = rows.toDF("doc_id", "payload")
    val out = Decode.imageFeatures(df, "doc_id", "payload")
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val m = out.collect().map(f => f.doc_id -> f).toMap
    assert(m(1L).format == "ppm" && m(1L).width == 4 &&
      math.abs(m(1L).mean_r - 10 / 255.0) < 1e-9)
    assert(m(2L).format == "imageio" && m(2L).height == 3 &&
      math.abs(m(2L).mean_b - 0x30 / 255.0) < 1e-9)
    assert(m(3L).format == "unknown" && m(3L).width == -1)
    assert(m(4L).format == "unknown")
  }

  test("audioFeatures over a DataFrame: WAV rows decode, junk reports -1") {
    val sr = 16000
    val samples = Array.tabulate(160)(i =>
      (math.sin(2 * math.Pi * 400 * i / sr) * 16384).toShort)
    val rows = Seq(
      (1L, Decode.encodePcm16Wav(sr, samples)),
      (2L, "junk".getBytes))
    val out = Decode.audioFeatures(rows.toDF("doc_id", "payload"),
      "doc_id", "payload").collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).sample_rate == sr && out(1L).n_frames == 160)
    assert(out(1L).rms > 0.3 && out(1L).rms < 0.4)
    assert(out(2L).sample_rate == -1)
  }
}
