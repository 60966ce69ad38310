package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import graft.multimodal.{Decode, Multimodal}

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

  // ---------------------------------------------- perceptual hashing

  test("dHash is exactly invariant under grid-aligned upscaling and " +
       "distinct across seeds") {
    val seeds = (0L until 50L)
    for (s <- seeds) {
      val h2 = Decode.dHash(Decode.encodePatternPng(s, 2))
      val h4 = Decode.dHash(Decode.encodePatternPng(s, 4))
      val h7 = Decode.dHash(Decode.encodePatternPng(s, 7))
      assert(h2.isDefined && h2 == h4 && h2 == h7,
        s"seed $s: dHash not scale-invariant ($h2 / $h4 / $h7)")
    }
    // different seeds → (almost surely) different hashes; with the
    // splitmix-mixed cell grays, 50 seeds colliding would mean the
    // hash ignores content
    val all = seeds.map(s => Decode.dHash(Decode.encodePatternPng(s, 2)).get)
    assert(all.distinct.size == all.size)
  }

  test("dHash survives JPEG recompression within a small Hamming " +
       "distance; aHash of a solid image is 0") {
    val png = Decode.encodePatternPng(42L, 8)
    val im = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    val jpg = bos.toByteArray
    val d = java.lang.Long.bitCount(
      Decode.dHash(png).get ^ Decode.dHash(jpg).get)
    assert(d <= 12, s"dHash png↔jpeg distance $d — recompression " +
      "robustness is the point of box averaging")
    // a solid image has no gradients (dHash 0) and no cell brighter
    // than the mean (aHash 0) — both on the hand-rolled PPM path
    val solid = Decode.encodeSolidPpm(27, 16, 120, 120, 120)
    assert(Decode.dHash(solid).contains(0L))
    assert(Decode.aHash(solid).contains(0L))
    // undecodable → None, never a throw
    assert(Decode.dHash("garbage".getBytes).isEmpty)
    assert(Decode.dHash(png.take(16)).isEmpty)
    assert(Decode.dHash(null).isEmpty)
  }

  test("imageSignatures + simhashNearDups banding: resize twins pair " +
       "at distance 0, corrupt payloads report null and never pair") {
    val rows = (0L until 20L).flatMap { s =>
      Seq((s * 4, Decode.encodePatternPng(s, 2)),
          (s * 4 + 1, Decode.encodePatternPng(s, 4)),
          (s * 4 + 2, Decode.encodePatternPng(s, 2).take(16)))
    }
    val sigs = Decode.imageSignatures(
      rows.toDF("img_id", "payload"), "img_id", "payload").toDF()
    val byId = sigs.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    for (s <- 0L until 20L) {
      val (fa, wa, ha, da) = byId(s * 4)
      val (fb, wb, hb, db) = byId(s * 4 + 1)
      val (fc, wc, _, dc) = byId(s * 4 + 2)
      assert(fa == "imageio" && wa == 18 && ha == 16 && da.isDefined)
      assert(fb == "imageio" && wb == 36 && hb == 32 && db == da)
      assert(fc == "unknown" && wc == -1 && dc.isEmpty)
    }
    val pairs = graft.multimodal.Decode.nearDupImagePairs(
      rows.toDF("img_id", "payload"), "img_id", "payload",
      maxDistance = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (s <- 0L until 20L)
      assert(pairs.contains((s * 4, s * 4 + 1)),
        s"banding missed the twin pair of seed $s")
    assert(pairs.forall { case (a, b) => a % 4 != 2 && b % 4 != 2 },
      "a corrupt (null-hash) image must never pair")
  }

  test("PPM raster path feeds the perceptual hash: a PPM and its " +
       "pixel-identical PNG hash identically") {
    // 9x8 two-tone pattern at 3px cells, emitted as both P6 and PNG
    val w = 27; val h = 24
    val ppm = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val body = new Array[Byte](w * h * 3)
      for (y <- 0 until h; x <- 0 until w) {
        val on = ((x / 3) + (y / 3)) % 2 == 0
        val v: Byte = if (on) 200.toByte else 40.toByte
        val o = (y * w + x) * 3
        body(o) = v; body(o + 1) = v; body(o + 2) = v
      }
      header ++ body
    }
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val on = ((x / 3) + (y / 3)) % 2 == 0
      val v = if (on) 200 else 40
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    assert(Decode.dHash(ppm).isDefined)
    assert(Decode.dHash(ppm) == Decode.dHash(bos.toByteArray))
  }

  test("audioFingerprint: envelope hash is invariant under sample-rate " +
       "doubling and 6 dB gain change; corrupt payloads report None") {
    for (seed <- 0L until 20L) {
      val a = Decode.encodeEnvelopeWav(seed, 8000, segSamples = 64,
        gain = 1.0)
      val b = Decode.encodeEnvelopeWav(seed, 16000, segSamples = 128,
        gain = 0.5)
      val fa = Decode.audioFingerprint(a)
      val fb = Decode.audioFingerprint(b)
      assert(fa.isDefined, s"seed $seed: 8 kHz render must decode")
      assert(fa == fb,
        s"seed $seed: rate/gain twin must hash identically")
    }
    // distinct seeds must not all collide (the envelope carries seed
    // entropy — any two may collide by chance; all 20 equal = broken)
    val sigs = (0L until 20L)
      .map(s => Decode.audioFingerprint(
        Decode.encodeEnvelopeWav(s, 8000)).get).toSet
    assert(sigs.size > 10, s"degenerate fingerprints: ${sigs.size}")
    assert(Decode.audioFingerprint(
      Decode.encodeEnvelopeWav(1L, 8000).take(16)).isEmpty)
    assert(Decode.audioFingerprint(null).isEmpty)
    assert(Decode.audioFingerprint(Array[Byte]()).isEmpty)
  }

  test("companded (mu-law) audio reports None, never a garbage " +
       "fingerprint: the PCM-only contract") {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val data = Array.tabulate[Byte](8000)(i => (i % 251).toByte)
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, data.length)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, bos)
    val ulaw = bos.toByteArray
    assert(Decode.decodeWavSamples(ulaw).isEmpty,
      "mu-law must not decode through the unsigned-PCM branch")
    assert(Decode.audioFingerprint(ulaw).isEmpty)
    assert(Decode.decodeWav(ulaw).isEmpty)
  }

  test("audioSignatures + simhashNearDups banding: re-encode twins " +
       "pair at distance 0, corrupt audio never pairs") {
    val rows = (0L until 20L).flatMap { s =>
      Seq(
        (s * 4, Decode.encodeEnvelopeWav(s, 8000, 64, 1.0)),
        (s * 4 + 1, Decode.encodeEnvelopeWav(s, 16000, 128, 0.5)),
        (s * 4 + 2, Decode.encodeEnvelopeWav(s, 8000, 64, 1.0).take(16)))
    }
    val sigs = Decode.audioSignatures(
      rows.toDF("aud_id", "payload"), "aud_id", "payload").toDF()
    val byId = sigs.collect().map(r =>
      r.getLong(0) -> ((r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    for (s <- 0L until 20L) {
      val (sra, na, fa) = byId(s * 4)
      val (srb, nb, fb) = byId(s * 4 + 1)
      val (src, nc, fc) = byId(s * 4 + 2)
      assert(sra == 8000 && na == 65L * 64 && fa.isDefined)
      assert(srb == 16000 && nb == 65L * 128 && fb == fa)
      assert(src == -1 && nc == -1L && fc.isEmpty)
    }
    val pairs = Decode.nearDupAudioPairs(
      rows.toDF("aud_id", "payload"), "aud_id", "payload",
      maxDistance = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (s <- 0L until 20L)
      assert(pairs.contains((s * 4, s * 4 + 1)),
        s"banding missed the twin pair of seed $s")
    assert(pairs.forall { case (a, b) => a % 4 != 2 && b % 4 != 2 },
      "a corrupt (null-fingerprint) clip must never pair")
  }

  test("trimSilence: leading/trailing spans below rel·peak drop; " +
       "all-silence and empty inputs pass through untouched") {
    val sig = Array(0.0, 0.001, 0.0, 0.5, -0.8, 0.3, 0.002, 0.0)
    assert(Decode.trimSilence(sig).toSeq == Seq(0.5, -0.8, 0.3))
    val loud = Array(0.5, -0.8, 0.3)
    assert(Decode.trimSilence(loud) eq loud) // nothing to trim
    val silent = Array(0.0, 0.0, 0.0)
    assert(Decode.trimSilence(silent) eq silent)
    assert(Decode.trimSilence(Array.empty[Double]).isEmpty)
  }

  test("chromaFingerprint: exact under leading silence (the envelope " +
       "contour is NOT — the documented swap-in), near under re-rate, " +
       "distinct across seeds") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (seed <- 0L until 20L) {
      val base = Decode.encodeEnvelopeWav(seed, 8000, segSamples = 32)
      val off = Decode.encodeEnvelopeWav(seed, 8000, segSamples = 32,
        padSamples = 2000)
      val rate = Decode.encodeEnvelopeWav(seed, 16000, segSamples = 64,
        gain = 0.5)
      val cb = Decode.chromaFingerprint(base).get
      assert(Decode.chromaFingerprint(off).get == cb,
        s"seed $seed: leading silence must trim away exactly")
      assert(ham(Decode.chromaFingerprint(rate).get, cb) <= 20,
        s"seed $seed: re-rate twin must stay within the measured bound")
      // the envelope fp is shift-fragile — that gap is the chroma
      // fingerprint's reason to exist; pin it so it can't silently
      // close (if it ever does, the default choice should be revisited)
      assert(Decode.audioFingerprint(off).get !=
        Decode.audioFingerprint(base).get,
        s"seed $seed: envelope fp unexpectedly shift-robust")
    }
    val sigs = (0L until 40L).map(s =>
      Decode.chromaFingerprint(
        Decode.encodeEnvelopeWav(s, 8000, segSamples = 32)).get).toSet
    assert(sigs.size == 40, s"chroma cross-doc collisions: ${sigs.size}")
    assert(Decode.chromaFingerprint(null).isEmpty)
    assert(Decode.chromaFingerprint(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("reencodeJpeg: lossy round-trip keeps dims and stays within " +
       "8 dHash bits at quality 0.75; undecodable input is None") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (seed <- 0L until 50L) {
      val png = Decode.encodePatternPng(seed, 2)
      val jpg = Decode.reencodeJpeg(png, 0.75f).get
      val Some((w, h, _, _, _)) = Decode.decodeImage(jpg)
      assert((w, h) == (18, 16))
      assert(ham(Decode.dHash(png).get, Decode.dHash(jpg).get) <= 8,
        s"seed $seed: JPEG drift above the pinned bound")
    }
    assert(Decode.reencodeJpeg("not an image".getBytes("UTF-8")).isEmpty)
    assert(Decode.reencodeJpeg(null).isEmpty)
  }

  test("AVI/MJPEG roundtrip: encodeMjpegAvi → decodeAviFrames returns " +
       "every frame, each a decodable JPEG with the source dims; " +
       "truncation yields the intact prefix or None, never a throw") {
    val frames = (0 until 5).map(k =>
      Decode.reencodeJpeg(Decode.encodePatternPng(100L + k, 2), 0.85f).get)
    val avi = Decode.encodeMjpegAvi(frames, 18, 16, fps = 10)
    val back = Decode.decodeAviFrames(avi).get
    assert(back.size == 5)
    back.zip(frames).foreach { case (b, f) =>
      assert(b.sameElements(f), "frame bytes must roundtrip exactly")
      val Some((w, h, _)) = Decode.decodeRaster(b)
      assert((w, h) == (18, 16))
    }
    assert(Decode.decodeAviFrames(avi.take(40)).isEmpty,
      "movi-less truncation must report None")
    assert(Decode.decodeAviFrames("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty,
      "a RIFF that is not AVI must not parse")
    assert(Decode.decodeAviFrames(null).isEmpty)
  }

  test("animated GIF roundtrip: encodePatternGif → decodeGifRasters " +
       "returns every frame; gray-pattern frames (≤256 colors) decode " +
       "pixel-identical to their PNG sources") {
    val gif = Decode.encodePatternGif(7L, nFrames = 4, cell = 2)
    val rasters = Decode.decodeGifRasters(gif).get
    assert(rasters.size == 4)
    rasters.zipWithIndex.foreach { case ((w, h, px), k) =>
      assert((w, h) == (18, 16))
      val Some((pw, ph, ppx)) = Decode.decodeRaster(
        Decode.encodePatternPng(Decode.frameSeed(7L, k), 2))
      assert((pw, ph) == (w, h) && px.sameElements(ppx),
        s"frame $k: GIF palette must be lossless for gray patterns")
    }
    assert(Decode.decodeGifRasters(Array[Byte](1, 2, 3, 4, 5, 6)).isEmpty)
    assert(Decode.decodeGifRasters(null).isEmpty)
  }

  test("videoFingerprint: EXACT under frame duplication (the rate-" +
       "resample twin), near across the GIF container twin, distinct " +
       "across seeds, None on corrupt/non-video payloads") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val crossGif = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (seed <- 0L until 15L) {
      val base = Decode.encodePatternAvi(seed)
      val dup = Decode.encodePatternAvi(seed, dupFrames = 2)
      val gif = Decode.encodePatternGif(seed)
      val fb = Decode.videoFingerprint(base).get
      assert(Decode.videoFingerprint(dup).get == fb,
        s"seed $seed: majority-bit hash must be exact under frame dup")
      crossGif += ham(Decode.videoFingerprint(gif).get, fb)
      // 16-frame sampling of the 24-frame dup stream picks every other
      // frame = the base stream's frames at the base order
      assert(Decode.videoFingerprint(base.take(60)).isEmpty,
        "truncated container must report None")
    }
    // GIF twin carries the PRISTINE frames (gray patterns fit the
    // 256-color palette losslessly); the AVI side is JPEG — the
    // distance is exactly the JPEG noise surviving the majority vote
    // (MeasureMediaTwins: max 7 over 3000 seeds; q132 pins 11, the
    // banding recall radius)
    assert(crossGif.max <= 8, s"gif-twin drift too high: $crossGif")
    val sigs = (0L until 30L)
      .map(s => Decode.videoFingerprint(Decode.encodePatternAvi(s)).get)
    assert(sigs.toSet.size == 30, "cross-seed collisions")
    assert(Decode.videoFingerprint("not a video".getBytes("UTF-8")).isEmpty)
  }

  test("videoSignatures + simhashNearDups banding: dup-frame twins " +
       "pair at distance 0, corrupt payloads report unknown and " +
       "never pair") {
    val rows = (0L until 6L).flatMap { s =>
      Seq((s * 4, Decode.encodePatternAvi(s)),
          (s * 4 + 1, Decode.encodePatternAvi(s, dupFrames = 2)),
          (s * 4 + 2, Decode.encodePatternAvi(s).take(60)))
    }
    val df = spark.createDataFrame(rows).toDF("vid_id", "payload")
    val sigs = Decode.videoSignatures(df, "vid_id", "payload").toDF()
    import org.apache.spark.sql.functions.col
    val bad = sigs.filter(col("container") === "unknown")
      .select("vid_id").collect().map(_.getLong(0)).toSet
    assert(bad == (0L until 6L).map(_ * 4 + 2).toSet,
      "exactly the truncated payloads must report unknown")
    val pairs = graft.text.Dedup.simhashNearDups(
      sigs.filter(col("vhash").isNotNull)
        .select(col("vid_id"), col("vhash").as("simhash")),
      "vid_id", maxDistance = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 6L).forall(s => pairs.contains((s * 4, s * 4 + 1))),
      s"every dup-frame twin must pair at distance 0: $pairs")
    assert(pairs.forall { case (a, b) => a % 4 != 2 && b % 4 != 2 })
  }

  test("dHash128 / videoFingerprint128 (the n²/2^32 scale path): lo " +
       "half bit-identical to the 64-bit hashes, dup-frame twin " +
       "exact, measured drift bounds hold, banding128 surfaces twins") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (seed <- 0L until 30L) {
      val png = Decode.encodePatternPng(seed, 2)
      val (lo, _) = Decode.dHash128(png).get
      assert(lo == Decode.dHash(png).get,
        "the lo half IS dHash — downstream migration must be bitwise")
      val jpg = Decode.reencodeJpeg(png, 0.75f).get
      val (jlo, jhi) = Decode.dHash128(jpg).get
      val (_, hi) = Decode.dHash128(png).get
      assert(ham(lo, jlo) + ham(hi, jhi) <= 12,
        s"seed $seed: 128-bit JPEG drift above the measured band " +
          "(max 8 over 3000 seeds)")
    }
    for (seed <- 0L until 10L) {
      val base = Decode.videoFingerprint128(
        Decode.encodePatternAvi(seed)).get
      assert(Decode.videoFingerprint128(
        Decode.encodePatternAvi(seed, dupFrames = 2)).get == base,
        s"seed $seed: majority-per-half must stay exact under dup")
    }
    assert(Decode.dHash128(Array[Byte](1, 2, 3)).isEmpty)
    assert(Decode.videoFingerprint128("x".getBytes("UTF-8")).isEmpty)
    // end-to-end through the 128-bit banding: dup twins at distance 0
    val rows = (0L until 5L).flatMap { s =>
      Seq((s * 2, Decode.encodePatternAvi(s)),
          (s * 2 + 1, Decode.encodePatternAvi(s, dupFrames = 2)))
    }
    val sigs = Decode.videoSignatures128(
      spark.createDataFrame(rows).toDF("vid_id", "payload"),
      "vid_id", "payload")
    val pairs = graft.text.Dedup.simhashNearDups128(
      sigs.where(col("simhash_lo").isNotNull),
      "vid_id", maxDistance = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 5L).forall(s => pairs.contains((s * 2, s * 2 + 1))),
      s"128-bit banding must surface every dup twin: $pairs")
  }

  test("extractFeatures dispatches AVI payloads to the video decoder: " +
       "kind=video with dims + sampled frame count; a RIFF that is " +
       "neither WAVE nor AVI reports unknown") {
    import spark.implicits._
    val avi = Decode.encodePatternAvi(3L)
    val junk = ("RIFF1234" + "JUNKpayload").getBytes("US-ASCII")
    val ds = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, avi, "video/avi", 0, 0),
      Multimodal.MediaRecord(2L, junk, "application/octet-stream", 0, 0)))
    val rows = Multimodal.extractFeatures(ds).collect()
      .map(f => f.doc_id -> f).toMap
    val v = rows(1L)
    assert(v.kind == "video" && v.format == "avi" &&
      (v.width, v.height) == (18, 16) && v.n_frames == 12L)
    assert(v.f0 > 0.0 && v.f0 < 1.0,
      "first-frame channel mean must land strictly inside (0,1) for a " +
        "gray pattern")
    assert(rows(2L).kind == "unknown")
  }

  test("envelope generator carries seed entropy: nearest cross-doc " +
       "distance stays positive for both fingerprints (the r17 " +
       "splitmix fix — the additive LCG was period-16 in k and " +
       "collided every doc at distance 0)") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val fps = (0L until 60L).map { s =>
      val wav = Decode.encodeEnvelopeWav(s, 8000, segSamples = 32)
      (Decode.audioFingerprint(wav).get, Decode.chromaFingerprint(wav).get)
    }
    for (i <- fps.indices; j <- fps.indices if i < j) {
      assert(ham(fps(i)._1, fps(j)._1) > 0, s"env collision $i/$j")
      assert(ham(fps(i)._2, fps(j)._2) > 0, s"chroma collision $i/$j")
    }
  }

  test("goertzelAll: the fused multi-bin pass is bit-identical to the " +
       "textbook per-bin Goertzel loop it replaced (r18 fusion — the " +
       "cfp bits must not move)") {
    // the exact single-bin recurrence the r17 implementation ran
    def one(s: Array[Double], lo: Int, hi: Int, coeff: Double): Double = {
      var s1 = 0.0; var s2 = 0.0; var i = lo
      while (i < hi) {
        val s0 = s(i) + coeff * s1 - s2
        s2 = s1; s1 = s0; i += 1
      }
      s1 * s1 + s2 * s2 - coeff * s1 * s2
    }
    val rnd = new scala.util.Random(3)
    val samples = Array.fill(1024)(rnd.nextDouble() * 2 - 1)
    // the production coefficient set: 48 semitones from A2 at 8 kHz
    val coeffs = Array.tabulate(48)(f =>
      2.0 * math.cos(2.0 * math.Pi *
        (110.0 * math.pow(2.0, f / 12.0)) / 8000.0))
    val s1 = new Array[Double](48)
    val s2 = new Array[Double](48)
    val out = new Array[Double](48)
    // full span, single sample, empty span, tail span — and a smaller
    // active-bin count (the Nyquist prefix cut)
    for ((lo, hi) <- Seq((0, 1024), (100, 101), (5, 5), (1000, 1024));
         nBins <- Seq(48, 7)) {
      java.util.Arrays.fill(out, Double.NaN)
      Decode.goertzelAll(samples, lo, hi, coeffs, nBins, s1, s2, out)
      for (f <- 0 until nBins)
        assert(out(f) == one(samples, lo, hi, coeffs(f)),
          s"bin $f span [$lo,$hi) nBins=$nBins: fused != textbook")
    }
  }
}
