package graft.tools

import graft.multimodal.Decode

/** Measurement harness for the r17 lossy re-encode twins — prints the
  * Hamming-distance distributions that pick the pinned gate bounds and
  * the default audio fingerprint (VERDICT r16 asks #3/#4). Pure driver
  * JVM, no Spark: the fingerprints are scalar functions; the
  * distributional claim is about the HASH, not the plan.
  *
  * Usage: runMain graft.tools.MeasureMediaTwins [nSeeds]
  */
object MeasureMediaTwins {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 500
    def hist(name: String, ds: Seq[Int]): Unit = {
      val m = ds.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
      println(f"$name%-42s n=${ds.size} max=${ds.max} " +
        m.map { case (d, c) => s"$d:$c" }.mkString(" "))
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

    // ---- image: dHash vs JPEG re-encode at two qualities
    for (q <- Seq(0.9f, 0.75f, 0.5f)) {
      val ds = (0 until n).map { s =>
        val png = Decode.encodePatternPng(s.toLong, 2)
        val jpg = Decode.reencodeJpeg(png, q).get
        ham(Decode.dHash(png).get, Decode.dHash(jpg).get)
      }
      hist(s"image dHash vs jpeg(q=$q)", ds)
    }
    // jpeg of the 2x upscale (re-encode AND rescale)
    val dsUp = (0 until n).map { s =>
      val png = Decode.encodePatternPng(s.toLong, 2)
      val jpg = Decode.reencodeJpeg(Decode.encodePatternPng(s.toLong, 4),
        0.75f).get
      ham(Decode.dHash(png).get, Decode.dHash(jpg).get)
    }
    hist("image dHash vs jpeg(2x upscale, q=0.75)", dsUp)

    // ---- audio: base vs rate/gain twin and vs offset twin, both fps
    val base = (0 until n).map(s =>
      Decode.encodeEnvelopeWav(s.toLong, 8000, segSamples = 32, gain = 1.0))
    val rate = (0 until n).map(s =>
      Decode.encodeEnvelopeWav(s.toLong, 16000, segSamples = 64, gain = 0.5))
    val off = (0 until n).map(s =>
      Decode.encodeEnvelopeWav(s.toLong, 8000, segSamples = 32, gain = 1.0,
        padSamples = 2000))
    def fps(b: Array[Byte]) =
      (Decode.audioFingerprint(b).get, Decode.chromaFingerprint(b).get)
    val fb = base.map(fps); val fr = rate.map(fps); val fo = off.map(fps)
    hist("audio ENV base vs rate/gain twin",
      fb.zip(fr).map { case (a, b) => ham(a._1, b._1) })
    hist("audio ENV base vs offset twin",
      fb.zip(fo).map { case (a, b) => ham(a._1, b._1) })
    hist("audio CHROMA base vs rate/gain twin",
      fb.zip(fr).map { case (a, b) => ham(a._2, b._2) })
    hist("audio CHROMA base vs offset twin",
      fb.zip(fo).map { case (a, b) => ham(a._2, b._2) })
    // cross-doc separation: nearest other-doc distance for both fps.
    // All-pairs is O(n²) — bounded to the first 3000 docs so large-n
    // runs (the tail-bound sweeps for the gate pins) stay twin-bound
    val cross = math.min(n, 3000)
    def minCross(xs0: Seq[Long]): Seq[Int] = {
      val xs = xs0.take(cross).toArray
      xs.indices.map { i =>
        var m = 64; var j = 0
        while (j < xs.length) {
          if (j != i) { val d = ham(xs(i), xs(j)); if (d < m) m = d }
          j += 1
        }
        m
      }
    }
    hist(s"audio ENV nearest cross-doc (first $cross)",
      minCross(fb.map(_._1)))
    hist(s"audio CHROMA nearest cross-doc (first $cross)",
      minCross(fb.map(_._2)))
    // ---- video: majority-bit hash vs dup-frame twin and GIF twin
    val vn = math.min(n, 3000) // synthesis-heavy (~50 ms/seed)
    val vBase = (0 until vn).map(s => Decode.encodePatternAvi(s.toLong))
    val vDup = (0 until vn).map(s =>
      Decode.encodePatternAvi(s.toLong, dupFrames = 2))
    val vGif = (0 until vn).map(s => Decode.encodePatternGif(s.toLong))
    val vfb = vBase.map(b => Decode.videoFingerprint(b).get)
    hist(s"video MAJ base vs dup-frame twin (n=$vn)",
      vfb.zip(vDup.map(b => Decode.videoFingerprint(b).get))
        .map { case (a, b) => ham(a, b) })
    hist(s"video MAJ base vs GIF container twin (n=$vn)",
      vfb.zip(vGif.map(b => Decode.videoFingerprint(b).get))
        .map { case (a, b) => ham(a, b) })
    hist(s"video MAJ nearest cross-doc (first ${math.min(vn, 3000)})",
      minCross(vfb))
    // 128-bit matrix (the scale path): distances roughly double for
    // the same perceptual gap (twice the bits)
    def ham128(a: (Long, Long), b: (Long, Long)) =
      ham(a._1, b._1) + ham(a._2, b._2)
    val i128 = (0 until vn).map { s =>
      val png = Decode.encodePatternPng(s.toLong, 2)
      ham128(Decode.dHash128(png).get,
        Decode.dHash128(Decode.reencodeJpeg(png, 0.75f).get).get)
    }
    hist(s"image dHash128 vs jpeg(q=0.75) (n=$vn)", i128)
    val v128b = vBase.map(b => Decode.videoFingerprint128(b).get)
    hist(s"video MAJ128 base vs dup-frame twin (n=$vn)",
      v128b.zip(vDup.map(b => Decode.videoFingerprint128(b).get))
        .map { case (a, b) => ham128(a, b) })
    hist(s"video MAJ128 base vs GIF twin (n=$vn)",
      v128b.zip(vGif.map(b => Decode.videoFingerprint128(b).get))
        .map { case (a, b) => ham128(a, b) })

    // fingerprint cost (per-payload, warm)
    for ((nm, f) <- Seq(
        ("env", (b: Array[Byte]) => Decode.audioFingerprint(b)),
        ("chroma", (b: Array[Byte]) => Decode.chromaFingerprint(b)))) {
      (0 until 3).foreach(_ => base.foreach(f)) // warm
      val t0 = System.nanoTime()
      base.foreach(f)
      println(f"audio $nm%-7s cost: ${(System.nanoTime() - t0) / 1e3 / n}%.1f us/payload")
    }
  }
}
