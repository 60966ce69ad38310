package graft

import org.apache.spark.sql.functions._

/** SemDeDup semantic dedup ([[graft.ml.SemDedup]]). */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two tight groups on opposite axes + one singleton
  private def emb = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.99f, 0.01f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.01f, 0.99f, 0.0f)),
    (4L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")

  test("withinCellPairs finds both duplicate groups; precision 1.0") {
    val pairs = graft.ml.SemDedup.withinCellPairs(
      emb, "vec_id", "embedding", threshold = 0.9, k = 3, iters = 2)
      .collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found == Set((0L, 1L), (2L, 3L)))
    assert(pairs.forall(_.getDouble(2) >= 0.9))
  }

  test("kernel pair search (k > 64) matches an independent driver " +
       "computation exactly — ids, pairs, and rounded cosines") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val th = 0.35
    val got = graft.ml.SemDedup.withinCellPairs(
        docs, "vec_id", "embedding", threshold = th, k = 100, probes = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // independent reference: same deterministic fit, then driver-side
    // probed-cell assignment + brute-force co-probed cosine
    val model = graft.ml.Ivf.fit(docs, "embedding", k = 100, iters = 3)
    val k = model.centroids.length
    val dim = model.centroids.map(_.length).max
    val flat = new Array[Float](k * dim)
    val norms = new Array[Double](k)
    for (c <- 0 until k; i <- model.centroids(c).indices) {
      flat(c * dim + i) = model.centroids(c)(i)
      norms(c) += model.centroids(c)(i).toDouble * model.centroids(c)(i)
    }
    val rows = docs.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cellsOf = rows.map { case (id, v) =>
      id -> graft.functions.VectorExpressions
        .nearestCellsOf(v, flat, norms, dim, k, 2).toSet
    }.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        dot += a(i).toDouble * b(i); nx += a(i).toDouble * a(i)
        ny += b(i).toDouble * b(i); i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0
      else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val want = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      (ia, va) = rows(i); (ib, vb) = rows(j)
      if cellsOf(ia).intersect(cellsOf(ib)).nonEmpty
      c = BigDecimal(cos(va, vb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= th
    } yield (math.min(ia, ib), math.max(ia, ib), c)).toSet
    assert(got == want,
      s"kernel vs driver: only-got=${(got -- want).take(5)} " +
        s"only-want=${(want -- got).take(5)}")
    assert(want.nonEmpty)
  }

  test("semanticDedup keeps the min-id representative per group") {
    val keep = graft.ml.SemDedup.semanticDedup(
      emb, "vec_id", "embedding", threshold = 0.9, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keep == Map(0L -> true, 1L -> false, 2L -> true,
      3L -> false, 4L -> true))
  }

  test("multi-probe recall vs the exact twin on real embeddings") {
    val e = sf("embeddings")
    val exact = graft.ml.Similarity.exactCosinePairs(
      e, "vec_id", "embedding", threshold = 0.35)
    val nExact = exact.count()
    assert(nExact > 0)
    val single = graft.ml.SemDedup.withinCellPairs(
      e, "vec_id", "embedding", threshold = 0.35, k = 8, probes = 1)
    val multi = graft.ml.SemDedup.withinCellPairs(
      e, "vec_id", "embedding", threshold = 0.35, k = 8, probes = 3)
    def hits(f: org.apache.spark.sql.DataFrame) =
      f.join(exact.select("id_a", "id_b"), Seq("id_a", "id_b")).count()
    val (h1, h3) = (hits(single), hits(multi))
    // soft assignment recovers boundary pairs single-probe misses
    assert(h3 >= h1)
    assert(h3 >= math.ceil(nExact * 0.8).toLong,
      s"recall ${h3.toDouble / nExact} below bound")
    // precision is 1.0 by construction: every found pair is exact cosine
    assert(multi.join(exact.select("id_a", "id_b"),
      Seq("id_a", "id_b"), "left_anti").count() == 0)
  }

  test("kernel path on STRING ids — exact pair-and-cosine equality " +
       "with the driver twin, and the kernel (not the join) engages") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(format_string("d%08d", col("vec_id")).as("vec_id"),
        col("embedding"))
    val th = 0.35
    val pairsDf = graft.ml.SemDedup.withinCellPairs(
      docs, "vec_id", "embedding", threshold = th, k = 100, probes = 2)
    // the string-id corpus must take the primitive kernel, not the
    // self-join fallback the r12 builder measured 7× slower at 100×
    val plan = pairsDf.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"), s"kernel did not engage:\n$plan")
    assert(pairsDf.schema("id_a").dataType ==
      org.apache.spark.sql.types.StringType)
    val got = pairsDf.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    // independent driver twin: same deterministic fit, driver-side
    // probed-cell assignment + brute-force co-probed cosine, pairs
    // ordered by STRING comparison
    val model = graft.ml.Ivf.fit(docs, "embedding", k = 100, iters = 3)
    val k = model.centroids.length
    val dim = model.centroids.map(_.length).max
    val flat = new Array[Float](k * dim)
    val norms = new Array[Double](k)
    for (c <- 0 until k; i <- model.centroids(c).indices) {
      flat(c * dim + i) = model.centroids(c)(i)
      norms(c) += model.centroids(c)(i).toDouble * model.centroids(c)(i)
    }
    val rows = docs.select("vec_id", "embedding").collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toArray))
    val cellsOf = rows.map { case (id, v) =>
      id -> graft.functions.VectorExpressions
        .nearestCellsOf(v, flat, norms, dim, k, 2).toSet
    }.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        dot += a(i).toDouble * b(i); nx += a(i).toDouble * a(i)
        ny += b(i).toDouble * b(i); i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0
      else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val want = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      (ia, va) = rows(i); (ib, vb) = rows(j)
      if cellsOf(ia).intersect(cellsOf(ib)).nonEmpty
      c = BigDecimal(cos(va, vb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= th
    } yield if (ia < ib) (ia, ib, c) else (ib, ia, c)).toSet
    assert(got == want,
      s"kernel vs driver: only-got=${(got -- want).take(5)} " +
        s"only-want=${(want -- got).take(5)}")
    assert(want.nonEmpty)
  }

  test("kernel output id type equals input id type (int stays int)") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id").cast("int").as("vec_id"), col("embedding"))
    val pairs = graft.ml.SemDedup.withinCellPairs(
      docs, "vec_id", "embedding", threshold = 0.35, k = 100, probes = 2)
    // schema contract: the path the corpus size picks (kernel here,
    // join below 64 cells) must not leak into the result type
    assert(pairs.schema("id_a").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(pairs.schema("id_b").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(pairs.count() > 0)
  }

  test("null ids and null/empty vectors survive the kernel path " +
       "and never pair") {
    val base: Seq[(Option[Long], Option[Seq[Float]])] = Seq(
      (Some(0L), Some(Seq(1.0f, 0.0f))),
      (Some(1L), Some(Seq(0.99f, 0.01f))),
      (None, Some(Seq(1.0f, 0.0f))),          // null id
      (Some(3L), None),                        // null vector
      (Some(4L), Some(Seq.empty[Float])))      // empty vector
    val df = base.toDF("vec_id", "embedding")
    // k=100 forces the kernel path (kEff > 64)
    val pairs = graft.ml.SemDedup.withinCellPairs(
      df, "vec_id", "embedding", threshold = 0.9, k = 100, probes = 2)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((0L, 1L)))
  }

  test("kernel path on BINARY ids (UUID-style): exact pair-and-cosine " +
       "equality with the driver twin") {
    // 16-byte big-endian encoding: binary (unsigned lexicographic)
    // order equals numeric order for non-negative longs, so the
    // driver twin can order pairs on the decoded long. NOTE the pair
    // SET legitimately differs from a long-id run — Ivf.fit samples by
    // xxhash64(id), so the id representation changes the fit.
    val docs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(expr("unhex(lpad(hex(vec_id), 32, '0'))").as("vec_id"),
        col("embedding"))
    val th = 0.35
    val pairsDf = graft.ml.SemDedup.withinCellPairs(
      docs, "vec_id", "embedding", threshold = th, k = 100, probes = 2)
    assert(pairsDf.schema("id_a").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(pairsDf.queryExecution.executedPlan.toString
      .contains("MapPartitions"))
    def toLong(b: Array[Byte]): Long =
      b.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xffL))
    val got = pairsDf.collect().map { r =>
      (toLong(r.getAs[Array[Byte]](0)), toLong(r.getAs[Array[Byte]](1)),
        r.getDouble(2))
    }.toSet
    val model = graft.ml.Ivf.fit(docs, "embedding", k = 100, iters = 3)
    val k = model.centroids.length
    val dim = model.centroids.map(_.length).max
    val flat = new Array[Float](k * dim)
    val norms = new Array[Double](k)
    for (c <- 0 until k; i <- model.centroids(c).indices) {
      flat(c * dim + i) = model.centroids(c)(i)
      norms(c) += model.centroids(c)(i).toDouble * model.centroids(c)(i)
    }
    val rows = docs.select("vec_id", "embedding").collect()
      .map(r => (toLong(r.getAs[Array[Byte]](0)),
        r.getSeq[Float](1).toArray))
    val cellsOf = rows.map { case (id, v) =>
      id -> graft.functions.VectorExpressions
        .nearestCellsOf(v, flat, norms, dim, k, 2).toSet
    }.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        dot += a(i).toDouble * b(i); nx += a(i).toDouble * a(i)
        ny += b(i).toDouble * b(i); i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0
      else dot / (math.sqrt(nx) * math.sqrt(ny))
    }
    val want = (for {
      i <- rows.indices; j <- (i + 1) until rows.length
      (ia, va) = rows(i); (ib, vb) = rows(j)
      if cellsOf(ia).intersect(cellsOf(ib)).nonEmpty
      c = BigDecimal(cos(va, vb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= th
    } yield (math.min(ia, ib), math.max(ia, ib), c)).toSet
    assert(got == want,
      s"kernel vs driver: only-got=${(got -- want).take(5)} " +
        s"only-want=${(want -- got).take(5)}")
    assert(want.nonEmpty)
  }

  test("auto-k cap warns loudly instead of degrading silently") {
    val before = graft.functions.Warnings.recentDriverWarnings.size
    // SemDedup cap: 65536 cells × 256/cell ≈ 16.8M vectors
    assert(graft.ml.SemDedup.autoK(40L * 1000 * 1000) == 65536)
    // Ivf cap: the fit sample budget
    assert(graft.ml.Ivf.autoK(40L * 1000 * 1000, 1024) == 1024)
    val msgs = graft.functions.Warnings.recentDriverWarnings.drop(before)
    assert(msgs.exists(m => m.contains("semdedup auto-k capped") &&
      m.contains("Shard")))
    assert(msgs.exists(m => m.contains("ivf auto-k capped") &&
      m.contains("sampleSize")))
    // below the cap: silent
    assert(graft.ml.SemDedup.autoK(1000L) == 8)
    assert(graft.functions.Warnings.recentDriverWarnings.size == before + 2)
  }

  test("scale knobs read the session conf: targetCellSize and kCap " +
       "are tunable without a recompile") {
    try {
      spark.conf.set("graft.semdedup.targetCellSize", "100")
      assert(graft.ml.SemDedup.autoK(10000L) == 100)   // 10000/100
      spark.conf.set("graft.semdedup.kCap", "50")
      assert(graft.ml.SemDedup.autoK(10000L) == 50)    // conf cap clamps
      spark.conf.set("graft.ivf.targetCellSize", "500")
      assert(graft.ml.Ivf.autoK(10000L, 65536) == 20)  // 10000/500
    } finally {
      spark.conf.unset("graft.semdedup.targetCellSize")
      spark.conf.unset("graft.semdedup.kCap")
      spark.conf.unset("graft.ivf.targetCellSize")
    }
    // back to compiled defaults once the confs are unset
    assert(graft.ml.SemDedup.autoK(10000L) == 10000L / 256)
  }

  test("probe pins: empty corpus, zero vectors, probes > k") {
    val none = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(graft.ml.SemDedup.withinCellPairs(
      none, "vec_id", "embedding", 0.9, k = 2).count() == 0L)
    // a zero vector has no direction: it must never pair
    val z = Seq((1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(1f, 0.01f)))
      .toDF("vec_id", "embedding")
    val zp = graft.ml.SemDedup.withinCellPairs(
      z, "vec_id", "embedding", 0.9, k = 2, probes = 2).collect()
    assert(zp.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((2L, 3L)))
    // probes beyond k clamp to k instead of erroring
    val two = Seq((1L, Seq(1f, 0f)), (2L, Seq(0.99f, 0.1f)))
      .toDF("vec_id", "embedding")
    assert(graft.ml.SemDedup.withinCellPairs(
      two, "vec_id", "embedding", 0.9, k = 2, probes = 5).count() == 1L)
  }
}
