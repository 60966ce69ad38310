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
