package graft

import org.apache.spark.sql.functions._
import graft.ml.{Ivf, Similarity}

/** IVF ANN: determinism + recall vs brute force. */
class IvfSpec extends SparkSpec {

  lazy val emb = sf("embeddings")
  lazy val query: Seq[Float] = emb.filter(col("vec_id") === 11)
    .select("embedding").head().getSeq[Float](0)

  test("fit is deterministic and covers all vectors") {
    val m1 = Ivf.fit(emb, "embedding", k = 8, iters = 2)
    val m2 = Ivf.fit(emb, "embedding", k = 8, iters = 2)
    assert(m1.centroids.toSeq == m2.centroids.toSeq)
    assert(m1.assigned.count() == emb.count())
    assert(m1.assigned.select("cell").distinct().count() <= 8)
  }

  test("search finds the query vector itself; full probe = brute force") {
    val m = Ivf.fit(emb, "embedding", k = 8, iters = 2)
    val hit = Ivf.search(m, query, topK = 5, nprobe = 2).collect()
    assert(hit.head.getLong(0) == 11L)
    // probing every cell degenerates to exact brute force
    val all = Ivf.search(m, query, topK = 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSeq
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      query, 10).collect().map(_.getLong(0)).toSeq
    assert(all == brute)
  }

  test("nprobe=2 recall@10 is usable (> 0.4 on random embeddings)") {
    // random unclustered embeddings are the worst case for IVF; assert a
    // sane floor, not production recall
    val m = Ivf.fit(emb, "embedding", k = 8, iters = 3)
    val got = Ivf.search(m, query, topK = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      query, 10).collect().map(_.getLong(0)).toSet
    assert(got.intersect(brute).size >= 4)
  }

  test("fit survives NaN and ragged vectors (driver loop matches the " +
       "codegen argmax fallback)") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(Float.NaN, 1f)),           // NaN → cell 0, like lit(0)
      (4L, Seq(0.5f))                      // ragged: shorter than dim
    ).toDF("vec_id", "embedding")
    val m = Ivf.fit(emb, "embedding", k = 2, iters = 2)
    assert(m.assigned.count() == 4L)
  }
}
