package graft

import org.apache.spark.sql.functions._
import graft.ml.QualityClassifier

/** Hashed-feature logistic-regression quality classifier
  * ([[graft.ml.QualityClassifier]]): featurization shape, learning a
  * planted signal, held-out generalization, AUC math. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val K = 256

  test("featurize: one sparse row per doc, log1p-dampened counts, " +
       "bins bounded by numBins") {
    val f = QualityClassifier.featurize(
      Seq((1L, "a a a b"), (2L, ""), (3L, "c")).toDF("doc_id", "text"),
      "doc_id", "text", K).collect()
    // EVERY doc gets a row; the empty doc carries empty arrays and
    // scores sigmoid(bias) downstream instead of vanishing
    assert(f.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    val empty = f.find(_.getLong(0) == 2L).get
    assert(empty.getSeq[Int](1).isEmpty && empty.getSeq[Double](2).isEmpty)
    val r1 = f.find(_.getLong(0) == 1L).get
    val bins = r1.getSeq[Int](1); val vals = r1.getSeq[Double](2)
    assert(bins.size == 2 && bins.forall(b => b >= 0 && b < K))
    assert(vals.toSet == Set(math.log1p(3.0), math.log1p(1.0)))
  }

  test("learns a planted marker signal and generalizes to held-out " +
       "docs; AUC reads 1.0") {
    val rnd = new scala.util.Random(7L)
    def noise() = (0 until 8).map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
    val all = (0L until 120L).map { i =>
      val pos = i % 2 == 0
      val marker = if (pos) "good stuff verified" else "spam click bait"
      (i, s"${noise()} $marker ${noise()}", if (pos) 1 else 0)
    }.toDF("doc_id", "text", "label")
    val train = all.filter(col("doc_id") % 4 < 2)
    val test = all.filter(col("doc_id") % 4 >= 2)
    val feats = QualityClassifier.featurize(all, "doc_id", "text", K)
    val w = QualityClassifier.train(feats, train, "doc_id", "label", K)
    assert(w.length == K + 1)
    val scored = QualityClassifier.score(
      feats.join(test.select("doc_id"), "doc_id"), w)
    val j = scored.join(test.select("doc_id", "label"), "doc_id").collect()
    val pos = j.filter(_.getInt(2) == 1).map(_.getDouble(1))
    val neg = j.filter(_.getInt(2) == 0).map(_.getDouble(1))
    assert(pos.min > neg.max,
      s"no separation: pos.min=${pos.min} neg.max=${neg.max}")
    assert(QualityClassifier.auc(scored, test, "doc_id", "label") == 1.0)
  }

  test("auc: hand cases — perfect ranking 1.0, constant scores 0.5 " +
       "(tie handling)") {
    val perfect = Seq((1L, 0.9), (2L, 0.8), (3L, 0.2), (4L, 0.1))
      .toDF("doc_id", "quality_score")
    val labels = Seq((1L, 1), (2L, 1), (3L, 0), (4L, 0))
      .toDF("doc_id", "label")
    assert(QualityClassifier.auc(perfect, labels, "doc_id", "label") == 1.0)
    val flat = Seq((1L, 0.5), (2L, 0.5), (3L, 0.5), (4L, 0.5))
      .toDF("doc_id", "quality_score")
    assert(QualityClassifier.auc(flat, labels, "doc_id", "label") == 0.5)
  }

  test("auc fails loudly on a label-homogeneous eval set") {
    val scored = Seq((1L, 0.9), (2L, 0.8)).toDF("doc_id", "quality_score")
    val oneClass = Seq((1L, 1), (2L, 1)).toDF("doc_id", "label")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.auc(scored, oneClass, "doc_id", "label")
    }
    assert(e.getMessage.contains("both classes"))
  }

  test("weights round-trip bit-exactly through save/load; reloaded " +
       "scores equal in-session scores") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "alpha zeta"), (4L, "eta theta iota"))
      .toDF("doc_id", "text")
    val labels = Seq((1L, 1), (2L, 0), (3L, 1), (4L, 0))
      .toDF("doc_id", "label")
    val feats = QualityClassifier.featurize(docs, "doc_id", "text", K)
    val w = QualityClassifier.train(feats, labels, "doc_id", "label", K,
      iters = 5)
    QualityClassifier.saveWeights(spark, w, "qcspec_weights")
    val w2 = QualityClassifier.loadWeights(spark, "qcspec_weights")
    assert(w.length == w2.length && w.indices.forall(i => w(i) == w2(i)))
    val a = QualityClassifier.score(feats, w)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = QualityClassifier.score(feats, w2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a == b)
  }

  test("calibrateThreshold: exact k-th largest score, ties land on " +
       "the keep side; degenerate rates fail loudly") {
    // scores 0.9, 0.7, 0.7, 0.5, 0.1 — rate 0.4 → k=2 → t = 0.7;
    // >= t keeps 3 (the tie), > t keeps 1 (< k) — the exact-k contract
    val scored = Seq((1L, 0.9), (2L, 0.7), (3L, 0.7), (4L, 0.5),
      (5L, 0.1)).toDF("doc_id", "quality_score")
    assert(QualityClassifier.calibrateThreshold(scored, 0.4) == 0.7)
    assert(QualityClassifier.calibrateThreshold(scored, 1.0) == 0.1)
    assert(QualityClassifier.calibrateThreshold(scored, 0.01) == 0.9)
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.calibrateThreshold(scored, 0.0)
    }
    assert(e.getMessage.contains("targetKeepRate"))
    val e2 = intercept[IllegalArgumentException] {
      QualityClassifier.calibrateThreshold(
        Seq.empty[(Long, Double)].toDF("doc_id", "quality_score"), 0.5)
    }
    assert(e2.getMessage.contains("no scored rows"))
    // null / NaN scores fail loudly UP FRONT (r15 advisory): a null
    // would otherwise NPE deep in a sort task and NaN ordering would
    // silently shift the k-th-largest rank
    val withNull = Seq((1L, Some(0.9)), (2L, None), (3L, Some(0.5)))
      .toDF("doc_id", "quality_score")
    val e3 = intercept[IllegalArgumentException] {
      QualityClassifier.calibrateThreshold(withNull, 0.5)
    }
    assert(e3.getMessage.contains("null/NaN"), e3.getMessage)
    val withNan = Seq((1L, 0.9), (2L, Double.NaN), (3L, 0.5))
      .toDF("doc_id", "quality_score")
    val e4 = intercept[IllegalArgumentException] {
      QualityClassifier.calibrateThreshold(withNan, 0.5)
    }
    assert(e4.getMessage.contains("null/NaN"), e4.getMessage)
  }

  test("saveWeights rejects database-qualified names (orphan-dir " +
       "cleanup only knows the unqualified warehouse layout)") {
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.saveWeights(spark, Array(1.0), "db.tbl")
    }
    assert(e.getMessage.contains("unqualified"), e.getMessage)
  }

  test("degenerate inputs fail loudly: no labeled rows") {
    val empty = QualityClassifier.featurize(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", K)
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.train(empty,
        Seq.empty[(Long, Int)].toDF("doc_id", "label"),
        "doc_id", "label", K)
    }
    assert(e.getMessage.contains("no labeled rows"))
  }
}
