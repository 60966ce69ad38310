package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trainable quality classifier — the fastText-style discriminative
  * filter production pipelines train on curated-vs-raw examples (the
  * GPT-3 WebText classifier / LLaMA reference-classifier recipe;
  * complements [[graft.text.LangModel.dsirWeights]], which is the
  * GENERATIVE importance weight over the same feature idea): hashed
  * bag-of-tokens features, L2-regularized logistic regression, score =
  * P(quality | doc).
  *
  * Scale design: the MODEL is tiny (numBins + 1 doubles) and the DATA
  * is what scales — so features are built ONCE (one explode +
  * two-level aggregation, shuffling (id, bin) count pairs, never
  * text) and persisted, each full-batch gradient step is one
  * map+reduce pass over them with the weights broadcast, and the
  * driver holds only the weight vector. Full-batch (not SGD) because
  * a distributed sum is the natural Spark step and makes training
  * order-independent up to float addition order (~1e-15/step — the
  * verdicts gate on margins, not hashes of scores). Scoring is a
  * shuffle-free projection over the same features.
  */
object QualityClassifier {

  /** (id, bins, vals): one sparse hashed-count feature row per doc.
    * `numBins` buckets token hashes (fastText's hashing trick); vals
    * are log1p(count) — the standard dampening so a 1000-repeat token
    * doesn't dominate a document. */
  def featurize(docs: DataFrame, idCol: String, textCol: String,
                numBins: Int = 1 << 12): DataFrame = {
    require(numBins > 0, "numBins must be positive")
    val toks = graft.text.TextAnalysis.tokens(col(textCol))
    val agg = docs
      .select(col(idCol).as("doc_id"), explode(toks).as("w"))
      .select(col("doc_id"),
        pmod(xxhash64(col("w")), lit(numBins.toLong)).cast(IntegerType)
          .as("bin"))
      .groupBy("doc_id", "bin").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        collect_list(col("bin")).as("bins"),
        collect_list(log1p(col("c"))).as("vals"))
    // EVERY doc gets a feature row — a null/empty-text doc carries
    // empty arrays and scores sigmoid(bias) downstream, instead of
    // silently vanishing from a quality-filter pipeline (and from a
    // gate's count anchors)
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("bins"), array().cast("array<int>")).as("bins"),
        coalesce(col("vals"), array().cast("array<double>")).as("vals"))
  }

  /** Weights (index numBins = bias) from full-batch gradient descent
    * over `features` joined with labels. Persist `features` before
    * calling (every iteration passes over them). */
  def train(features: DataFrame, labels: DataFrame, idCol: String,
            labelCol: String, numBins: Int = 1 << 12,
            iters: Int = 30, lr: Double = 0.5,
            l2: Double = 1e-4): Array[Double] = {
    val data = features.join(
        labels.select(col(idCol).as("doc_id"),
          col(labelCol).cast(DoubleType).as("y")), "doc_id")
      .select(col("y"), col("bins"), col("vals"))
    val spark = features.sparkSession
    val rdd = data.rdd.map { r =>
      (r.getDouble(0), r.getSeq[Int](1).toArray, r.getSeq[Double](2).toArray)
    }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = rdd.count().toDouble
    require(n > 0, "quality classifier: no labeled rows")
    val w = new Array[Double](numBins + 1)
    var it = 0
    while (it < iters) {
      val bw = spark.sparkContext.broadcast(w)
      val grad = rdd.treeAggregate(new Array[Double](numBins + 1))(
        seqOp = (g, row) => {
          val (y, bins, vals) = row
          val wv = bw.value
          var z = wv(numBins)
          var i = 0
          while (i < bins.length) { z += wv(bins(i)) * vals(i); i += 1 }
          val err = 1.0 / (1.0 + math.exp(-z)) - y
          i = 0
          while (i < bins.length) { g(bins(i)) += err * vals(i); i += 1 }
          g(numBins) += err
          g
        },
        combOp = (a, b) => { var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }; a })
      var j = 0
      while (j < numBins) { // bias is not regularized
        w(j) -= lr * (grad(j) / n + l2 * w(j)); j += 1
      }
      w(numBins) -= lr * grad(numBins) / n
      bw.destroy()
      it += 1
    }
    rdd.unpersist(blocking = false)
    w
  }

  /** P(quality) per doc — shuffle-free over the feature rows. */
  def score(features: DataFrame, weights: Array[Double]): DataFrame = {
    val numBins = weights.length - 1
    val sc = udf { (bins: Seq[Int], vals: Seq[Double]) =>
      var z = weights(numBins)
      var i = 0
      while (i < bins.length) { z += weights(bins(i)) * vals(i); i += 1 }
      1.0 / (1.0 + math.exp(-z))
    }
    features.select(col("doc_id"),
      sc(col("bins"), col("vals")).as("quality_score"))
  }

  // -------------------------------------------------------------------
  // Persistence + calibration — a trained filter is an epoch artifact
  // like a BPE vocabulary or a dedup index: train once, persist, then
  // every later job (or session) scores against the saved weights and
  // a threshold calibrated to a target keep rate.

  /** Persist weights as `<name>` (idx, w) — one self-describing table
    * (the [[graft.text.Bpe.saveVocab]] pattern); index numBins is the
    * bias. Clears a stale orphaned warehouse location first (the
    * [[graft.text.DedupIndex]] rule: an in-memory catalog forgets
    * tables across sessions while their directories survive, and a
    * retrain must overwrite, not die on LOCATION_ALREADY_EXISTS). */
  def saveWeights(spark: org.apache.spark.sql.SparkSession,
                  weights: Array[Double], name: String): Unit = {
    import spark.implicits._
    // ONLY the orphan case (dir survives a session whose in-memory
    // catalog forgot the table) needs the manual delete; dropping a
    // LIVE table first would open a data-loss window — a retrain that
    // crashes mid-write must leave the previous epoch's weights
    // readable, and mode(overwrite) handles the cataloged case.
    // Locale.ROOT: Spark lowercases table names with ROOT semantics;
    // a default-locale fold diverges under tr/az and misses the dir.
    // unqualified names only: a db-qualified `db.tbl` lives at
    // <warehouse>/<db>.db/<tbl>, so the string-concat orphan path below
    // would miss it and the retrain would still die on
    // LOCATION_ALREADY_EXISTS — reject up front rather than half-work
    require(!name.contains("."),
      s"saveWeights: unqualified table name required (got '$name'); " +
        "database-qualified weight tables are not supported")
    if (!spark.catalog.tableExists(name)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh,
        name.toLowerCase(java.util.Locale.ROOT))
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
    weights.toSeq.zipWithIndex.map { case (w, i) => (i, w) }
      .toDF("idx", "w")
      .write.mode("overwrite").saveAsTable(name)
  }

  /** Reload [[saveWeights]] output (bounded collect — the model is
    * numBins + 1 doubles, never corpus-sized). */
  def loadWeights(spark: org.apache.spark.sql.SparkSession,
                  name: String): Array[Double] = {
    val rows = spark.table(name).orderBy(col("idx")).collect()
    require(rows.nonEmpty, s"quality classifier: weight table $name is empty")
    rows.map(_.getDouble(1))
  }

  /** The score threshold that keeps `targetKeepRate` of `scored`:
    * the exact k-th LARGEST quality_score with k = ceil(rate × n), so
    * `score >= t` keeps at least k docs and `score > t` keeps fewer
    * than k (ties land on the keep side — the conventional inclusive
    * percentile). EXACT, not approx: production mixtures are specified
    * as hard byte/doc budgets, and approxQuantile's error bound is a
    * silent corpus-size drift. Distributed selection shape: one
    * range-partitioned sort of the (8-byte) score column +
    * zipWithIndex, then a 1-row lookup — no global single-partition
    * window, no driver-side score array. */
  def calibrateThreshold(scored: DataFrame,
                         targetKeepRate: Double): Double = {
    require(targetKeepRate > 0 && targetKeepRate <= 1,
      s"targetKeepRate must be in (0, 1] (got $targetKeepRate)")
    // fail loudly on null/NaN scores up front: a null would surface as
    // an opaque NPE from deep inside a sort task, and NaN ordering
    // under sortBy(-s) silently shifts the k-th-largest rank — both
    // are corpus bugs the caller must see, not absorb
    val rdd = scored.select(col("quality_score").cast(DoubleType)).rdd
      .map(r => if (r.isNullAt(0)) Double.NaN else r.getDouble(0))
    val (n, nBad) = rdd.map(s => (1L, if (s.isNaN) 1L else 0L))
      .fold((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
    require(nBad == 0L,
      s"calibrateThreshold: $nBad of $n quality_score values are " +
        "null/NaN — fix the scoring pass (a silent drop here would " +
        "shift the calibrated keep rate)")
    require(n > 0, "calibrateThreshold: no scored rows")
    val k = math.max(1L, math.ceil(targetKeepRate * n).toLong)
    val hit = rdd.sortBy(s => -s).zipWithIndex()
      .filter(_._2 == k - 1).map(_._1).collect()
    require(hit.length == 1,
      s"calibrateThreshold: rank ${k - 1} lookup returned ${hit.length} rows")
    hit(0)
  }

  /** AUC by rank-sum (exact Mann-Whitney over the scored frame) — the
    * verdict a classifier gate needs. Ties get average ranks.
    * EVAL MACHINERY, not a production path: the global rank is one
    * single-partition window, fine at gate/eval-set scale (the same
    * bounded-twin policy as the dedup recall gates) — never run it
    * over a full corpus. */
  def auc(scored: DataFrame, labels: DataFrame, idCol: String,
          labelCol: String): Double = {
    import org.apache.spark.sql.expressions.Window
    val j = scored.join(labels.select(col(idCol).as("doc_id"),
      col(labelCol).cast(DoubleType).as("y")), "doc_id")
    val ranked = j.withColumn("r",
      avg(row_number().over(Window.orderBy(col("quality_score"),
        col("doc_id")))).over(Window.partitionBy(col("quality_score"))))
    val agg = ranked.agg(
      sum(when(col("y") === 1.0, col("r"))).as("rpos"),
      count(when(col("y") === 1.0, 1)).cast(DoubleType).as("np"),
      count(when(col("y") === 0.0, 1)).cast(DoubleType).as("nn")).head()
    val (np, nn) = (agg.getDouble(1), agg.getDouble(2))
    // fail loudly on a label-homogeneous eval set (AUC is undefined):
    // a bare NPE / silent NaN would mask the real problem
    require(np > 0 && nn > 0,
      s"AUC needs both classes in the eval set (pos=$np, neg=$nn)")
    (agg.getDouble(0) - np * (np + 1) / 2) / (np * nn)
  }
}
