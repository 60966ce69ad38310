package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.reflect.runtime.universe.TypeTag
import graft.functions.VectorExpressions.cosine_sim

/** SemDeDup (Abbas et al., 2023) — semantic deduplication of a training
  * corpus by embedding: k-means-cluster the embedding space, search for
  * near-duplicate pairs by EXACT cosine within each cluster only, then
  * resolve transitive duplicate groups and keep one representative.
  *
  * This is the scale recipe for embedding-level dedup: the quadratic
  * pair search is confined to one cluster at a time, so with k chosen as
  * n / targetCellSize the expected per-cell work stays bounded while the
  * corpus grows — the published SemDeDup configuration (clusters scale
  * with corpus size). Cross-cluster near-duplicates are the recall cost;
  * the verdict gate (q93) measures exactly that against the brute-force
  * twin.
  *
  * Pipeline shape:
  *  - fit: [[Ivf.fit]]'s seeded Lloyd iterations (scan + partial agg);
  *  - pair search: ONE shuffle clustering rows by cell, then a same-cell
  *    self-join with an id_a < id_b guard and a codegen'd exact cosine —
  *    precision is 1.0 by construction, only recall is approximate;
  *  - resolution: [[graft.text.Dedup.connectedComponents]] (large/small-
  *    star, O(log n) rounds) + keep the min-id member per component.
  */
object SemDedup {

  /** Target rows per k-means cell under auto-k. Total pair work is
    * probes² · n · cellSize / 2 — LINEAR in n once k scales as
    * n / cellSize. A fixed k is quadratic in n (measured r12: 10×
    * corpus → 38× wall time at k=8) — never ship a fixed k to a
    * growing corpus. 256 reproduces the tuned sf0.1 behavior
    * (2000 vectors → k=8) while holding cell size flat from there up.
    *
    * Recall trade (measured r12 on a derived 10× corpus): precision
    * stays 1.0 by construction; recall against the exact twin at a
    * LOW threshold (0.35 — "related", not "duplicate") drops as k
    * grows (0.96 at k=8 → 0.42 at k=78, probes=3) because distant
    * pairs straddle cells. This matches the published SemDeDup
    * operating point: it dedups within clusters only (probes=1) at
    * HIGH similarity thresholds, where near-duplicates are genuinely
    * co-located. The recall levers, in preference order: raise the
    * threshold to a dedup-grade one, raise `probes` (cost ∝ probes²),
    * raise [[TargetCellSize]] (cost ∝ cellSize). */
  val TargetCellSize = 256L

  /** Auto-k cap = Ivf.fit's default sample budget: centroids beyond
    * the fit sample are meaningless. Past the cap (≳16M vectors at
    * [[TargetCellSize]]) cell size grows with the corpus again and the
    * pair search degrades toward quadratic — [[autoK]] warns at
    * runtime when that cliff is crossed. */
  val KCap = 65536L

  /** Clusters proportional to corpus size; warns loudly when the cap
    * clamps the count (the silent-clamp trap: everything still runs,
    * just increasingly slowly as cells grow). */
  private[graft] def autoK(n: Long): Int = {
    // both knobs are session-tunable (graft.semdedup.targetCellSize /
    // graft.semdedup.kCap) — a 100 TB run must be able to trade cell
    // size for recall without recompiling; the compiled values above
    // stay the defaults
    val cellSize = graft.GraftSession.longConf(
      "graft.semdedup.targetCellSize", TargetCellSize)
    val kCap = graft.GraftSession.longConf("graft.semdedup.kCap", KCap)
    val want = math.max(8L, n / math.max(1L, cellSize))
    if (want > kCap)
      graft.functions.Warnings.driverWarn(
        s"semdedup auto-k capped at $kCap (corpus of $n vectors wants " +
          s"$want cells): per-cell pair work now grows with the corpus. " +
          "Shard the corpus (per-source/per-shard dedup passes) or raise " +
          "the Ivf fit sample budget and pass an explicit k.")
    math.min(kCap, want).toInt
  }

  /** Resolve auto-k (k ≤ 0): one column-pruned count (parquet footers
    * at scan time — negligible next to the pair search). */
  private def effectiveK(emb: DataFrame, idCol: String, k: Int): Int =
    if (k > 0) k else autoK(emb.select(idCol).count())

  /** Near-duplicate pairs found within k-means cells. `probes` > 1 is the
    * multi-probe/soft-assignment variant: each vector participates in its
    * `probes` nearest cells, so pairs straddling a cell boundary are still
    * compared (replication factor `probes`, the standard recall lever).
    * `k ≤ 0` (the default) auto-scales the cell count with the corpus —
    * the published SemDeDup configuration — keeping per-cell work
    * bounded; pass an explicit k only for fixed-size corpora.
    * Output: (id_a, id_b, cos_sim). */
  def withinCellPairs(emb: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, k: Int = 0,
                      iters: Int = 3, probes: Int = 1): DataFrame = {
    val kEff = effectiveK(emb, idCol, k)
    val model = Ivf.fit(emb, vecCol, k = kEff, iters = iters, idCol = idCol)
    val assigned =
      if (probes <= 1 || model.centroids.isEmpty) model.assigned
      else {
        // p nearest cells via the native NearestCells expression (one
        // primitive loop over the packed centroid matrix per row). The
        // HOF alternative — k interpreted cosine lambdas + a k-struct
        // sort per row — is quadratic in corpus size once k ∝ n
        // (measured r12 at 100×: assignment dominated a 790 s run)
        emb.withColumn("cell",
          explode(graft.functions.VectorExpressions.nearest_cells(
            col(vecCol), model.centroids, math.min(probes, kEff))))
      }
    // Rows with a null id or null vector can never produce a pair
    // (null propagates to a non-match on every path), and the kernel's
    // primitive tuples must never see a null cell/id/vector — drop
    // them BEFORE the pair search. Fit/assignment above are unchanged,
    // so results on the surviving rows are identical either way.
    val cleaned = assigned
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
    // In-cell pair search. For kernel-able id types (integral, string,
    // binary — crawl-data UUIDs/URLs included) a per-cell PRIMITIVE
    // KERNEL: one shuffle clusters rows by cell, each cell buffers
    // (bounded ≈ probes × TargetCellSize) and an i<j double loop emits
    // ONLY matches — the self-join alternative materializes every
    // CANDIDATE as a joined row carrying two vectors (measured r12 at
    // 100× bench scale: ~230M candidates ≈ 130 GB of row traffic,
    // 385 s vs 55 s for this kernel).
    //
    // kernel parallelism = cell count, so use it only past the same
    // 64-cell mark where the auto-k regime starts (below it the join
    // spreads candidate evaluation over every core and wins)
    val idType = emb.schema(idCol).dataType
    val matches =
      if (kEff > 64) idType match {
        case StringType =>
          kernelPairs[String](cleaned, idCol, vecCol, StringType, threshold)
        case BinaryType =>
          kernelPairs[Array[Byte]](cleaned, idCol, vecCol, BinaryType,
            threshold)
        case ByteType | ShortType | IntegerType | LongType =>
          // integral ids run the kernel as Long, then cast back so the
          // OUTPUT id type always equals the input id type — the public
          // contract must not depend on which path the corpus size picks
          kernelPairs[Long](cleaned, idCol, vecCol, LongType, threshold)
            .select(col("id_a").cast(idType).as("id_a"),
              col("id_b").cast(idType).as("id_b"), col("cos_sim"))
        case _ => joinPairs(cleaned, idCol, vecCol, threshold)
      } else joinPairs(cleaned, idCol, vecCol, threshold)
    // a pair sharing several probed cells appears once per shared cell —
    // dedup AFTER the threshold filter, so the shuffle sees only actual
    // matches (tiny next to the candidate set); probes=1 cannot
    // duplicate, so it skips the shuffle entirely. Measured alternative
    // (r10): a min-common-probed-cell guard before the cosine removes
    // this shuffle but costs an array_intersect per CANDIDATE row, which
    // breaks whole-stage codegen and ran 1.6× slower.
    if (probes <= 1) matches else matches.distinct()
  }

  /** The per-cell primitive pair kernel, generic in the id type `I`
    * (Long for integral ids, String, Array[Byte] for binary — UUID or
    * URL ids carry through the kernel tuples untouched, no surrogate
    * mapping or extra join). The kernel emits candidate-order pairs;
    * canonical ordering (id_a < id_b) is applied DECLARATIVELY with
    * least/greatest afterwards, so the comparison semantics for every
    * id type are exactly the join path's (Spark's native ordering),
    * and equal-id degenerate pairs are dropped the same way. The
    * cosine accumulates in index order with double precision —
    * bit-identical to the codegen CosineSimilarity the exact twin
    * uses, so round-then-filter keeps precision exactly 1.0. */
  private def kernelPairs[I: TypeTag](assigned: DataFrame, idCol: String,
      vecCol: String, idSqlType: DataType, threshold: Double): DataFrame = {
    implicit val encIn: Encoder[(Int, I, Array[Float])] =
      Encoders.product[(Int, I, Array[Float])]
    implicit val encOut: Encoder[(I, I, Double)] =
      Encoders.product[(I, I, Double)]
    val th = threshold
    val raw = assigned
      .select(col("cell").cast(IntegerType).as("_1"),
        col(idCol).cast(idSqlType).as("_2"),
        col(vecCol).cast(ArrayType(FloatType)).as("_3"))
      .as[(Int, I, Array[Float])]
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"))
      .mapPartitions { it =>
        new Iterator[(I, I, Double)] {
          private val buf = scala.collection.mutable.ArrayBuffer
            .empty[(I, Array[Float])]
          private var curCell = Int.MinValue
          private var started = false
          private var out: Iterator[(I, I, Double)] = Iterator.empty
          private def pairsOf(
              rows: IndexedSeq[(I, Array[Float])]) = {
            val res = scala.collection.mutable.ArrayBuffer
              .empty[(I, I, Double)]
            var i = 0
            while (i < rows.length) {
              val (ia, va) = rows(i)
              var j = i + 1
              while (j < rows.length) {
                val (ib, vb) = rows(j)
                val n = math.min(va.length, vb.length)
                var dot = 0.0; var nx = 0.0; var ny = 0.0; var p = 0
                while (p < n) {
                  dot += va(p).toDouble * vb(p).toDouble
                  nx += va(p).toDouble * va(p).toDouble
                  ny += vb(p).toDouble * vb(p).toDouble
                  p += 1
                }
                val c = if (nx == 0.0 || ny == 0.0) 0.0
                        else dot / (math.sqrt(nx) * math.sqrt(ny))
                // pre-filter at threshold - 1ulp-slack; the exact
                // round-6 filter reapplies in Column land below
                if (c >= th - 1e-6) res += ((ia, ib, c))
                j += 1
              }
              i += 1
            }
            res.iterator
          }
          private def advance(): Unit = {
            while (!out.hasNext && it.hasNext) {
              val (cell, id, v) = it.next()
              if (!started || cell != curCell) {
                val done = buf.toIndexedSeq
                buf.clear()
                curCell = cell
                started = true
                buf += ((id, v))
                if (done.length > 1) out = pairsOf(done)
              } else buf += ((id, v))
            }
            if (!out.hasNext && !it.hasNext && buf.length > 1) {
              out = pairsOf(buf.toIndexedSeq)
              buf.clear()
            }
          }
          def hasNext: Boolean = { advance(); out.hasNext }
          def next(): (I, I, Double) = { advance(); out.next() }
        }
      }
      .toDF("a", "b", "cos_raw")
    raw
      .select(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"),
        round(col("cos_raw"), 6).as("cos_sim"))
      .filter(col("id_a") < col("id_b") && col("cos_sim") >= threshold)
  }

  /** The declarative same-cell self-join pair search — arbitrary id
    * types and the small-k regime (below ~64 cells the join spreads
    * candidate evaluation over every core and beats the kernel). */
  private def joinPairs(assigned: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    // the same-cell join consumes `assigned` TWICE, and Spark's
    // self-join deduplication re-aliases one side so neither scan nor
    // exchange reuse fires across the copies (the r17 Dedup finding) —
    // unpersisted, the corpus scan + cell assignment ran once per
    // side. Persist (tracked) so assignment computes once; at scale
    // this deletes a full corpus read per pair search.
    val once = graft.GraftSession.trackPersist(assigned)
    val a = once.select(col(idCol).as("id_a"),
      col(vecCol).as("va"), col("cell"))
    val b = once.select(col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("cell"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(cosine_sim(col("va"), col("vb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Full semantic dedup: keep one representative (min id) per connected
    * near-duplicate group. Output: (id, keep). */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, k: Int = 0,
                    iters: Int = 3, probes: Int = 1): DataFrame = {
    val pairs = withinCellPairs(emb, idCol, vecCol, threshold, k, iters,
      probes)
    val comps = graft.text.Dedup.connectedComponents(pairs, "id_a", "id_b")
    val drop = comps.filter(col("id") =!= col("component"))
      .select(col("id"))
    emb.select(col(idCol).as("id"))
      .join(drop.withColumn("d", lit(1)), Seq("id"), "left")
      .select(col("id"), col("d").isNull.as("keep"))
  }
}
