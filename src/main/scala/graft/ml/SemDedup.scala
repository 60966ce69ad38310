package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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

  /** Resolve auto-k (k ≤ 0): one column-pruned count (parquet footers
    * at scan time — negligible next to the pair search), clusters
    * proportional to corpus size. */
  private def effectiveK(emb: DataFrame, idCol: String, k: Int): Int =
    if (k > 0) k
    else math.min(65536L, math.max(8L,
      emb.select(idCol).count() / TargetCellSize)).toInt
    // capped at Ivf.fit's sample budget: centroids beyond the fit
    // sample are meaningless. Past the cap (≳16M vectors) cell size
    // grows again — shard the corpus (per-source/per-shard dedup
    // passes) or raise the fit sample; documented, not silent

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
        // p nearest cells by centroid cosine: ONE array-of-centroids
        // literal + an indexed transform (k struct literals would blow
        // past janino method-size limits at auto-k cell counts), then a
        // codegen'd sort of the k-element struct array — no extra scan
        val sims = transform(typedlit(model.centroids.toIndexedSeq),
          (c, i) => struct(cosine_sim(col(vecCol), c).as("s"),
            i.cast("int").as("cell")))
        emb.withColumn("cell",
            explode(slice(reverse(array_sort(sims)), 1,
              math.min(probes, kEff))))
          .withColumn("cell", col("cell.cell"))
      }
    // `assigned` is deliberately NOT persisted for the two join sides:
    // it is a deterministic narrow projection off the scan, so the two
    // evaluations agree by construction, and at 100 TB re-running a
    // codegen'd projection is far cheaper than caching the corpus
    // (the same persist-economy reasoning as the 2-pass rank's
    // shuffle-free regime).
    val a = assigned.select(col(idCol).as("id_a"),
      col(vecCol).as("va"), col("cell"))
    val b = assigned.select(col(idCol).as("id_b"),
      col(vecCol).as("vb"), col("cell"))
    val matches = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      // round-then-filter matches Similarity.exactCosinePairs, so the
      // verdict twin is a strict superset and precision is exactly 1.0
      .withColumn("cos_sim", round(cosine_sim(col("va"), col("vb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
    // a pair sharing several probed cells appears once per shared cell —
    // dedup AFTER the threshold filter, so the shuffle sees only actual
    // matches (tiny next to the candidate set); probes=1 cannot
    // duplicate, so it skips the shuffle entirely. Measured alternative
    // (r10): a min-common-probed-cell guard before the cosine removes
    // this shuffle but costs an array_intersect per CANDIDATE row, which
    // breaks whole-stage codegen and ran 1.6× slower — the replicated
    // codegen'd cosine is cheaper than a per-row set operation.
    if (probes <= 1) matches else matches.distinct()
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
