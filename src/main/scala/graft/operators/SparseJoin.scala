package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The merge-sparse join's right-side pre-filter (reference:
  * POMergeSparseJoin via IndexableLoadFunc — "read only the right
  * records whose key appears on the left").
  *
  * Two regimes, picked at runtime by probe-side key count:
  *  - SEEK (≤ `graft.sparsejoin.maxKeys` distinct probe keys, default
  *    10k; 0 disables): collect the keys (ONE bounded collect — limit
  *    before collect) and push them into the indexed side's scan as an
  *    In/InSet predicate. That lands in the parquet reader's
  *    PushedFilters, so row groups whose [min, max] excludes every key
  *    are skipped without being read — the closest Spark analog of the
  *    reference's per-key index seek (records vs row groups).
  *  - BLOOM (above the threshold): the [[BloomJoin]] key-filter form —
  *    same result, post-scan probe at scan speed, no driver state.
  *
  * Either way the filter only ever REMOVES non-matching right rows, so
  * it composes with any inner join downstream.
  */
object SparseJoin {

  def keyPreFilter(indexed: DataFrame, indexedKeys: Seq[Column],
                   probe: DataFrame, probeKeys: Seq[Column]): DataFrame = {
    // clamp instead of .toInt (which would WRAP a >2^31 conf to a tiny
    // or negative threshold and silently flip the regime); negatives
    // mean "disable seek" like 0
    val maxKeys = math.min(
      math.max(graft.GraftSession.longConf(indexed.sparkSession,
        "graft.sparsejoin.maxKeys", 10000L), 0L),
      Int.MaxValue - 1L).toInt
    // null probe keys never match an inner join — drop before collect
    val rows =
      if (maxKeys <= 0) null
      else probe.select(probeKeys: _*).na.drop().distinct()
        .limit(maxKeys + 1).collect()
    if (rows != null && rows.length <= maxKeys)
      indexedKeys.zipWithIndex.foldLeft(indexed) { case (d, (k, i)) =>
        val vals = rows.map(_.get(i)).distinct.toSeq
        if (vals.isEmpty) d.filter(lit(false))
        else d.filter(k.isInCollection(vals))
      }
    else
      BloomJoin.preFilter(indexed, indexedKeys, probe, probeKeys)
  }
}
