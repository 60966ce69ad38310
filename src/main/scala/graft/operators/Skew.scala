package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation, the explicit counterpart of Pig's skewed join
  * (POSkewedJoin + POPoissonSample + PartitionSkewedKeys — reference
  * §2.2): AQE's skew-join handling covers sort-merge joins for free
  * (enabled in GraftSession); these helpers cover the cases AQE cannot
  * re-plan at runtime:
  *
  *  - [[saltedAggregate]]: a hot GROUP key that floods one reducer —
  *    two-phase agg (key+salt partial, then key final). Works for any
  *    algebraic aggregate (sum/count/min/max — Pig's Algebraic contract).
  *  - [[saltedJoin]]: a hot join key against a medium right side that is
  *    too big to broadcast — left gets a deterministic-per-row salt,
  *    right is replicated numSalts×.
  */
object Skew {

  /** Two-phase salted aggregation. `aggs` maps output name → (partial,
    * merge) pair, e.g. "n" -> (count(lit(1)), sum). The salt spreads one
    * hot key over numSalts reducers in phase 1; phase 2 merges the
    * numSalts partials — input rows cross the shuffle pre-aggregated.
    *
    * Salt derivation uses `monotonically_increasing_id`, which is
    * NONDETERMINISTIC under task retry — deliberately fine: the salt only
    * picks WHICH phase-1 reducer a row lands on, never the result (q77's
    * identity oracle pins that). Do not "fix" it to a deterministic id;
    * nothing may ever depend on a row's salt value. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], numSalts: Int,
                      aggs: Seq[(String, Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._2.as(s"__p_${aggs.head._1}"),
           aggs.tail.map { case (n, p, _) => p.as(s"__p_$n") }: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(aggs.head._3(col(s"__p_${aggs.head._1}")).as(aggs.head._1),
           aggs.tail.map { case (n, _, m) => m(col(s"__p_$n")).as(n) }: _*)
  }

  /** Salted equi-join: left rows get salt ∈ [0, numSalts), right rows are
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a single hot key now lands on numSalts reducers.
    * Right-side replication costs numSalts× its size: use only when the
    * right side is too large to broadcast but much smaller than the left
    * (Pig's skewed join makes the same trade, PartitionSkewedKeys). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 numSalts: Int, joinType: String = "inner"): DataFrame = {
    // right_outer/full would emit numSalts copies of every unmatched
    // RIGHT row (it is replicated); left-preserving types are sound
    // because only the left side carries a single salt per row
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports left-preserving join types only (got $joinType)")
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(numSalts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Top-N hot keys by frequency — the sampling step of Pig's skewed join
    * (POPoissonSample), exposed for diagnostics / pre-partition planning. */
  def hotKeys(df: DataFrame, keys: Seq[String], topN: Int = 20,
              sampleFraction: Double = 0.01): DataFrame =
    df.sample(sampleFraction, 42L)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("approx_n"))
      .orderBy(col("approx_n").desc)
      .limit(topN)
}
