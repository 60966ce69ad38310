package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pig's bloom join (reference: BuildBloom/Bloom UDF pair,
  * P/builtin/BuildBloom.java:54 + Tez POBuildBloomRearrangeTez) made
  * explicit: build a bloom filter over the small side's key, pre-filter
  * the big side BEFORE its shuffle. Catalyst's runtime bloom filter
  * (enabled in GraftSession) does this automatically when its size
  * thresholds and statistics line up; the explicit form guarantees the
  * pre-filter regardless — e.g. when the big side feeds other operators
  * first and Catalyst won't inject the filter.
  *
  * The filter is built distributed (`stat.bloomFilter` aggregates
  * per-partition sketches) and broadcast by value; the big side's scan
  * then drops non-candidates at the source, so only candidate rows pay
  * the shuffle — the whole point at 100 TB.
  */
object BloomJoin {

  /** Join types for which dropping non-candidate BIG rows pre-join is
    * semantics-preserving: the join would drop them anyway. Outer/anti
    * variants must keep (or exactly consist of) unmatched big rows, so a
    * bloom pre-filter would corrupt them. */
  private val safeJoinTypes = Set("inner", "leftsemi", "left_semi", "cross")
  private def checkJoinType(joinType: String): Unit =
    require(safeJoinTypes.contains(joinType.toLowerCase),
      s"bloom pre-filter is only sound for ${safeJoinTypes.mkString("/")} " +
      s"joins (got $joinType) — unmatched big-side rows must survive " +
      "outer/anti joins")

  def joinLongKey(big: DataFrame, small: DataFrame,
                  bigKey: String, smallKey: String,
                  expectedItems: Long = 1000000L, fpp: Double = 0.03,
                  joinType: String = "inner"): DataFrame = {
    checkJoinType(joinType)
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    big.filter(mightContain(col(bigKey)))
      .join(small, col(bigKey) === col(smallKey), joinType)
  }

  def joinStringKey(big: DataFrame, small: DataFrame,
                    bigKey: String, smallKey: String,
                    expectedItems: Long = 1000000L, fpp: Double = 0.03,
                    joinType: String = "inner"): DataFrame = {
    checkJoinType(joinType)
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: String) =>
      k != null && bc.value.mightContainString(k))
    big.filter(mightContain(col(bigKey)))
      .join(small, col(bigKey) === col(smallKey), joinType)
  }
}
