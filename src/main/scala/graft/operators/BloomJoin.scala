package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.graft.bridge

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
  * per-partition sketches) over `xxhash64(key)` — hashing to a long up
  * front gives every key type one code path and lets the probe side use
  * Catalyst's native [[BloomFilterMightContain]] predicate (the same
  * expression Spark's own injected runtime filters use), which stays
  * inside whole-stage codegen. A Scala-UDF probe would put a codegen
  * boundary + per-row boxing on the 100 TB side of the join; the native
  * predicate costs one hash and one bit-test per row.
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

  /** Native might-contain predicate over a driver-built filter: the
    * serialized filter rides into the plan as one BinaryType literal
    * (broadcast with the task closure), probed via codegen — no UDF. */
  private def mightContain(bf: org.apache.spark.util.sketch.BloomFilter,
                           keys: Seq[Column]): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bridge.column(BloomFilterMightContain(
      bridge.expression(lit(bos.toByteArray)),
      bridge.expression(xxhash64(keys: _*))))
  }

  /** Pre-filter `big` to rows whose (possibly compound) key might exist in
    * `small` — the building block the Pig-Latin `JOIN … USING 'bloom'`
    * frontend path uses; the caller then runs the ordinary join. Null keys
    * are dropped (they cannot match an equi-join). */
  def preFilter(big: DataFrame, bigKeys: Seq[Column],
                small: DataFrame, smallKeys: Seq[Column],
                expectedItems: Long = 1000000L,
                fpp: Double = 0.03): DataFrame = {
    val smallNonNull = small.filter(smallKeys.map(_.isNotNull).reduce(_ && _))
    val keyed = smallNonNull.select(xxhash64(smallKeys: _*).as("__bloom_key"))
    // an EMPTY build side would NPE inside stat.bloomFilter (the
    // aggregate yields null for zero rows) — and means no big row can
    // match the inner/semi join anyway
    if (keyed.isEmpty) big.filter(lit(false))
    else {
      val bf = keyed.stat.bloomFilter("__bloom_key", expectedItems, fpp)
      // Key-range envelope: min/max of each orderable build key become
      // PLAIN comparison predicates on the big side. The bloom's
      // mightContain evaluates after rows are read; a range predicate
      // pushes into the parquet scan (PushedFilters) and SKIPS row
      // groups whose stats fall outside — the index-seek analog for a
      // sorted/clustered big side (POMergeSparseJoin's "read only
      // matching right records"), and free extra pruning everywhere
      // else. One tiny agg job on the (small) build side pays for it.
      val orderable = smallNonNull.select(smallKeys: _*).schema.fields
        .map { f =>
          import org.apache.spark.sql.types._
          f.dataType match {
            case _: NumericType | StringType | DateType | TimestampType |
                 BooleanType | BinaryType => true
            case _ => false
          }
        }
      val envKeys = bigKeys.zip(smallKeys).zip(orderable.toSeq)
        .collect { case (pair, true) => pair }
      val rangePred =
        if (envKeys.isEmpty) lit(true)
        else {
          val aggs = envKeys.zipWithIndex.flatMap { case ((_, s), i) =>
            Seq(min(s).as(s"__lo$i"), max(s).as(s"__hi$i")) }
          val bounds = smallNonNull.agg(aggs.head, aggs.tail: _*).head()
          envKeys.zipWithIndex.map { case ((b, _), i) =>
            b >= lit(bounds.get(2 * i)) && b <= lit(bounds.get(2 * i + 1))
          }.reduce(_ && _)
        }
      big.filter(bigKeys.map(_.isNotNull).reduce(_ && _) && rangePred &&
        mightContain(bf, bigKeys))
    }
  }

  /** Bloom-pre-filtered equi-join, any key type (keys are xxhash64'd on
    * both sides, so build and probe agree for longs, strings, dates…).
    * Null big-side keys are dropped up front — they cannot match an
    * inner/semi join anyway, and skipping them keeps the probe null-free. */
  def join(big: DataFrame, small: DataFrame,
           bigKey: String, smallKey: String,
           expectedItems: Long = 1000000L, fpp: Double = 0.03,
           joinType: String = "inner"): DataFrame = {
    checkJoinType(joinType)
    // the join strategy is left to AQE: the bloom BUILD side is not
    // necessarily broadcast-sized (Pig's bloom join exists precisely
    // for small-but-not-replicable sides — BuildBloom ships a filter,
    // never the rows), so a genuinely small side broadcasts at runtime
    // from its REAL size and a large one stays a shuffle join; the
    // operator's contract is the pre-shuffle might_contain cut, not
    // the join strategy
    preFilter(big, Seq(col(bigKey)), small, Seq(col(smallKey)),
        expectedItems, fpp)
      .join(small, col(bigKey) === col(smallKey), joinType)
  }

  def joinLongKey(big: DataFrame, small: DataFrame,
                  bigKey: String, smallKey: String,
                  expectedItems: Long = 1000000L, fpp: Double = 0.03,
                  joinType: String = "inner"): DataFrame =
    join(big, small, bigKey, smallKey, expectedItems, fpp, joinType)

  def joinStringKey(big: DataFrame, small: DataFrame,
                    bigKey: String, smallKey: String,
                    expectedItems: Long = 1000000L, fpp: Double = 0.03,
                    joinType: String = "inner"): DataFrame =
    join(big, small, bigKey, smallKey, expectedItems, fpp, joinType)
}
