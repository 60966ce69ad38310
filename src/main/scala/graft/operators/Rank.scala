package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable RANK — the reference's 2-pass design (POCounter counts rows per
  * task, PORank adds cumulative offsets; PORank.java:145-157) re-expressed
  * on Spark. A naive `row_number().over(Window.orderBy(..))` collapses to a
  * SINGLE partition — fatal at 100 TB. Here:
  *
  *  - pass 1: count rows per partition (cheap, no shuffle of data rows);
  *  - pass 2: add the per-partition cumulative offset to a local index.
  *
  * For RANK BY (ties share a rank) we first range-partition + sort by the
  * rank keys so partition boundaries respect the global order, then compute
  * per-partition dense indices and fix ties spanning boundaries with the
  * per-partition key-boundary metadata.
  */
object Rank {

  /** 1-based global row number in the DataFrame's current order, without a
    * global 1-partition window. Uses RDD zipWithIndex (count pass + offset
    * pass — exactly Pig's POCounter/PORank split). */
  def rowNumber(df: DataFrame, rankName: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(StructField(rankName, LongType, nullable = false)
      +: df.schema.fields)
    val rows = df.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq((i + 1L) +: r.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }

  /** RANK BY keys at scale, with per-key sort direction (asc = true).
    *
    * Non-dense: range-repartition by the sort keys (sampled global ranges,
    * same idea as Pig's quantile job), sort within partitions, assign row
    * numbers via the 2-pass trick, then `min(rowNumber)` over a window
    * PARTITIONED by the key — the window is distributed across the key
    * domain, never a single-partition stage.
    *
    * Dense: rank the DISTINCT keys (a domain-sized relation, tiny relative
    * to the rows) with the same 2-pass trick and join back NULL-SAFELY —
    * a plain equi-join would silently drop every null-key row.
    *
    * Key expressions are materialized as temp columns first so computed
    * keys (frontend `RANK r BY f(x)`) work unchanged.
    *
    * Skew caveat (non-dense): `min(__rn) over (partition by keys)` makes
    * each distinct key value one window partition — a single very hot key
    * concentrates its rows on one task. RANK BY keys are high-cardinality
    * in practice (that's what ranking is for); if a low-cardinality ranking
    * ever matters, the dense path's distinct-key join shape is the fix. */
  def rankBy(df: DataFrame, keys: Seq[(Column, Boolean)], dense: Boolean,
             rankName: String = "rank", partitions: Int = 0): DataFrame = {
    val names = keys.indices.map(i => s"__rk$i")
    val withKeys = keys.zip(names).foldLeft(df) {
      case (d, ((c, _), n)) => d.withColumn(n, c)
    }
    // Spark default null placement (asc → nulls first, desc → nulls last)
    // matches the window rank()/dense_rank() this replaces.
    val sortCols = keys.zip(names).map { case ((_, asc), n) =>
      if (asc) col(n).asc else col(n).desc
    }
    val bare = names.map(col)
    val parts = if (partitions > 0) partitions
                else df.sparkSession.sessionState.conf.numShufflePartitions
    if (dense) {
      val distinctKeys = withKeys.select(bare: _*).distinct()
      val keyRanks = rowNumber(
        distinctKeys.repartitionByRange(parts, sortCols: _*)
          .sortWithinPartitions(sortCols: _*), "__kr")
      val cond = names.map(n => withKeys(n) <=> keyRanks(n)).reduce(_ && _)
      withKeys.join(keyRanks, cond)
        .select((df.columns.map(withKeys(_)) :+ col("__kr").as(rankName))
          .toIndexedSeq: _*)
    } else {
      val sorted = withKeys.repartitionByRange(parts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
      val numbered = rowNumber(sorted, "__rn")
      val w = Window.partitionBy(bare: _*)
      numbered.withColumn(rankName, min(col("__rn")).over(w))
        .select((df.columns :+ rankName).map(col).toIndexedSeq: _*)
    }
  }
}
