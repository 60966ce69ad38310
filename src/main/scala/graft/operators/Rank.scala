package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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

  /** RANK BY keys at scale: range-repartition by the keys (sampled global
    * ranges, same idea as Pig's quantile job), sort within partitions,
    * assign row numbers via the 2-pass trick, then convert row numbers to
    * rank/dense-rank semantics with a window PARTITIONED by the key (each
    * key's rows are co-located after the range partition, so the window is
    * distributed — no single-partition stage). */
  def rankBy(df: DataFrame, keys: Seq[String], dense: Boolean,
             rankName: String = "rank", partitions: Int = 0): DataFrame = {
    val keyCols = keys.map(col)
    val parts = if (partitions > 0) partitions
                else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
    val numbered = rowNumber(sorted, "__rn")
    val w = Window.partitionBy(keyCols: _*)
    val ranked =
      if (dense) {
        // dense rank: rank distinct keys globally (distinct keys are small
        // relative to rows; this shuffle is on the key domain only). The
        // join back must be NULL-SAFE — a plain equi-join would silently
        // drop every null-key row — and goes against the un-numbered df
        // (the 2-pass row numbers aren't needed for dense).
        val distinctKeys = df.select(keyCols: _*).distinct()
        val keyRanks = rowNumber(
          distinctKeys.repartitionByRange(parts, keyCols: _*)
            .sortWithinPartitions(keyCols: _*), rankName)
        val cond = keys.map(k => df(k) <=> keyRanks(k)).reduce(_ && _)
        df.join(keyRanks.withColumnRenamed(rankName, "__kr"), cond)
          .select((df.columns.map(df(_)) :+ col("__kr").as(rankName))
            .toIndexedSeq: _*)
      } else {
        numbered.withColumn(rankName, min(col("__rn")).over(w)).drop("__rn")
      }
    ranked
  }
}
