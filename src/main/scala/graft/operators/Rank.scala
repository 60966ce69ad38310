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
  * For RANK BY (ties share a rank) both variants work on the DISTINCT-key
  * relation in key order — dense ranks are the key's 2-pass row number,
  * non-dense ranks the exclusive prefix sum of per-key counts — and join
  * back to the rows null-safely.
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
    * BOTH variants rank the DISTINCT keys (a domain-sized relation, tiny
    * relative to the rows) and join back NULL-SAFELY — a plain equi-join
    * would silently drop every null-key row:
    *
    *  - dense: 1-based row number of the key in key order (2-pass
    *    zipWithIndex, no single-partition stage);
    *  - non-dense (competition rank): 1 + the exclusive prefix sum of
    *    per-key row COUNTS in key order — equal to `min(row_number)` per
    *    key without ever windowing BY the key, so a single very hot key
    *    never concentrates its rows on one task. The prefix sum uses the
    *    same 2-pass shape (per-partition totals → broadcast offsets).
    *
    * Rows never shuffle when the key domain broadcasts; when the domain
    * is too big to broadcast it is high-cardinality, which is exactly the
    * case where a shuffle join on the key has no hot key.
    *
    * Key expressions are materialized as temp columns first so computed
    * keys (frontend `RANK r BY f(x)`) work unchanged. */
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
      val counts = withKeys.groupBy(bare: _*).agg(count(lit(1)).as("__cnt"))
      val sortedKeys = counts.repartitionByRange(parts, sortCols: _*)
        .sortWithinPartitions(sortCols: _*)
      val keyRanks = withExclusivePrefixSum(sortedKeys, "__cnt", "__off")
        .select((names.map(col) :+ (col("__off") + 1L).as("__kr"))
          .toIndexedSeq: _*)
      val cond = names.map(n => withKeys(n) <=> keyRanks(n)).reduce(_ && _)
      withKeys.join(keyRanks, cond)
        .select((df.columns.map(withKeys(_)) :+ col("__kr").as(rankName))
          .toIndexedSeq: _*)
    }
  }

  /** Exclusive running sum of a non-null long column in the DataFrame's
    * current order — the 2-pass POCounter/PORank shape: per-partition
    * totals (one cheap pass), then each partition streams with its
    * broadcast starting offset. Never a single-partition stage. */
  private def withExclusivePrefixSum(df: DataFrame, valueCol: String,
                                     outCol: String): DataFrame = {
    val spark = df.sparkSession
    val idx = df.schema.fieldIndex(valueCol)
    val rdd = df.rdd
    val sums = rdd.mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(idx)); Iterator((i, s))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(sums.scanLeft(0L)(_ + _))
    val schema = StructType(df.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val rows = rdd.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets.value(i)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc); acc += r.getLong(idx); out
      }
    }
    spark.createDataFrame(rows, schema)
  }
}
