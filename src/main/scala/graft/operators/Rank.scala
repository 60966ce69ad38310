package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

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
    * global 1-partition window — the POCounter/PORank split kept entirely
    * in Catalyst (no `df.rdd` serde round-trip):
    *
    *  - `monotonically_increasing_id()` IS Pig's per-task counter: its
    *    documented encoding is `partitionId << 33 | localRowIndex`, so
    *    subtracting the shifted partition id recovers the local index;
    *  - per-partition row counts aggregate to a numPartitions-sized frame
    *    whose cumulative offsets broadcast-join back on partition id
    *    (PORank's cumulative-offset side input).
    *
    * The count job and the final join are separate actions, so each
    * re-executes the input; the two executions MUST agree on
    * partitioning and intra-partition row order or the offsets silently
    * corrupt. Two regimes:
    *
    *  - SHUFFLE-FREE deterministic input (rank straight off a
    *    load/filter/project — the dominant case): file splits and
    *    in-split order are stable across jobs and AQE has no shuffle
    *    to re-plan, so the passes agree by construction. NO persist —
    *    at 100 TB this is the difference between caching the table and
    *    caching nothing — and the count pass runs on a pid-only
    *    projection, so column pruning keeps its scan minimal.
    *  - anything shuffle-rooted or nondeterministic: the pid-stamped
    *    frame is PERSISTED before the two passes (shuffle output order
    *    races mapper completion; range sampling + AQE can re-plan).
    *    The reference has the same structural requirement (POCounter's
    *    output is materialized to HDFS before PORank reads it); a
    *    tracked persist is the cheaper Spark equivalent. */
  def rowNumber(df: DataFrame, rankName: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    val stamped = df
      .withColumn("__rn_mid", monotonically_increasing_id())
      .withColumn("__rn_pid", spark_partition_id())
    val withPid =
      if (deterministicNarrow(df)) stamped
      else graft.GraftSession.trackPersist(stamped)
    // numPartitions (pid, count) rows to the driver — the reference's
    // POCounter side channel; NOT a data collect
    val counts = withPid.select(col("__rn_pid")).groupBy(col("__rn_pid"))
      .agg(count(lit(1)).as("__rn_cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = counts.map { case (p, c) => val o = (p, acc); acc += c; o }
    val offsets = spark.createDataFrame(offs.toSeq)
      .toDF("__rn_pid", "__rn_off")
    val local = col("__rn_mid") - shiftleft(col("__rn_pid").cast(LongType), 33)
    withPid.join(broadcast(offsets), "__rn_pid")
      .withColumn(rankName, col("__rn_off") + local + 1L)
      .select((rankName +: df.columns.toSeq).map(col): _*)
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

  /** True when re-executing `df` is guaranteed to reproduce the same
    * partitioning and intra-partition row order: the physical plan has
    * no shuffle (file splits are stable, AQE only re-plans at shuffle
    * boundaries) and no nondeterministic expressions. Checked on the
    * pre-adaptive plan — with no exchange there is nothing adaptive
    * execution can change. */
  private def deterministicNarrow(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = df.queryExecution.sparkPlan
    val shuffleFree =
      plan.collectFirst { case s: ShuffleExchangeLike => s }.isEmpty
    def allDeterministic = plan.find(p =>
      p.expressions.exists(e => !e.deterministic)).isEmpty
    // a cached frame is stable too: InMemoryTableScan replays the
    // materialized partitions
    shuffleFree && allDeterministic
  }

  /** Exclusive running sum of a non-null long column in the DataFrame's
    * current order — the 2-pass POCounter/PORank shape, Catalyst-native:
    * per-partition totals → cumulative offsets (numPartitions rows) →
    * broadcast join back on partition id + an intra-partition running
    * sum windowed BY partition id in original row order. Never a
    * single-partition stage over the data; the pid-window's exchange
    * moves only this domain-sized frame. */
  private def withExclusivePrefixSum(df: DataFrame, valueCol: String,
                                     outCol: String): DataFrame = {
    val spark = df.sparkSession
    // persisted for the same two-pass partitioning consistency as
    // rowNumber (this frame is domain-sized — cheap to cache)
    val withPid = graft.GraftSession.trackPersist(df
      .withColumn("__ps_mid", monotonically_increasing_id())
      .withColumn("__ps_pid", spark_partition_id()))
    val sums = withPid.groupBy(col("__ps_pid"))
      .agg(sum(col(valueCol)).as("__ps_sum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offs = sums.map { case (p, s) => val o = (p, acc); acc += s; o }
    val offsets = spark.createDataFrame(offs.toSeq)
      .toDF("__ps_pid", "__ps_off")
    // intra-partition running sum: windowed BY partition id in original
    // row order — hash exchange of this domain-sized frame only, never
    // a single-partition stage
    val local = Window.partitionBy(col("__ps_pid")).orderBy(col("__ps_mid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withPid.join(broadcast(offsets), "__ps_pid")
      .withColumn(outCol,
        col("__ps_off") + coalesce(sum(col(valueCol)).over(local), lit(0L)))
      .select((df.columns.toSeq :+ outCol).map(col): _*)
  }
}
