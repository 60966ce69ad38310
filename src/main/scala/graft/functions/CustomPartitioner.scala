package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import org.apache.pig.impl.io.PigNullableWritable

/** `PARTITION BY customPartitionerClass` (reference: QueryParser.g
  * partition_clause + MapReducePartitionerWrapper.java:40): the user
  * supplies a Hadoop `Partitioner<PigNullableWritable, Writable>` and
  * Pig routes the operator's shuffle through it. DataFrame operators
  * cannot inject a partitioner into their own exchange, so this is the
  * closest faithful re-expression: the operator computes as usual and
  * its RESULT is then explicitly redistributed so that each row lands
  * in exactly the partition `getPartition(key, null, n)` names — the
  * observable contract (which reducer/output file holds which key,
  * e.g. all-evens-to-partition-0 routing) holds for STORE and every
  * mapPartitions-shaped consumer downstream.
  *
  * Scale shape: one extra round-trip through an RDD exchange keyed by
  * the user's partition id — the same single shuffle the reference
  * pays, just placed after the aggregation instead of fused into it
  * (so the grouping itself still partial-aggregates map-side, which
  * the reference FORFEITS when a custom partitioner is set: PIG-4565
  * disables the combiner there). The partitioner class ships to
  * executors via the registered jar (SparkContext.addJar) and is
  * instantiated lazily per executor thread, like jar EvalFuncs.
  */
object CustomPartitioner {

  /** Route `df` so each row lands in the partition the user class picks
    * for `key`. `n` is the reducer count (`PARALLEL n`, else the
    * session's shuffle-partition default — the reference's
    * default_parallel). */
  def repartitionBy(df: DataFrame, key: Column, clsName: String, n: Int,
                    registry: JarUdfs.Registry): DataFrame = {
    require(n > 0, s"PARTITION BY $clsName: parallelism must be > 0")
    val inv = Invoker(JarUdfs.resolveClass(registry, clsName)
      .map { case (jar, ver, cls) => (Some((jar, ver)), cls) }
      .getOrElse((None, clsName)))
    inv.newInstance() // fail at plan time if the class is missing/wrong
    val spark = df.sparkSession
    val schema = df.schema
    val keyed = df.withColumn("__graft_pkey", key)
    val ki = keyed.schema.fieldIndex("__graft_pkey")
    val width = schema.length
    val rdd = keyed.rdd
      .map(row => (inv.partitionFor(row.get(ki), n), row))
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = n
        def getPartition(k: Any): Int = k.asInstanceOf[Int]
      })
      .map { case (_, row) => Row(row.toSeq.take(width): _*) }
    spark.createDataFrame(rdd, schema)
  }

  /** Serializable bridge mirroring JarUdfs.Invoker: carries only the
    * jar identity + class name; resolves and instantiates one
    * partitioner per executor thread (user partitioners may keep
    * per-instance state, e.g. round-robin alternation maps). */
  private final case class Invoker(src: (Option[(String, String)], String)) {
    @transient private lazy val local: ThreadLocal[(AnyRef, java.lang.reflect.Method)] =
      ThreadLocal.withInitial(() => newInstance())

    private[CustomPartitioner] def newInstance(): (AnyRef, java.lang.reflect.Method) = {
      val (jarInfo, cls) = src
      val inst = JarUdfs.instantiateUserClass(jarInfo, cls, Seq.empty)
      val m = inst.getClass.getMethods.find(m =>
          m.getName == "getPartition" && m.getParameterCount == 3)
        .getOrElse(throw new IllegalArgumentException(
          s"PARTITION BY $cls: no getPartition(key, value, n) — the " +
          "class must extend org.apache.hadoop.mapreduce.Partitioner"))
      (inst, m)
    }

    def partitionFor(rawKey: Any, n: Int): Int = {
      val (inst, m) = local.get()
      val pigKey = JarUdfs.toPig(rawKey.asInstanceOf[AnyRef])
      val key = new PigNullableWritable {
        override def getValueAsPigType: AnyRef = pigKey
      }
      key.setNull(pigKey == null)
      val pid = m.invoke(inst, key, null,
        Int.box(n)).asInstanceOf[java.lang.Integer].intValue
      // the MR shuffle rejects out-of-range ids ("Illegal partition");
      // silently wrapping would scatter keys the user meant to pin
      if (pid < 0 || pid >= n) throw new IllegalStateException(
        s"Illegal partition for $pigKey ($pid not in [0, $n))")
      pid
    }
  }
}
