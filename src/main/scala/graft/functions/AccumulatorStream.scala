package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.pig.data.{BagFactory, TupleFactory}

/** Streaming execution for registered-jar Accumulator UDFs over
  * grouped bags (reference: Accumulator.java + POForEach's
  * accumulative mode): `FOREACH (GROUP a BY k) GENERATE Acc(a.x)`
  * feeds each group's rows through `accumulate()` in bounded chunks
  * and reads `getValue()` at group end — the group's bag is NEVER
  * materialized.
  *
  * Spark shape: one `groupByKey().mapGroups()` — a sort/hash-grouped
  * shuffle whose per-group ITERATOR drives the accumulator, the exact
  * reduce-side streaming the reference runs. Without this, a jar
  * Accumulator took the collect_list bag path: correct, but a
  * billion-row group holds the whole bag in one task's memory.
  * Algebraic UDFs fuse better (AlgebraicAgg partial-combines map-side
  * — try that first); this is the path for order-dependent or
  * non-combinable aggregates.
  */
object AccumulatorStream {

  /** Rows per accumulate() call — the reference batches likewise
    * (AccumulativeBag visits chunks, POPackage.getAccumulativeBatch). */
  private val ChunkSize = 1024

  final case class Call(jarInfo: Option[(String, String)], cls: String,
                        ctorArgs: Seq[String], outName: String)

  /** Resolution when `name` is a registered-jar EvalFunc implementing
    * Accumulator. */
  def accumulatorFor(registry: JarUdfs.Registry, name: String)
      : Option[(Option[(String, String)], String)] =
    JarUdfs.resolveClass(registry, name).flatMap { case (jar, ver, cls) =>
      try {
        val c = Class.forName(cls, false, JarUdfs.loaderFor(jar, ver))
        if (classOf[org.apache.pig.Accumulator[_]].isAssignableFrom(c) &&
            classOf[org.apache.pig.EvalFunc[_]].isAssignableFrom(c))
          Some((Some((jar, ver)), cls))
        else None
      } catch { case _: Throwable => None }
    }

  /** The declared result type of an accumulator UDF (its EvalFunc
    * outputSchema/generic — same rule as the scalar udf bridge). */
  def resultType(call: Call, argHint: Int): DataType =
    JarUdfs.returnTypeOf(
      JarUdfs.instantiateUserClass(call.jarInfo, call.cls, call.ctorArgs)
        .asInstanceOf[org.apache.pig.EvalFunc[_]], argHint)

  /** Build the streamed result: one row per group, columns
    * `group` + each call's outName. `calls` pair each accumulator
    * with its per-row argument columns and declared result type. */
  def fuse(input: DataFrame, key: Column, keyType: DataType,
           calls: Seq[(Call, Seq[Column], DataType)]): DataFrame = {
    val prep = input.select(
      (struct(key.as("k")).as("__gk") +:
        calls.zipWithIndex.map { case ((_, args, _), i) =>
          struct(args: _*).as(s"__in$i")
        }).toIndexedSeq: _*)
    val kSchema = prep.schema("__gk").dataType.asInstanceOf[StructType]
    val outSchema = StructType(
      StructField("group", keyType) +:
        calls.map { case (c, _, dt) => StructField(c.outName, dt) })
    val callMeta = calls.map { case (c, _, dt) => (c, dt) }
    prep.groupByKey((r: Row) => r.getStruct(0))(Encoders.row(kSchema))
      .mapGroups { (k: Row, it: Iterator[Row]) =>
        val tf = TupleFactory.getInstance()
        // fresh instances per group (the reference reuses one instance
        // with cleanup() between groups — equivalent state lifecycle)
        val accs = callMeta.map { case (c, _) =>
          JarUdfs.instantiateUserClass(c.jarInfo, c.cls, c.ctorArgs)
            .asInstanceOf[org.apache.pig.Accumulator[AnyRef]]
        }
        it.grouped(ChunkSize).foreach { chunk =>
          accs.zipWithIndex.foreach { case (acc, i) =>
            val bag = BagFactory.getInstance().newDefaultBag()
            chunk.foreach { row =>
              val s = row.getStruct(i + 1)
              bag.add(tf.newTuple(s.toSeq.map(v =>
                JarUdfs.toPig(v.asInstanceOf[AnyRef])).asJava))
            }
            acc.accumulate(tf.newTuple(bag))
          }
        }
        val vals = callMeta.zip(accs).map { case ((_, dt), acc) =>
          JarUdfs.coerce(acc.getValue.asInstanceOf[AnyRef], dt)
        }
        Row((k.toSeq ++ vals): _*)
      }(Encoders.row(outSchema))
  }
}
