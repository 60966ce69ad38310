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
  * accumulate() receives the SAME tuple shape exec would: one field
  * per call argument, bag-projected args as (chunk-sized) bags of
  * 1-field tuples and literal args verbatim — `Acc(a.x, '|')` sees
  * `tuple(bag_x, "|")` exactly like the bag path.
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

  /** One accumulate() argument: a bag-projected column (index into
    * the call's projected struct) or a literal passed verbatim. */
  sealed trait Arg extends Serializable
  final case class BagArg(idx: Int) extends Arg
  final case class LitArg(value: Any) extends Arg

  final case class Call(jarInfo: Option[(String, String)], cls: String,
                        ctorArgs: Seq[String], outName: String,
                        args: Seq[Arg], sig: String,
                        udfCtx: java.util.HashMap[String, java.util.Properties])

  /** Resolution when `name` is a registered-jar EvalFunc implementing
    * Accumulator. */
  def accumulatorFor(registry: JarUdfs.Registry, name: String)
      : Option[(Option[(String, String)], String)] =
    JarUdfs.resolveImplementing(registry, name,
      classOf[org.apache.pig.Accumulator[_]])

  /** The declared result type of an accumulator UDF — outputSchema
    * first (fed the call's input schema, like the scalar bridge),
    * else the EvalFunc generic. */
  def resultType(call: Call, argHint: Int,
                 inputSchema: Option[org.apache.pig.impl.logicalLayer.schema.Schema])
      : DataType =
    JarUdfs.returnTypeOf(
      JarUdfs.instantiateUserClass(call.jarInfo, call.cls, call.ctorArgs)
        .asInstanceOf[org.apache.pig.EvalFunc[_]], argHint, inputSchema)

  /** groupByKey compares the ENCODED key bytes, unlike DataFrame
    * groupBy whose hash aggregation normalizes floats first
    * (NormalizeFloatingNumbers): without this, -0.0/0.0 and NaN
    * payload variants would form separate groups on this path only.
    * `x + 0.0` folds -0.0 into +0.0; nanvl canonicalizes NaN bits.
    * Recurses into struct (tuple) keys; matches what the bag and
    * fused-Algebraic paths emit for the group value. */
  private def canonKey(c: Column, dt: DataType): Column = dt match {
    case DoubleType => nanvl(c + lit(0.0d), lit(Double.NaN))
    case FloatType  => nanvl(c + lit(0.0f), lit(Float.NaN)).cast(FloatType)
    case st: StructType =>
      when(c.isNull, lit(null).cast(st)).otherwise(struct(
        st.fields.toIndexedSeq.map(f =>
          canonKey(c.getField(f.name), f.dataType).as(f.name)): _*))
    case _ => c
  }

  /** Build the streamed result: one row per group, columns
    * `group` + each call's outName. Each call's projected struct
    * carries only its BAG-projected arg columns, in BagArg order. */
  def fuse(input: DataFrame, key: Column, keyType: DataType,
           calls: Seq[(Call, Seq[Column], DataType)]): DataFrame = {
    val prep = input.select(
      (struct(canonKey(key, keyType).as("k")).as("__gk") +:
        calls.zipWithIndex.map { case ((_, cols, _), i) =>
          // a call may have zero bag args only in theory (the
          // interpreter requires one) — struct() needs a field
          (if (cols.nonEmpty) struct(cols: _*) else struct(lit(0)))
            .as(s"__in$i")
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
          JarUdfs.newContextualInstance(c.jarInfo, c.cls, c.ctorArgs,
            c.sig, c.udfCtx)
            .asInstanceOf[org.apache.pig.Accumulator[AnyRef]]
        }
        // TerminatingAccumulator (reference: accumulative POForEach's
        // early exit): once a call reports isFinished, stop feeding it;
        // once EVERY call is finished, stop pulling the group's rows
        // entirely — mapGroups tolerates an unconsumed iterator.
        val term = accs.map {
          case t: org.apache.pig.TerminatingAccumulator[_] => t
          case _ => null
        }
        def finished(i: Int): Boolean = term(i) != null && term(i).isFinished
        try {
          val chunks = it.grouped(ChunkSize)
          var allFinished = accs.indices.forall(finished)
          while (!allFinished && chunks.hasNext) {
            val chunk = chunks.next()
            accs.zipWithIndex.foreach { case (acc, i) =>
              if (!finished(i)) {
                val c = callMeta(i)._1
                // per-arg bags: bag args each get a bag of 1-field
                // tuples from this chunk, literals pass verbatim (the
                // exec shape)
                val bags = c.args.collect { case BagArg(_) =>
                  BagFactory.getInstance().newDefaultBag()
                }
                chunk.foreach { row =>
                  val s = row.getStruct(i + 1)
                  var bi = 0
                  c.args.foreach {
                    case BagArg(idx) =>
                      bags(bi).add(tf.newTuple(
                        JarUdfs.toPig(s.get(idx).asInstanceOf[AnyRef])))
                      bi += 1
                    case _: LitArg => ()
                  }
                }
                var bi = 0
                val fields = c.args.map {
                  case BagArg(_) => val b = bags(bi); bi += 1; b
                  case LitArg(v) => JarUdfs.toPig(v.asInstanceOf[AnyRef])
                }
                acc.accumulate(tf.newTuple(fields.asJava))
              }
            }
            allFinished = accs.indices.forall(finished)
          }
          val vals = callMeta.zip(accs).map { case ((_, dt), acc) =>
            JarUdfs.coerce(acc.getValue.asInstanceOf[AnyRef], dt)
          }
          Row((k.toSeq ++ vals): _*)
        } finally {
          // reference lifecycle (cleanup after getValue) — and the
          // abandonment path: on a mid-group failure/kill, cleanup
          // closes any in-flight IteratingAccumulator worker so its
          // thread drains and exits instead of polling forever
          accs.foreach(a => try a.cleanup()
            catch { case _: Exception => () })
        }
      }(Encoders.row(outSchema))
  }
}
