package graft.functions

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{struct, udaf}
import org.apache.spark.sql.types._

import org.apache.pig.{Algebraic, EvalFunc}
import org.apache.pig.data.{BagFactory, Tuple, TupleFactory}

/** Distributed partial aggregation for registered-jar UDFs that
  * implement `Algebraic` (reference: Algebraic.java +
  * CombinerOptimizerUtil.java:89 — the combiner). A FOREACH over a
  * grouped alias calling such a UDF on the bag fuses to a Spark
  * `Aggregator`:
  *
  *   - reduce: the user's Initial EvalFunc per input row,
  *   - buffer compaction + merge: the Intermed EvalFunc over bags of
  *     partials (the combiner step — may run any number of times, the
  *     same contract MR combiners impose),
  *   - finish: the Final EvalFunc.
  *
  * The grouped bag is never materialized and partials combine
  * map-side before the shuffle — the 100 TB shape. Without this, a
  * user aggregate over a billion-row group would collect the whole
  * group into one bag (the non-Algebraic exec path, which remains the
  * fallback for plain EvalFuncs).
  *
  * Any result type fuses (r11): scalars ride primitive encoders;
  * tuple/bag/map/datetime/decimal Finals ride a 1-field struct row
  * unwrapped after the aggregate — the reference's combiner likewise
  * fuses regardless of result type (CombinerOptimizerUtil.java:89).
  */
object AlgebraicAgg {

  /** Max pending Initial outputs before an Intermed compaction — keeps
    * the buffer bounded regardless of group size. */
  private val CompactAt = 4096

  /** The aggregate Column for `name(args…)` over the grouped input, or
    * None when the name doesn't resolve to an Algebraic EvalFunc —
    * or when the plan-time probe fails for any
    * reason (inner classes without the ctor shape, outputSchema
    * needing real fields, ...): the bag path is always correct, so a
    * fusion problem must DECLINE, never crash the query. `argTypes`
    * are the Catalyst types of the rewritten per-row argument columns;
    * `inputSchema` feeds the Final func's outputSchema like the scalar
    * bridge. */
  def columnFor(registry: JarUdfs.Registry, name: String,
                ctorArgs: Seq[String], args: Seq[Column],
                argTypes: Seq[DataType],
                inputSchema: Option[org.apache.pig.impl.logicalLayer.schema.Schema] = None)
      : Option[Column] = try {
    val hit = JarUdfs.resolveImplementing(registry, name,
      classOf[Algebraic])
    hit.flatMap { case (jarInfo, cls) =>
      val alg = JarUdfs.instantiateUserClass(jarInfo, cls, ctorArgs)
        .asInstanceOf[Algebraic]
      val (initCls, interCls, finCls) =
        (alg.getInitial, alg.getIntermed, alg.getFinal)
      // plan-time probe of all three (a missing ctor shape anywhere
      // must decline NOW, not fail tasks later)
      val finalFunc = JarUdfs.instantiateUserClass(jarInfo, finCls, ctorArgs)
        .asInstanceOf[EvalFunc[_]]
      JarUdfs.instantiateUserClass(jarInfo, initCls, ctorArgs)
      JarUdfs.instantiateUserClass(jarInfo, interCls, ctorArgs)
      // result type from the TOP-LEVEL UDF (the reference's POUserFunc
      // consults the outer class's outputSchema, not the Final's);
      // fall back to the Final func when the outer one isn't usable
      val outType =
        try JarUdfs.returnTypeOf(alg.asInstanceOf[EvalFunc[_]],
          args.length, inputSchema)
        catch { case _: Exception =>
          JarUdfs.returnTypeOf(finalFunc, args.length, inputSchema) }
      val inSchema = StructType(argTypes.zipWithIndex.map {
        case (t, i) => StructField(s"a$i", t)
      })
      val sig = "graft_alg_" + JarUdfs.sigDigest(
        jarInfo.map(_._2).getOrElse("") +: cls +:
          inputSchema.map(_.toString).getOrElse("") +: ctorArgs)
      val core = Core(jarInfo, initCls, interCls, finCls, ctorArgs,
        sig, JarUdfs.shippableUdfContext())
      val enc = Encoders.kryo(classOf[ArrayBuffer[AnyRef]])
      val fn: Option[Seq[Column] => Column] = outType match {
        case LongType => Some(mk[java.lang.Long](core, enc, Encoders.LONG,
          v => v match { case n: java.lang.Number => Long.box(n.longValue)
                         case _ => null }, inSchema))
        case IntegerType => Some(mk[java.lang.Integer](core, enc, Encoders.INT,
          v => v match { case n: java.lang.Number => Int.box(n.intValue)
                         case _ => null }, inSchema))
        case DoubleType => Some(mk[java.lang.Double](core, enc, Encoders.DOUBLE,
          v => v match { case n: java.lang.Number => Double.box(n.doubleValue)
                         case _ => null }, inSchema))
        case FloatType => Some(mk[java.lang.Float](core, enc, Encoders.FLOAT,
          v => v match { case n: java.lang.Number => Float.box(n.floatValue)
                         case _ => null }, inSchema))
        case StringType => Some(mk[String](core, enc, Encoders.STRING,
          v => if (v == null) null else String.valueOf(v), inSchema))
        case BooleanType => Some(mk[java.lang.Boolean](core, enc,
          Encoders.BOOLEAN,
          v => v match { case b: java.lang.Boolean => b; case _ => null },
          inSchema))
        case other =>
          // non-scalar Finals (tuple/bag/map) and exotic scalars
          // (datetime/decimal): the reference's combiner fuses
          // regardless of result type (CombinerOptimizerUtil.java:89).
          // Catalyst has no top-level array/map encoder, so the result
          // rides inside a 1-field struct row and unwraps with
          // getField after the aggregate.
          val wrap = StructType(Seq(StructField("v", other)))
          val f = mk[Row](core, enc, Encoders.row(wrap),
            v => Row(JarUdfs.coerce(v, other)), inSchema)
          Some((cols: Seq[Column]) => f(cols).getField("v"))
      }
      fn.map(f => f(args))
    }
  } catch {
    case _: Exception => None // decline — the bag path handles it
  }

  private def mk[OUT](core: Core, bufEnc: Encoder[ArrayBuffer[AnyRef]],
                      outEnc: Encoder[OUT], coerce: AnyRef => OUT,
                      inSchema: StructType): Seq[Column] => Column = {
    val agg = new Aggregator[Row, ArrayBuffer[AnyRef], OUT] {
      def zero: ArrayBuffer[AnyRef] = ArrayBuffer.empty
      def reduce(b: ArrayBuffer[AnyRef], in: Row): ArrayBuffer[AnyRef] = {
        b += core.initial(in)
        if (b.length >= CompactAt) core.compact(b) else b
      }
      def merge(b1: ArrayBuffer[AnyRef],
                b2: ArrayBuffer[AnyRef]): ArrayBuffer[AnyRef] = {
        b1 ++= b2
        if (b1.length >= CompactAt) core.compact(b1) else b1
      }
      def finish(b: ArrayBuffer[AnyRef]): OUT = coerce(core.fin(b))
      def bufferEncoder: Encoder[ArrayBuffer[AnyRef]] = bufEnc
      def outputEncoder: Encoder[OUT] = outEnc
    }
    val u = udaf(agg, Encoders.row(inSchema))
    (cols: Seq[Column]) => u(cols: _*)
  }

  /** Serializable trio of EvalFunc bridges (one instance per executor
    * thread each, like JarUdfs.Invoker). */
  private final case class Core(jarInfo: Option[(String, String)],
      initCls: String, interCls: String, finCls: String,
      ctorArgs: Seq[String], sig: String,
      udfCtx: java.util.HashMap[String, java.util.Properties]) {
    @transient private lazy val local =
      ThreadLocal.withInitial[(EvalFunc[_], EvalFunc[_], EvalFunc[_])] { () =>
        (inst(initCls), inst(interCls), inst(finCls))
      }
    private def inst(cls: String): EvalFunc[_] =
      JarUdfs.newContextualInstance(jarInfo, cls, ctorArgs, sig, udfCtx)
        .asInstanceOf[EvalFunc[_]]

    private def tf = TupleFactory.getInstance()
    private def bagOf(vals: Iterable[AnyRef]): Tuple = {
      val bag = BagFactory.getInstance().newDefaultBag()
      vals.foreach {
        case t: Tuple => bag.add(t)
        case v => bag.add(tf.newTuple(v))
      }
      tf.newTuple(bag)
    }

    /** Initial: per input row; receives tuple(bag(tuple(args…))) —
      * the reference's per-record shape. */
    def initial(in: Row): AnyRef = {
      val inner = tf.newTuple(in.toSeq.map(v =>
        JarUdfs.toPig(v.asInstanceOf[AnyRef])).asJava)
      val bag = BagFactory.getInstance().newDefaultBag()
      bag.add(inner)
      local.get()._1.exec(tf.newTuple(bag)).asInstanceOf[AnyRef]
    }

    /** Intermed over the pending partials — replaces them with ONE. */
    def compact(b: ArrayBuffer[AnyRef]): ArrayBuffer[AnyRef] = {
      val combined = local.get()._2.exec(bagOf(b)).asInstanceOf[AnyRef]
      b.clear()
      b += combined
    }

    /** Final over the remaining partials (Intermed first, matching the
      * reference's reduce: Final always consumes Intermed outputs). */
    def fin(b: ArrayBuffer[AnyRef]): AnyRef = {
      val last =
        if (b.isEmpty) bagOf(Nil)
        else { compact(b); bagOf(b) }
      local.get()._3.exec(last).asInstanceOf[AnyRef]
    }
  }
}
