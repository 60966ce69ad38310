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
  * Scalar results only (the overwhelming Algebraic shape — COUNT/SUM/
  * AVG-likes); a bag/tuple-returning Final falls back to the bag path.
  */
object AlgebraicAgg {

  /** Max pending Initial outputs before an Intermed compaction — keeps
    * the buffer bounded regardless of group size. */
  private val CompactAt = 4096

  /** The aggregate Column for `name(args…)` over the grouped input, or
    * None when the name doesn't resolve to an Algebraic EvalFunc with
    * a scalar result type. `argTypes` are the Catalyst types of the
    * rewritten per-row argument columns. */
  def columnFor(registry: JarUdfs.Registry, name: String,
                ctorArgs: Seq[String], args: Seq[Column],
                argTypes: Seq[DataType]): Option[Column] = {
    val hit = JarUdfs.resolveClass(registry, name).flatMap {
      case (jar, ver, cls) =>
        try {
          val c = Class.forName(cls, false, JarUdfs.loaderFor(jar, ver))
          if (classOf[Algebraic].isAssignableFrom(c) &&
              classOf[EvalFunc[_]].isAssignableFrom(c))
            Some((Some((jar, ver)): Option[(String, String)], cls))
          else None
        } catch { case _: Throwable => None }
    }
    hit.flatMap { case (jarInfo, cls) =>
      val alg = JarUdfs.instantiateUserClass(jarInfo, cls, ctorArgs)
        .asInstanceOf[Algebraic]
      val (initCls, interCls, finCls) =
        (alg.getInitial, alg.getIntermed, alg.getFinal)
      val finalFunc = JarUdfs.instantiateUserClass(jarInfo, finCls, ctorArgs)
        .asInstanceOf[EvalFunc[_]]
      val outType = JarUdfs.returnTypeOf(finalFunc, args.length)
      val inSchema = StructType(argTypes.zipWithIndex.map {
        case (t, i) => StructField(s"a$i", t)
      })
      val core = Core(jarInfo, initCls, interCls, finCls, ctorArgs)
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
        case _ => None // bag/tuple/map results: bag path
      }
      fn.map(f => f(args))
    }
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
                                initCls: String, interCls: String,
                                finCls: String, ctorArgs: Seq[String]) {
    @transient private lazy val local =
      ThreadLocal.withInitial[(EvalFunc[_], EvalFunc[_], EvalFunc[_])] { () =>
        (inst(initCls), inst(interCls), inst(finCls))
      }
    private def inst(cls: String): EvalFunc[_] =
      JarUdfs.instantiateUserClass(jarInfo, cls, ctorArgs)
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
