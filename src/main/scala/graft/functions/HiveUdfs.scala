package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.ql.udf.generic.{GenericUDF, GenericUDFBridge}
import org.apache.hadoop.hive.serde2.objectinspector.{
  ListObjectInspector, MapObjectInspector, ObjectInspector,
  ObjectInspectorFactory, PrimitiveObjectInspector, StructObjectInspector}
import org.apache.hadoop.hive.serde2.objectinspector.primitive.{
  PrimitiveObjectInspectorFactory => POIF}
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_udf, udaf}
import org.apache.spark.sql.types._

/** `DEFINE f HiveUDF('name')` (reference: builtin/HiveUDF.java —
  * nightly.conf HiveUDF group): Hive SCALAR UDFs run against
  * hive-exec's own FunctionRegistry and ObjectInspector machinery,
  * bridged to a Spark udf. Both shapes work: old-style `UDF`
  * subclasses ('sin', routed through Hive's GenericUDFBridge exactly
  * as Hive itself does) and `GenericUDF`s ('upper'). A dotted name
  * resolves as a class instead of a registry lookup, the reference's
  * rule for user Hive UDF jars.
  *
  * Scale shape: plan-time resolution probes initialize() once for the
  * result type; executors rebuild the (GenericUDF, ObjectInspector)
  * trio lazily once per thread — Hive UDF instances are not
  * thread-safe, the same per-thread contract the jar EvalFunc bridge
  * uses. The evaluate call itself is one virtual dispatch per row.
  *
  * HiveUDTF emits into an array (FLATTEN lays it out). HiveUDAF runs
  * TRUE partial aggregation by default ([[udafAggColumn]]: the
  * evaluator's own PARTIAL1/PARTIAL2/FINAL modes driven by a Spark
  * `Aggregator`, no per-group bag ever materialized — a scale step
  * past the reference's COMPLETE-mode adapter); the COMPLETE-mode
  * bag form ([[udafColumn]]) remains the fallback when an evaluator
  * rejects partial modes.
  *
  * The constant-args ctor form `HiveUDF('func', '(null, "x")')`
  * (HiveUDF.java's ConstantObjectInspectInfo) is supported: positions
  * with a non-null literal initialize() through a
  * ConstantObjectInspector — required by Hive UDFs that demand
  * compile-time constants (round's scale, in_file's filename).
  * At evaluate time the DECLARED CONSTANT wins at constant positions
  * (hive-serde only builds writable constant OIs, and Hive itself
  * constant-folds such positions before the row ever reaches the
  * UDF); the reference's adapter instead re-sends the runtime value,
  * which a well-formed constant-OI UDF never reads — see the Bridge
  * comment at [[Bridge.call]].
  */
object HiveUdfs {

  /** The Column for `alias(args…)` where alias was DEFINE'd as
    * HiveUDF('func') or HiveUDF('func', '(consts…)'). Throws at plan
    * time when the function doesn't resolve or a type isn't
    * bridgeable. */
  def column(spark: SparkSession, func: String, args: Seq[Column],
             argTypes: Seq[DataType],
             constParams: Option[String] = None): Column = {
    val consts = constParams.map(parseConstants).getOrElse(Seq.empty)
    val bridge = Bridge(func, argTypes, consts)
    val dt = bridge.resultType // plan-time initialize() probe
    val udfName = ("graft_hive_" +
      func.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      JarUdfs.sigDigest((func +: argTypes.map(_.catalogString)) ++
        consts.map(String.valueOf(_)))).toLowerCase
    JarUdfs.bindUdf(spark, udfName, a => bridge.call(a), dt, args.length)
    call_udf(udfName, args: _*)
  }

  /** Parse the ctor constants literal — `(null, "names.txt")`, or one
    * bare constant — into per-position values (null = "use the runtime
    * argument's inspector here"). Reference: HiveUDFBase
    * ConstantObjectInspectInfo.parse (double quotes normalize to
    * single, then a Pig constant parse). */
  private[functions] def parseConstants(params: String): Seq[Any] = {
    val s0 = params.trim.replace('"', '\'')
    val body = if (s0.startsWith("(") && s0.endsWith(")"))
      s0.substring(1, s0.length - 1) else s0
    // top-level comma split honoring quotes
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    body.foreach {
      case '\'' => inQ = !inQ; cur.append('\'')
      case ',' if !inQ => parts += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty || parts.nonEmpty) parts += cur.toString
    parts.toSeq.map(_.trim).map {
      case "" | "null" | "NULL" => null
      case q if q.startsWith("'") && q.endsWith("'") && q.length >= 2 =>
        q.substring(1, q.length - 1)
      case "true" => java.lang.Boolean.TRUE
      case "false" => java.lang.Boolean.FALSE
      case n if n.matches("[+-]?\\d+") => Integer.valueOf(n)
      case n if n.matches("(?i)[+-]?\\d+L") =>
        java.lang.Long.valueOf(n.dropRight(1))
      case n if n.matches("(?i)[+-]?\\d*\\.?\\d+(e[+-]?\\d+)?F") =>
        java.lang.Float.valueOf(n.dropRight(1))
      case n if n.matches("(?i)[+-]?\\d*\\.\\d+(e[+-]?\\d+)?") =>
        java.lang.Double.valueOf(n)
      case other => throw new IllegalArgumentException(
        s"HiveUDF: unparseable constant '$other' in $params")
    }
  }

  /** Serializable per-call bridge; resolves the Hive UDF once per
    * executor thread. Positions where `consts` holds a non-null value
    * initialize through a ConstantObjectInspector (Hive's contract for
    * must-be-constant arguments); all positions still receive the
    * runtime value at evaluate() time, exactly like the reference. */
  private final case class Bridge(func: String, argTypes: Seq[DataType],
                                  consts: Seq[Any]) {
    // (udf, outOI, per-position constant writable — null = runtime arg).
    // Constant positions evaluate with the declared constant's writable
    // (hive-serde only builds WRITABLE constant OIs, and Hive itself
    // constant-folds these positions, so the declared constant wins).
    @transient private lazy val local
        : ThreadLocal[(GenericUDF, ObjectInspector, Array[AnyRef])] =
      ThreadLocal.withInitial { () =>
        val udf = resolveUdf(func)
        val constVals = new Array[AnyRef](argTypes.length)
        val ois = argTypes.zipWithIndex.map { case (t, i) =>
          consts.lift(i).filter(_ != null) match {
            case Some(v) =>
              val coi = org.apache.hadoop.hive.serde2.objectinspector
                .ObjectInspectorUtils.getConstantObjectInspector(constOi(v), v)
              constVals(i) = coi.getWritableConstantValue
              coi
            case None => oiFor(t)
          }
        }.toArray
        (udf, udf.initialize(ois), constVals)
      }

    def resultType: DataType = sparkType(local.get()._2)

    def call(args: Seq[AnyRef]): AnyRef = {
      val (udf, outOI, constVals) = local.get()
      val deferred: Array[GenericUDF.DeferredObject] =
        args.zipWithIndex.map { case (a, i) =>
          new GenericUDF.DeferredJavaObject(
            if (constVals(i) != null) constVals(i) else toHive(a))
            : GenericUDF.DeferredObject
        }.toArray
      fromHive(udf.evaluate(deferred).asInstanceOf[AnyRef], outOI)
    }
  }

  /** `DEFINE f HiveUDTF('name')`: the UDTF's emitted rows collect into
    * an array<struct> per input row — `FLATTEN(f(…))` then lays them
    * out exactly like the reference's HiveUDTF+flatten idiom. */
  def udtfColumn(spark: SparkSession, func: String, args: Seq[Column],
                 argTypes: Seq[DataType]): Column = {
    val bridge = UdtfBridge(func, argTypes)
    val dt = bridge.resultType
    val udfName = ("graft_hiveudtf_" +
      func.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      JarUdfs.sigDigest(func +: argTypes.map(_.catalogString))).toLowerCase
    JarUdfs.bindUdf(spark, udfName, a => bridge.call(a), dt, args.length)
    call_udf(udfName, args: _*)
  }

  /** `DEFINE f HiveUDAF('name')` over a grouped bag: the evaluator
    * runs in Hive's COMPLETE mode per group — iterate over the bag's
    * tuples, terminate at group end. NOTE: this rides the engine's bag
    * path (the group materializes); the reference fuses HiveUDAF into
    * its combiner. Correct at any size the bag path handles; for
    * partial-aggregating user aggregates prefer an Algebraic jar UDF. */
  def udafColumn(spark: SparkSession, func: String, bag: Column,
                 bagType: DataType): Column = {
    val elemTypes: Seq[DataType] = bagType match {
      case ArrayType(st: StructType, _) => st.fields.toSeq.map(_.dataType)
      case ArrayType(et, _)             => Seq(et)
      case other => throw new IllegalArgumentException(
        s"HiveUDAF expects a grouped bag argument, got ${other.catalogString}")
    }
    val bridge = UdafBridge(func, elemTypes)
    val dt = bridge.resultType
    val udfName = ("graft_hiveudaf_" +
      func.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      JarUdfs.sigDigest(func +: elemTypes.map(_.catalogString))).toLowerCase
    JarUdfs.bindUdf(spark, udfName, a => bridge.call(a.head), dt, 1)
    call_udf(udfName, bag)
  }

  /** True partial aggregation for a HiveUDAF in a FOREACH-over-grouped:
    * drives `GenericUDAFEvaluator`'s own PARTIAL1 / PARTIAL2 / FINAL
    * modes through a Spark `Aggregator`, so the group's bag is never
    * materialized and partials combine map-side before the shuffle —
    * the same contract Hive's own map-side aggregation imposes (and a
    * step past the reference, whose HiveUDAF adapter is COMPLETE-mode
    * only). Returns None when the function doesn't resolve as an
    * aggregate or a type doesn't bridge — the COMPLETE-mode bag path
    * ([[udafColumn]]) is always correct and remains the fallback. */
  def udafAggColumn(func: String, args: Seq[Column],
                    argTypes: Seq[DataType]): Option[Column] = try {
    val core = HiveUdafCore(func, argTypes)
    val outType = core.resultType // plan-time init probe
    val inSchema = StructType(argTypes.zipWithIndex.map {
      case (t, i) => StructField(s"a$i", t)
    })
    val bufEnc = Encoders.kryo(classOf[ArrayBuffer[AnyRef]])
    def mkAgg[OUT](outEnc: Encoder[OUT],
                   coerce: AnyRef => OUT): Seq[Column] => Column = {
      val agg = new Aggregator[Row, ArrayBuffer[AnyRef], OUT] {
        def zero: ArrayBuffer[AnyRef] = ArrayBuffer.empty
        def reduce(b: ArrayBuffer[AnyRef], in: Row): ArrayBuffer[AnyRef] = {
          b += HiveRaw(in.toSeq.map(_.asInstanceOf[AnyRef]).toArray)
          if (b.length >= HiveCompactAt) core.compact(b) else b
        }
        def merge(b1: ArrayBuffer[AnyRef],
                  b2: ArrayBuffer[AnyRef]): ArrayBuffer[AnyRef] = {
          b1 ++= b2
          if (b1.length >= HiveCompactAt) core.compact(b1) else b1
        }
        def finish(b: ArrayBuffer[AnyRef]): OUT = coerce(core.fin(b))
        def bufferEncoder: Encoder[ArrayBuffer[AnyRef]] = bufEnc
        def outputEncoder: Encoder[OUT] = outEnc
      }
      val u = udaf(agg, Encoders.row(inSchema))
      (cols: Seq[Column]) => u(cols: _*)
    }
    val fn = outType match {
      case LongType => mkAgg[java.lang.Long](Encoders.LONG,
        { case n: java.lang.Number => Long.box(n.longValue); case _ => null })
      case IntegerType => mkAgg[java.lang.Integer](Encoders.INT,
        { case n: java.lang.Number => Int.box(n.intValue); case _ => null })
      case DoubleType => mkAgg[java.lang.Double](Encoders.DOUBLE,
        { case n: java.lang.Number => Double.box(n.doubleValue)
          case _ => null })
      case FloatType => mkAgg[java.lang.Float](Encoders.FLOAT,
        { case n: java.lang.Number => Float.box(n.floatValue); case _ => null })
      case StringType => mkAgg[String](Encoders.STRING,
        v => if (v == null) null else String.valueOf(v))
      case BooleanType => mkAgg[java.lang.Boolean](Encoders.BOOLEAN,
        { case b: java.lang.Boolean => b; case _ => null })
      case other =>
        // struct/array/map/decimal results ride a 1-field struct row
        // and unwrap after the aggregate (same trick as AlgebraicAgg)
        val wrap = StructType(Seq(StructField("v", other)))
        val f = mkAgg[Row](Encoders.row(wrap),
          v => Row(JarUdfs.coerce(v, other)))
        (cols: Seq[Column]) => f(cols).getField("v")
    }
    Some(fn(args))
  } catch { case _: Exception => None } // decline → bag path

  /** Pending per-row argument values awaiting a PARTIAL1 compaction
    * (kryo-encodable: plain Spark java values). */
  private final case class HiveRaw(vals: Array[AnyRef])

  /** Pending buffer entries before an in-buffer compaction — bounds the
    * Aggregator buffer regardless of group size. */
  private val HiveCompactAt = 4096

  /** Serializable evaluator driver. Partials are stored in STANDARD
    * JAVA form (writable-free, kryo-encodable); every mode init that
    * consumes partials uses the matching standard-java inspector. */
  private final case class HiveUdafCore(func: String,
                                        argTypes: Seq[DataType]) {
    import org.apache.hadoop.hive.ql.udf.generic.{
      GenericUDAFEvaluator, GenericUDAFResolver2,
      SimpleGenericUDAFParameterInfo}
    import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspectorUtils
    import ObjectInspectorUtils.ObjectInspectorCopyOption

    // (fresh-evaluator factory, input OIs, PARTIAL1 out OI,
    //  standard-java partial OI, FINAL out OI)
    @transient private lazy val local = ThreadLocal.withInitial { () =>
      val resolver = resolveUdafResolver(func)
      val inOIs = argTypes.map(oiFor).toArray
      def fresh(): GenericUDAFEvaluator = resolver match {
        case r2: GenericUDAFResolver2 => r2.getEvaluator(
          new SimpleGenericUDAFParameterInfo(inOIs, false, false, false))
        case r1 => r1.getEvaluator(inOIs.map(oi =>
          org.apache.hadoop.hive.serde2.typeinfo.TypeInfoUtils
            .getTypeInfoFromObjectInspector(oi)))
      }
      val partialOI = fresh().init(GenericUDAFEvaluator.Mode.PARTIAL1, inOIs)
      val stdPartialOI = ObjectInspectorUtils.getStandardObjectInspector(
        partialOI, ObjectInspectorCopyOption.JAVA)
      val outOI = fresh().init(GenericUDAFEvaluator.Mode.FINAL,
        Array(stdPartialOI))
      (fresh _, inOIs, partialOI, stdPartialOI, outOI)
    }

    def resultType: DataType = sparkType(local.get()._5)

    /** PARTIAL1 over pending raw rows, then PARTIAL2 over all pending
      * partials → the buffer collapses to ONE standard-java partial. */
    def compact(b: ArrayBuffer[AnyRef]): ArrayBuffer[AnyRef] = {
      val one = combined(b.toSeq)
      b.clear()
      b += one
    }

    private def combined(entries: Seq[AnyRef]): AnyRef = {
      val (mk, inOIs, partialOI, stdPartialOI, _) = local.get()
      import GenericUDAFEvaluator.Mode
      val parts = ArrayBuffer.empty[AnyRef]
      val raws = ArrayBuffer.empty[Array[AnyRef]]
      entries.foreach {
        case HiveRaw(v) => raws += v
        case p => parts += p
      }
      if (raws.nonEmpty) {
        val ev = mk()
        ev.init(Mode.PARTIAL1, inOIs)
        val buf = ev.getNewAggregationBuffer; ev.reset(buf)
        raws.foreach(r => ev.iterate(buf, r.map(toHive)))
        parts += ObjectInspectorUtils.copyToStandardJavaObject(
          ev.terminatePartial(buf), partialOI)
      }
      if (parts.length == 1) parts.head
      else {
        val ev = mk()
        val oi = ev.init(Mode.PARTIAL2, Array(stdPartialOI))
        val buf = ev.getNewAggregationBuffer; ev.reset(buf)
        parts.foreach(p => ev.merge(buf, p))
        ObjectInspectorUtils.copyToStandardJavaObject(
          ev.terminatePartial(buf), oi)
      }
    }

    /** FINAL merge over the buffer's entries → the Spark value. */
    def fin(b: ArrayBuffer[AnyRef]): AnyRef = {
      val st = local.get()
      val (mk, stdPartialOI, outOI) = (st._1, st._4, st._5)
      import GenericUDAFEvaluator.Mode
      val ev = mk()
      ev.init(Mode.FINAL, Array(stdPartialOI))
      val buf = ev.getNewAggregationBuffer; ev.reset(buf)
      if (b.nonEmpty) ev.merge(buf, combined(b.toSeq))
      fromHive(ev.terminate(buf).asInstanceOf[AnyRef], outOI)
    }
  }

  private final case class UdtfBridge(func: String,
                                      argTypes: Seq[DataType]) {
    import org.apache.hadoop.hive.ql.udf.generic.GenericUDTF
    @transient private lazy val local
        : ThreadLocal[(GenericUDTF, StructObjectInspector)] =
      ThreadLocal.withInitial { () =>
        val udtf = resolveUdtf(func)
        val argOI = ObjectInspectorFactory.getStandardStructObjectInspector(
          argTypes.indices.map(i => s"a$i").toList.asJava,
          argTypes.map(oiFor).toList.asJava)
        (udtf, udtf.initialize(argOI))
      }

    def resultType: DataType = ArrayType(sparkType(local.get()._2))

    def call(args: Seq[AnyRef]): AnyRef = {
      val (udtf, outOI) = local.get()
      val collected = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
      udtf.setCollector(new org.apache.hadoop.hive.ql.udf.generic.Collector {
        override def collect(input: AnyRef): Unit =
          collected += fromHive(input, outOI)
      })
      udtf.process(args.map(toHive).toArray)
      collected.toSeq
    }
  }

  private final case class UdafBridge(func: String,
                                      elemTypes: Seq[DataType]) {
    import org.apache.hadoop.hive.ql.udf.generic.{
      GenericUDAFEvaluator, GenericUDAFResolver2,
      SimpleGenericUDAFParameterInfo}
    @transient private lazy val local
        : ThreadLocal[(GenericUDAFEvaluator, ObjectInspector)] =
      ThreadLocal.withInitial { () =>
        val resolver = resolveUdafResolver(func)
        val ois = elemTypes.map(oiFor).toArray
        val ev = resolver match {
          case r2: GenericUDAFResolver2 => r2.getEvaluator(
            new SimpleGenericUDAFParameterInfo(ois, false, false, false))
          case r1 => r1.getEvaluator(ois.map(oi =>
            org.apache.hadoop.hive.serde2.typeinfo.TypeInfoUtils
              .getTypeInfoFromObjectInspector(oi)))
        }
        val outOI = ev.init(GenericUDAFEvaluator.Mode.COMPLETE, ois)
        (ev, outOI)
      }

    def resultType: DataType = sparkType(local.get()._2)

    /** One full COMPLETE-mode pass over the group's bag. */
    def call(bag: AnyRef): AnyRef = {
      val (ev, outOI) = local.get()
      val buf = ev.getNewAggregationBuffer
      ev.reset(buf)
      bag match {
        case null => ()
        case s: scala.collection.Seq[_] => s.foreach {
          case r: org.apache.spark.sql.Row =>
            ev.iterate(buf, r.toSeq.map(x =>
              toHive(x.asInstanceOf[AnyRef])).toArray)
          case x =>
            ev.iterate(buf, Array(toHive(x.asInstanceOf[AnyRef])))
        }
        case other => throw new IllegalArgumentException(
          s"HiveUDAF: expected a bag, got ${other.getClass.getName}")
      }
      fromHive(ev.terminate(buf).asInstanceOf[AnyRef], outOI)
    }
  }

  /** Registry name → GenericUDAFResolver; dotted name → user class
    * (the reference's resolveFunc rule applies to all Hive UDF kinds).
    * Old-style `UDAF` subclasses ride Hive's own GenericUDAFBridge. */
  private[functions] def resolveUdafResolver(func: String)
      : org.apache.hadoop.hive.ql.udf.generic.GenericUDAFResolver =
    if (func.contains(".")) {
      val c = Class.forName(func)
      if (classOf[org.apache.hadoop.hive.ql.udf.generic.GenericUDAFResolver]
          .isAssignableFrom(c))
        c.getDeclaredConstructor().newInstance()
          .asInstanceOf[org.apache.hadoop.hive.ql.udf.generic.GenericUDAFResolver]
      else if (classOf[org.apache.hadoop.hive.ql.exec.UDAF]
          .isAssignableFrom(c))
        new org.apache.hadoop.hive.ql.udf.generic.GenericUDAFBridge(
          c.getDeclaredConstructor().newInstance()
            .asInstanceOf[org.apache.hadoop.hive.ql.exec.UDAF])
      else throw new IllegalArgumentException(
        s"HiveUDAF: $func is neither a UDAF nor a GenericUDAFResolver")
    } else {
      val info = org.apache.hadoop.hive.ql.exec.FunctionRegistry
        .getFunctionInfo(func)
      require(info != null, s"HiveUDAF: no Hive function named '$func'")
      val resolver = info.getGenericUDAFResolver
      require(resolver != null, s"HiveUDAF: '$func' is not an aggregate")
      resolver
    }

  /** Registry name → GenericUDTF; dotted name → user class. */
  private[functions] def resolveUdtf(func: String)
      : org.apache.hadoop.hive.ql.udf.generic.GenericUDTF =
    if (func.contains(".")) {
      val c = Class.forName(func)
      require(classOf[org.apache.hadoop.hive.ql.udf.generic.GenericUDTF]
        .isAssignableFrom(c), s"HiveUDTF: $func is not a GenericUDTF")
      c.getDeclaredConstructor().newInstance()
        .asInstanceOf[org.apache.hadoop.hive.ql.udf.generic.GenericUDTF]
    } else {
      val info = org.apache.hadoop.hive.ql.exec.FunctionRegistry
        .getFunctionInfo(func)
      require(info != null, s"HiveUDTF: no Hive function named '$func'")
      val udtf = info.getGenericUDTF
      require(udtf != null, s"HiveUDTF: '$func' is not a UDTF")
      udtf
    }

  /** Registry name → GenericUDF ('sin' and 'upper' alike: FunctionInfo
    * wraps old-style UDFs in GenericUDFBridge); dotted → class. */
  private def resolveUdf(func: String): GenericUDF =
    if (func.contains(".")) {
      val c = Class.forName(func)
      if (classOf[GenericUDF].isAssignableFrom(c))
        c.getDeclaredConstructor().newInstance().asInstanceOf[GenericUDF]
      else if (classOf[org.apache.hadoop.hive.ql.exec.UDF]
          .isAssignableFrom(c))
        new GenericUDFBridge(func, false, c.getName)
      else throw new IllegalArgumentException(
        s"HiveUDF: $func is neither a Hive UDF nor a GenericUDF")
    } else {
      val info =
        org.apache.hadoop.hive.ql.exec.FunctionRegistry.getFunctionInfo(func)
      require(info != null, s"HiveUDF: no Hive function named '$func'")
      val g = info.getGenericUDF
      require(g != null, s"HiveUDF: '$func' is not a scalar UDF — " +
        "HiveUDAF/HiveUDTF are not supported (use the native " +
        "aggregate/FLATTEN surfaces)")
      g
    }

  /** OI for a parsed ctor constant, keyed by its Java class. */
  private def constOi(v: Any): PrimitiveObjectInspector = v match {
    case _: String            => POIF.javaStringObjectInspector
    case _: java.lang.Integer => POIF.javaIntObjectInspector
    case _: java.lang.Long    => POIF.javaLongObjectInspector
    case _: java.lang.Double  => POIF.javaDoubleObjectInspector
    case _: java.lang.Float   => POIF.javaFloatObjectInspector
    case _: java.lang.Boolean => POIF.javaBooleanObjectInspector
    case other => throw new IllegalArgumentException(
      s"HiveUDF: unsupported constant ${other.getClass.getName}")
  }

  /** Spark type → Java-object ObjectInspector (the values a Spark udf
    * receives are plain Java objects). */
  private def oiFor(dt: DataType): ObjectInspector = dt match {
    case StringType  => POIF.javaStringObjectInspector
    case IntegerType => POIF.javaIntObjectInspector
    case LongType    => POIF.javaLongObjectInspector
    case DoubleType  => POIF.javaDoubleObjectInspector
    case FloatType   => POIF.javaFloatObjectInspector
    case BooleanType => POIF.javaBooleanObjectInspector
    case ShortType   => POIF.javaShortObjectInspector
    case ByteType    => POIF.javaByteObjectInspector
    case BinaryType  => POIF.javaByteArrayObjectInspector
    case ArrayType(et, _) =>
      ObjectInspectorFactory.getStandardListObjectInspector(oiFor(et))
    case MapType(kt, vt, _) =>
      ObjectInspectorFactory.getStandardMapObjectInspector(
        oiFor(kt), oiFor(vt))
    case st: StructType =>
      ObjectInspectorFactory.getStandardStructObjectInspector(
        st.fieldNames.toList.asJava,
        st.fields.toList.map(f => oiFor(f.dataType)).asJava)
    case other => throw new IllegalArgumentException(
      s"HiveUDF: unsupported argument type ${other.catalogString}")
  }

  private def sparkType(oi: ObjectInspector): DataType = oi match {
    case p: PrimitiveObjectInspector =>
      import PrimitiveObjectInspector.PrimitiveCategory
      p.getPrimitiveCategory match {
        case PrimitiveCategory.STRING | PrimitiveCategory.VARCHAR |
             PrimitiveCategory.CHAR => StringType
        case PrimitiveCategory.INT => IntegerType
        case PrimitiveCategory.LONG => LongType
        case PrimitiveCategory.DOUBLE => DoubleType
        case PrimitiveCategory.FLOAT => FloatType
        case PrimitiveCategory.BOOLEAN => BooleanType
        case PrimitiveCategory.SHORT => ShortType
        case PrimitiveCategory.BYTE => ByteType
        case PrimitiveCategory.BINARY => BinaryType
        case PrimitiveCategory.DATE => DateType
        case PrimitiveCategory.TIMESTAMP => TimestampType
        case PrimitiveCategory.DECIMAL => DecimalType(38, 18)
        case other => throw new IllegalArgumentException(
          s"HiveUDF: unsupported return category $other")
      }
    case l: ListObjectInspector =>
      ArrayType(sparkType(l.getListElementObjectInspector))
    case m: MapObjectInspector =>
      MapType(sparkType(m.getMapKeyObjectInspector),
        sparkType(m.getMapValueObjectInspector))
    case s: StructObjectInspector =>
      StructType(s.getAllStructFieldRefs.asScala.toSeq.map(f =>
        StructField(f.getFieldName, sparkType(f.getFieldObjectInspector))))
    case other => throw new IllegalArgumentException(
      s"HiveUDF: unsupported return inspector ${other.getClass.getName}")
  }

  /** Spark udf arg values → the Java model the Java OIs expect. */
  private def toHive(v: AnyRef): AnyRef = v match {
    case null => null
    case s: scala.collection.Seq[_] =>
      s.map(x => toHive(x.asInstanceOf[AnyRef])).asJava
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) =>
        toHive(k.asInstanceOf[AnyRef]) -> toHive(x.asInstanceOf[AnyRef])
      }.asJava
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(x => toHive(x.asInstanceOf[AnyRef])).asJava
    case other => other
  }

  /** Hive result → Spark value, THROUGH the declared output OI (Hive
    * UDFs freely return Writables even over Java input OIs). */
  private def fromHive(v: AnyRef, oi: ObjectInspector): AnyRef =
    if (v == null) null
    else oi match {
      case p: PrimitiveObjectInspector =>
        p.getPrimitiveJavaObject(v) match {
          case hc: org.apache.hadoop.hive.common.`type`.HiveChar =>
            hc.getValue
          case hv: org.apache.hadoop.hive.common.`type`.HiveVarchar =>
            hv.getValue
          case d: org.apache.hadoop.hive.common.`type`.HiveDecimal =>
            d.bigDecimalValue.setScale(18, java.math.RoundingMode.HALF_UP)
          case other => other
        }
      case l: ListObjectInspector =>
        l.getList(v).asScala.toSeq.map(x =>
          fromHive(x.asInstanceOf[AnyRef],
            l.getListElementObjectInspector))
      case m: MapObjectInspector =>
        m.getMap(v).asScala.map { case (k, x) =>
          fromHive(k.asInstanceOf[AnyRef], m.getMapKeyObjectInspector) ->
            fromHive(x.asInstanceOf[AnyRef], m.getMapValueObjectInspector)
        }.toMap
      case s: StructObjectInspector =>
        org.apache.spark.sql.Row(
          s.getAllStructFieldRefs.asScala.toSeq.map(f =>
            fromHive(s.getStructFieldData(v, f).asInstanceOf[AnyRef],
              f.getFieldObjectInspector)): _*)
      case other => throw new IllegalArgumentException(
        s"HiveUDF: unconvertible result inspector ${other.getClass.getName}")
    }
}
