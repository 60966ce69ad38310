package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.ql.udf.generic.{GenericUDF, GenericUDFBridge}
import org.apache.hadoop.hive.serde2.objectinspector.{
  ListObjectInspector, MapObjectInspector, ObjectInspector,
  ObjectInspectorFactory, PrimitiveObjectInspector, StructObjectInspector}
import org.apache.hadoop.hive.serde2.objectinspector.primitive.{
  PrimitiveObjectInspectorFactory => POIF}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_udf
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
  * HiveUDTF emits into an array (FLATTEN lays it out) and HiveUDAF
  * runs COMPLETE-mode over the grouped bag. Out of scope (loudly):
  * the reference's constant-args ctor form `HiveUDF('func', '(…)')`.
  */
object HiveUdfs {

  /** The Column for `alias(args…)` where alias was DEFINE'd as
    * HiveUDF('func'). Throws at plan time when the function doesn't
    * resolve or a type isn't bridgeable. */
  def column(spark: SparkSession, func: String, args: Seq[Column],
             argTypes: Seq[DataType]): Column = {
    val bridge = Bridge(func, argTypes)
    val dt = bridge.resultType // plan-time initialize() probe
    val udfName = ("graft_hive_" +
      func.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      JarUdfs.sigDigest(func +: argTypes.map(_.catalogString))).toLowerCase
    JarUdfs.bindUdf(spark, udfName, a => bridge.call(a), dt, args.length)
    call_udf(udfName, args: _*)
  }

  /** Serializable per-call bridge; resolves the Hive UDF once per
    * executor thread. */
  private final case class Bridge(func: String, argTypes: Seq[DataType]) {
    @transient private lazy val local: ThreadLocal[(GenericUDF, ObjectInspector)] =
      ThreadLocal.withInitial { () =>
        val udf = resolveUdf(func)
        (udf, udf.initialize(argTypes.map(oiFor).toArray))
      }

    def resultType: DataType = sparkType(local.get()._2)

    def call(args: Seq[AnyRef]): AnyRef = {
      val (udf, outOI) = local.get()
      val deferred: Array[GenericUDF.DeferredObject] =
        args.map(a => new GenericUDF.DeferredJavaObject(toHive(a))
          : GenericUDF.DeferredObject).toArray
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

  private final case class UdtfBridge(func: String,
                                      argTypes: Seq[DataType]) {
    import org.apache.hadoop.hive.ql.udf.generic.GenericUDTF
    @transient private lazy val local
        : ThreadLocal[(GenericUDTF, StructObjectInspector)] =
      ThreadLocal.withInitial { () =>
        val info = org.apache.hadoop.hive.ql.exec.FunctionRegistry
          .getFunctionInfo(func)
        require(info != null, s"HiveUDTF: no Hive function named '$func'")
        val udtf = info.getGenericUDTF
        require(udtf != null, s"HiveUDTF: '$func' is not a UDTF")
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
        val info = org.apache.hadoop.hive.ql.exec.FunctionRegistry
          .getFunctionInfo(func)
        require(info != null, s"HiveUDAF: no Hive function named '$func'")
        val resolver = info.getGenericUDAFResolver
        require(resolver != null, s"HiveUDAF: '$func' is not an aggregate")
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
