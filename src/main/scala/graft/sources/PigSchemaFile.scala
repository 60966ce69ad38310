package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The `.pig_schema` sidecar (reference: JsonMetadata.java:75 — a hidden
  * JSON file in the output directory; PigStorage.java:99 writes it under
  * the `-schema` option and applies it on load when present). The JSON
  * shape matches the reference's ResourceSchema serialization for FLAT
  * schemas — `{"fields":[{"name":…,"type":<byte-tag>},…],"version":0}`
  * with DataType.java byte tags — so sidecars round-trip with real Pig.
  * Nested bag/tuple/map fields carry their inner schema recursively
  * (tags 120/110/100) the way ResourceSchema does; a re-LOAD parses the
  * delimited text back through the Pig-literal LoadCaster. */
object PigSchemaFile {

  val FileName = ".pig_schema"

  // DataType.java:60-92 byte tags ↔ Catalyst types (SURVEY §1.2)
  private val toTag: PartialFunction[DataType, Int] = {
    case BooleanType   => 5
    case IntegerType   => 10
    case LongType      => 15
    case FloatType     => 20
    case DoubleType    => 25
    case TimestampType => 30
    case BinaryType    => 50
    case StringType    => 55
    case d: DecimalType if d.scale == 0 => 65 // biginteger
    case _: DecimalType => 70                 // bigdecimal
  }
  private val fromTag: Map[Int, DataType] = Map(
    5 -> BooleanType, 10 -> IntegerType, 15 -> LongType, 20 -> FloatType,
    25 -> DoubleType, 30 -> TimestampType, 50 -> BinaryType,
    55 -> StringType, 65 -> DecimalType(38, 0), 70 -> DecimalType(38, 18))

  /** One field as ResourceSchema JSON — complex types carry the inner
    * schema recursively (DataType tags: MAP=100, TUPLE=110, BAG=120). */
  private def fieldJson(name: String, dt: DataType): String = {
    val n = if (name == null) "null" else s""""$name""""
    dt match {
      case ArrayType(st: StructType, _) => // bag of tuples
        s"""{"name":$n,"type":120,"description":null,"schema":""" +
          s"""{"fields":[${fieldJson(null, st)}],"version":0}}"""
      case ArrayType(et, _) => // bag of plain values → 1-field tuples
        fieldJson(name, ArrayType(StructType(Seq(StructField("t0", et)))))
      case st: StructType =>
        val inner = st.fields.map(f => fieldJson(f.name, f.dataType))
        s"""{"name":$n,"type":110,"description":null,"schema":""" +
          s"""{"fields":[${inner.mkString(",")}],"version":0}}"""
      case MapType(_, vt, _) =>
        val inner = toTag.isDefinedAt(vt) || vt.isInstanceOf[StructType] ||
          vt.isInstanceOf[ArrayType] || vt.isInstanceOf[MapType]
        val sch = if (inner)
          s"""{"fields":[${fieldJson(null, vt)}],"version":0}""" else "null"
        s"""{"name":$n,"type":100,"description":null,"schema":$sch}"""
      case other =>
        val tag = toTag.applyOrElse(other, (_: DataType) => 55)
        s"""{"name":$n,"type":$tag,"description":null,"schema":null}"""
    }
  }

  /** Write the sidecar into the (already written) output directory. */
  def write(df: DataFrame, dir: String): Unit = {
    val fields =
      df.schema.fields.map(f => fieldJson(f.name, f.dataType))
    val json =
      s"""{"fields":[${fields.mkString(",")}],"version":0,"sortKeys":[],"sortKeyOrders":[]}"""
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read the sidecar if present; None when the file does not exist or
    * carries no parseable flat fields. */
  def read(spark: SparkSession, dir: String): Option[StructType] = {
    val p = new Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val json =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      val root = mapper.readTree(json)
      def typeOf(node: com.fasterxml.jackson.databind.JsonNode): DataType = {
        val tag = node.path("type").asInt(55)
        def innerFields = node.path("schema").path("fields")
        def hasInner = innerFields.isArray && innerFields.size() > 0
        tag match {
          case 120 => // bag: inner schema holds one tuple field; real
            // Pig writes "schema":null for an UNTYPED bag — degrade
            // that one field, not the whole sidecar
            if (!hasInner) ArrayType(StructType(Seq(
              StructField("t0", StringType))))
            else typeOf(innerFields.get(0)) match {
              case st: StructType => ArrayType(st)
              case other => ArrayType(StructType(Seq(StructField("t0", other))))
            }
          case 110 =>
            if (!hasInner) StringType
            else {
              val it = innerFields.elements()
              val fs = Iterator.continually(it).takeWhile(_.hasNext)
                .map(_.next()).zipWithIndex.map { case (f, i) =>
                  val nm = f.path("name")
                  StructField(
                    if (nm.isTextual) nm.asText() else s"t$i", typeOf(f))
                }.toSeq
              StructType(fs)
            }
          case 100 =>
            MapType(StringType,
              if (hasInner) typeOf(innerFields.get(0)) else StringType)
          case n => fromTag.getOrElse(n, StringType)
        }
      }
      val it = root.path("fields").elements()
      val fields = Iterator.continually(it).takeWhile(_.hasNext)
        .map(_.next()).zipWithIndex.map { case (f, i) =>
          val nm = f.path("name")
          // a malformed field degrades to chararray — the old reader's
          // behavior — never discards the other fields' names
          StructField(if (nm.isTextual) nm.asText() else s"f$i",
            scala.util.Try(typeOf(f)).getOrElse(StringType))
        }.toSeq
      if (fields.isEmpty) None else Some(StructType(fields))
    } catch { case _: Exception => None } // unparseable → schemaless load
  }
}
