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
  * Nested bag/tuple/map fields are out of scope (delimited text cannot
  * carry them losslessly anyway). */
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

  /** Write the sidecar into the (already written) output directory.
    * Non-scalar columns degrade to chararray (tag 55) — what a delimited
    * store serializes them as. */
  def write(df: DataFrame, dir: String): Unit = {
    val fields = df.schema.fields.map { f =>
      val tag = toTag.applyOrElse(f.dataType, (_: DataType) => 55)
      s"""{"name":"${f.name}","type":$tag,"description":null,"schema":null}"""
    }
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
    val field = """\{\s*"name"\s*:\s*"([^"]+)"\s*,\s*"type"\s*:\s*(\d+)""".r
    val fields = field.findAllMatchIn(json).map { m =>
      StructField(m.group(1),
        fromTag.getOrElse(m.group(2).toInt, StringType))
    }.toSeq
    if (fields.isEmpty) None else Some(StructType(fields))
  }
}
