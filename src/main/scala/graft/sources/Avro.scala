package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord, GenericRecordBuilder}
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.GenericDatumReader
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** AvroStorage (reference: P/builtin/AvroStorage.java:88) without the
  * spark-avro datasource (absent from this classpath): the container DOES
  * ship avro core + avro-mapred, so the files are read/written through the
  * Hadoop input/output formats — the same distributed scan path every
  * Spark file source uses (one task per split; no driver-side data
  * movement). Schema handling:
  *
  *  - read: the READER schema is taken from the first file's header on the
  *    driver and passed to the input format (`AvroJob.setInputKeySchema`),
  *    so Avro resolves every file's writer schema against it BY FIELD NAME
  *    — heterogeneous file sets (schema evolution: field reorder, added
  *    fields with defaults) decode correctly rather than positionally.
  *    Records decode per-partition and convert to Rows immediately (the
  *    Hadoop reader REUSES the record object, so conversion cannot be
  *    deferred). Logical types (timestamp-micros vs -millis, date) are
  *    threaded through the conversion from the Avro schema.
  *  - write: the Spark schema maps to an Avro record schema with nullable
  *    fields as `[null, T]` unions; timestamps/dates use the standard
  *    timestamp-micros / date logical types.
  *
  * Supported types both ways: all atomics, binary, decimal→bytes is NOT
  * supported (no logical-type conversions registered — kept out to avoid
  * silent precision loss), arrays, string-keyed maps, nested structs.
  */
object Avro {

  // ------------------------------------------------------------------ read

  /** `columns = Some(names)` prunes the READ, not just the output: the
    * reader schema is cut down to those fields, and Avro's schema
    * resolution SKIPS non-reader fields during decode (per-field skip in
    * the binary decoder) — a 2-column projection of a wide record decodes
    * 2 fields per row instead of all of them. This is the loader-level
    * column pruning the reference exposes via LoadPushDown
    * (P/LoadPushDown.java pushProjection); Catalyst can't see through the
    * RDD boundary, so the frontend passes the AS-schema names down. */
  def read(spark: SparkSession, path: String,
           columns: Option[Seq[String]] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fullSchema = readWriterSchema(path, conf)
    val avroSchema = columns match {
      case Some(cols) => pruneSchema(fullSchema, cols)
      case None       => fullSchema
    }
    val sparkSchema = toSparkType(avroSchema).asInstanceOf[StructType]
    val schemaJson = avroSchema.toString
    // reader schema → per-file resolution by field name (schema evolution)
    val job = Job.getInstance(conf)
    AvroJob.setDataModelClass(job, classOf[GenericData])
    AvroJob.setInputKeySchema(job, avroSchema)
    val rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .mapPartitions { it =>
        // parse once per task; Schema itself isn't in the closure
        val reader = new AvroSchema.Parser().parse(schemaJson)
        it.map { case (k, _) => recordToRow(k.datum(), sparkSchema, reader) }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Writer schema from the first .avro file under `path` (driver-side:
    * reads one file HEADER, no data). */
  private def readWriterSchema(path: String,
      conf: org.apache.hadoop.conf.Configuration): AvroSchema = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isFile) p
      else fs.listStatus(p).toSeq
        .map(_.getPath)
        .filter(f => f.getName.endsWith(".avro"))
        .sortBy(_.getName)
        .headOption
        .getOrElse(throw new IllegalArgumentException(
          s"no .avro files under $path"))
    val reader = new DataFileReader[GenericRecord](
      new FsInput(file, conf), new GenericDatumReader[GenericRecord]())
    try reader.getSchema finally reader.close()
  }

  /** Reader-schema projection: same record name/namespace (resolution
    * matches records by full name), only the requested fields. Field
    * order follows `cols`, so the output column order is the projection's. */
  private def pruneSchema(writer: AvroSchema, cols: Seq[String]): AvroSchema = {
    val fields = new java.util.ArrayList[AvroSchema.Field]()
    cols.foreach { c =>
      val f = Option(writer.getField(c)).getOrElse(
        throw new IllegalArgumentException(
          s"column $c is not in the Avro schema " +
          s"(${writer.getFields.asScala.map(_.name).mkString(", ")})"))
      fields.add(new AvroSchema.Field(f.name, f.schema, f.doc, f.defaultVal))
    }
    AvroSchema.createRecord(writer.getName, writer.getDoc,
      writer.getNamespace, false, fields)
  }

  private[sources] def toSparkType(s: AvroSchema): DataType = s.getType match {
    case AvroSchema.Type.BOOLEAN => BooleanType
    case AvroSchema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date")
        DateType
      else IntegerType
    case AvroSchema.Type.LONG =>
      s.getLogicalType match {
        case lt if lt != null && (lt.getName == "timestamp-micros" ||
                                  lt.getName == "timestamp-millis") =>
          TimestampType
        case _ => LongType
      }
    case AvroSchema.Type.FLOAT  => FloatType
    case AvroSchema.Type.DOUBLE => DoubleType
    case AvroSchema.Type.STRING | AvroSchema.Type.ENUM => StringType
    case AvroSchema.Type.BYTES | AvroSchema.Type.FIXED => BinaryType
    case AvroSchema.Type.NULL   => NullType
    case AvroSchema.Type.ARRAY =>
      ArrayType(toSparkType(s.getElementType))
    case AvroSchema.Type.MAP =>
      MapType(StringType, toSparkType(s.getValueType))
    case AvroSchema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name, toSparkType(f.schema()),
          nullable = isNullable(f.schema()))))
    case AvroSchema.Type.UNION =>
      nonNullBranch(s) match {
        case Some(b) => toSparkType(b)
        case None => throw new UnsupportedOperationException(
          s"unsupported Avro union (only [null, T] is supported): $s")
      }
  }

  private def isNullable(s: AvroSchema): Boolean =
    s.getType == AvroSchema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == AvroSchema.Type.NULL)

  /** `[null, T]` → Some(T); anything with 2+ non-null branches → None. */
  private def nonNullBranch(s: AvroSchema): Option[AvroSchema] =
    s.getTypes.asScala.toList.filter(_.getType != AvroSchema.Type.NULL) match {
      case one :: Nil => Some(one)
      case _          => None
    }

  private def recordToRow(rec: GenericRecord, st: StructType,
                          as: AvroSchema): Row =
    Row.fromSeq(st.fields.toSeq.map(f =>
      avroValue(rec.get(f.name), f.dataType, as.getField(f.name).schema())))

  /** Convert a decoded Avro value; `as` is the value's Avro schema (unions
    * unwrap to their non-null branch) so logical types are authoritative —
    * a timestamp-millis long multiplies to micros instead of being
    * misread as micros. */
  private def avroValue(v: Any, dt: DataType, as: AvroSchema): Any = {
    val s =
      if (as.getType == AvroSchema.Type.UNION) nonNullBranch(as).getOrElse(as)
      else as
    (v, dt) match {
      case (null, _) => null
      case (cs: CharSequence, StringType) => cs.toString
      case (b: java.nio.ByteBuffer, BinaryType) =>
        val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
      case (f: GenericData.Fixed, BinaryType) => f.bytes().clone()
      case (l: java.lang.Long, TimestampType) =>
        val micros =
          if (s.getLogicalType != null &&
              s.getLogicalType.getName == "timestamp-millis")
            Math.multiplyExact(l.longValue(), 1000L)
          else l.longValue()
        java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L)
      case (i: java.lang.Integer, DateType) =>
        java.time.LocalDate.ofEpochDay(i.longValue())
      case (r: GenericRecord, st: StructType) => recordToRow(r, st, s)
      case (a: java.util.Collection[_], ArrayType(et, _)) =>
        a.asScala.toSeq.map(avroValue(_, et, s.getElementType))
      case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
        m.asScala.map { case (k, mv) =>
          k.toString -> avroValue(mv, vt, s.getValueType) }.toMap
      case (e: GenericData.EnumSymbol, StringType) => e.toString
      case (other, _) => other // int/long/float/double/boolean pass through
    }
  }

  // ----------------------------------------------------------------- write

  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val sparkSchema = df.schema
    val avroSchema = toAvroSchema(sparkSchema, "topLevelRecord")
    val schemaJson = avroSchema.toString
    // overwrite semantics to match the other STORE formats
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, avroSchema)
    df.rdd.mapPartitions { rows =>
      // parse once per task — Schema is Serializable but the json string
      // is version-proof and keeps the closure tiny
      val schema = new AvroSchema.Parser().parse(schemaJson)
      rows.map(r => (new AvroKey(rowToRecord(r, schema)), NullWritable.get))
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  private[sources] def toAvroSchema(dt: DataType, name: String): AvroSchema =
    dt match {
      case st: StructType =>
        val fields = new java.util.ArrayList[AvroSchema.Field]()
        st.fields.foreach { f =>
          val base = toAvroSchema(f.dataType, s"${name}_${f.name}")
          val fs =
            if (f.nullable)
              AvroSchema.createUnion(
                AvroSchema.create(AvroSchema.Type.NULL), base)
            else base
          val default: Object =
            if (f.nullable) AvroSchema.Field.NULL_DEFAULT_VALUE else null
          fields.add(new AvroSchema.Field(f.name, fs, null, default))
        }
        AvroSchema.createRecord(name, null, "graft.avro", false, fields)
      case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType =>
        AvroSchema.create(AvroSchema.Type.INT)
      case LongType    => AvroSchema.create(AvroSchema.Type.LONG)
      case FloatType   => AvroSchema.create(AvroSchema.Type.FLOAT)
      case DoubleType  => AvroSchema.create(AvroSchema.Type.DOUBLE)
      case StringType  => AvroSchema.create(AvroSchema.Type.STRING)
      case BinaryType  => AvroSchema.create(AvroSchema.Type.BYTES)
      case TimestampType =>
        org.apache.avro.LogicalTypes.timestampMicros()
          .addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
      case DateType =>
        org.apache.avro.LogicalTypes.date()
          .addToSchema(AvroSchema.create(AvroSchema.Type.INT))
      case ArrayType(et, containsNull) =>
        val base = toAvroSchema(et, s"${name}_item")
        AvroSchema.createArray(
          if (containsNull) AvroSchema.createUnion(
            AvroSchema.create(AvroSchema.Type.NULL), base)
          else base)
      case MapType(StringType, vt, valueContainsNull) =>
        val base = toAvroSchema(vt, s"${name}_value")
        AvroSchema.createMap(
          if (valueContainsNull) AvroSchema.createUnion(
            AvroSchema.create(AvroSchema.Type.NULL), base)
          else base)
      case other => throw new UnsupportedOperationException(
        s"AvroStorage: unsupported Spark type $other (decimal and " +
        "non-string-keyed maps are intentionally not mapped)")
    }

  private def rowToRecord(row: Row, schema: AvroSchema): GenericRecord = {
    val b = new GenericRecordBuilder(schema)
    schema.getFields.asScala.foreach { f =>
      val i = row.fieldIndex(f.name)
      val v = if (row.isNullAt(i)) null
              else sparkValue(row.get(i),
                if (isNullable(f.schema())) nonNullBranch(f.schema()).get
                else f.schema())
      b.set(f, v)
    }
    b.build()
  }

  private def sparkValue(v: Any, s: AvroSchema): Any = v match {
    case null => null
    case r: Row => rowToRecord(r, s)
    case ts: java.sql.Timestamp =>
      ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L
    case ts: java.time.Instant =>
      ts.getEpochSecond * 1000000L + ts.getNano / 1000L
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case bytes: Array[Byte] => java.nio.ByteBuffer.wrap(bytes)
    case seq: scala.collection.Seq[_] =>
      val elem =
        if (s.getElementType.getType == AvroSchema.Type.UNION)
          nonNullBranch(s.getElementType).get
        else s.getElementType
      seq.map(sparkValue(_, elem)).asJava
    case m: scala.collection.Map[_, _] =>
      val vt =
        if (s.getValueType.getType == AvroSchema.Type.UNION)
          nonNullBranch(s.getValueType).get
        else s.getValueType
      m.map { case (k, mv) => k.toString -> sparkValue(mv, vt) }.toMap.asJava
    case b: Byte => b.toInt
    case sh: Short => sh.toInt
    case other => other
  }
}
