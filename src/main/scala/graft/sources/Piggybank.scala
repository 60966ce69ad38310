package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Piggybank storage ports beyond CSVExcelStorage/XMLLoader (reference:
  * contrib/piggybank/java/src/main/java/org/apache/pig/piggybank/storage/).
  * Each is re-expressed as pure DataFrame plumbing — the parse work stays
  * inside whole-stage codegen (substring/regexp on a text scan), so a scan
  * stays splittable and pushdown-friendly at any scale.
  */
object Piggybank {

  // ------------------------------------------------------------ FixedWidth

  /** One 0-indexed [start, end) slice of the line. */
  final case class FixedWidthField(start: Int, end: Int)

  /** Column spec parser (reference: FixedWidthLoader.java:176
    * parseColumnSpec): comma-separated 1-indexed inclusive ranges —
    * `"-5, 7-10, 14, 17-"` = [1,5], [7,10], [14,14], [17,∞). */
  def parseColumnSpec(spec: String): Seq[FixedWidthField] =
    spec.split(",").toSeq.map(_.trim).map { range =>
      if (range.contains("-")) {
        val Array(a, b) = range.split("-", 2).map(_.trim)
        val start = if (a.isEmpty) 0 else a.toInt - 1
        val end   = if (b.isEmpty) Int.MaxValue else b.toInt
        require(start >= 0 && start < end,
          s"Illegal column spec '$range': start must be >=1 and < end")
        FixedWidthField(start, end)
      } else {
        val off = range.toInt - 1
        require(off >= 0,
          s"Illegal column spec '$range': columns are 1-indexed")
        FixedWidthField(off, off + 1)
      }
    }

  /** FixedWidthLoader('<spec>'[, 'SKIP_HEADER'][, schema]) (reference:
    * FixedWidthLoader.java:129): slice each line into columns. A column
    * short of the line's end yields null (the reference pads/nulls absent
    * fields); values are trimmed before the cast, like the reference's
    * per-type conversions.
    *
    * Divergence: positions index CHARACTERS here, not bytes — the
    * reference slices the raw byte[] of the line, so multi-byte UTF-8
    * content shifts column boundaries there. Character indexing is the
    * less surprising behavior for text data; ASCII fixed-width files
    * (the format's normal habitat) are identical either way. */
  def fixedWidthLoad(spark: SparkSession, path: String, columnSpec: String,
                     skipHeader: Boolean = false,
                     schema: Option[StructType] = None): DataFrame = {
    val fields = parseColumnSpec(columnSpec)
    // SKIP_HEADER drops the first line of each FILE (reference: skip the
    // first record of split 0, FixedWidthLoader.java:142). The Hadoop text
    // reader keys each line by its byte offset in the file, and offset 0 is
    // exactly the first line of each file — a deterministic, shuffle-free,
    // single-scan filter (monotonically_increasing_id-based approaches are
    // partition-layout-dependent and can drop the wrong row under AQE or
    // speculation).
    val raw = if (!skipHeader) spark.read.text(path) else {
      import org.apache.hadoop.io.{LongWritable, Text}
      import org.apache.hadoop.mapred.TextInputFormat
      val rdd = spark.sparkContext
        .hadoopFile(path, classOf[TextInputFormat],
          classOf[LongWritable], classOf[Text])
        .filter { case (off, _) => off.get != 0L }
        .map { case (_, t) => org.apache.spark.sql.Row(t.toString) }
      spark.createDataFrame(rdd,
        StructType(Seq(StructField("value", StringType))))
    }
    val cols: Seq[Column] = fields.zipWithIndex.map { case (f, i) =>
      val len = if (f.end == Int.MaxValue) Int.MaxValue - f.start
                else f.end - f.start
      val sliced = trim(substring(col("value"), f.start + 1, len))
      val named = schema.flatMap(s => s.fields.lift(i)) match {
        case Some(sf) => when(length(col("value")) > f.start, sliced)
          .cast(sf.dataType).as(sf.name)
        case None => when(length(col("value")) > f.start, sliced)
          .as(s"f${i + 1}")
      }
      named
    }
    raw.select(cols: _*)
  }

  // --------------------------------------------------------------- RegEx

  /** RegExLoader / MyRegExLoader('pattern') (reference: RegExLoader.java:44,
    * MyRegExLoader.java): each line matching the pattern (unanchored
    * `find()`, like the reference at RegExLoader.java:64) yields one row
    * with one column per capture group; non-matching lines are skipped
    * (the reference's getNext loops past them). Group count is taken from
    * the compiled pattern, so the output schema is static.
    *
    * A capture group that did not participate in the match (an optional
    * group) yields NULL, matching the reference's `matcher.group(i)` —
    * `regexp_extract` would return '' there, conflating it with an
    * empty-string match. One compiled match per line (the builtin route
    * costs nGroups+1 regex passes), at the price of a udf boundary —
    * acceptable on a loader cold path. */
  def regexLoad(spark: SparkSession, path: String, pattern: String): DataFrame = {
    val nGroups = java.util.regex.Pattern.compile(pattern).matcher("").groupCount()
    require(nGroups > 0, s"RegExLoader pattern has no capture groups: $pattern")
    val extract = udf(new org.apache.spark.sql.api.java.UDF1[String, Array[String]] {
      @transient private lazy val pat = java.util.regex.Pattern.compile(pattern)
      def call(line: String): Array[String] = {
        if (line == null) return null
        val m = pat.matcher(line)
        if (!m.find()) null
        else Array.tabulate(nGroups)(i => m.group(i + 1))
      }
    }, ArrayType(StringType))
    spark.read.text(path)
      .select(extract(col("value")).as("__g"))
      .filter(col("__g").isNotNull)
      .select((1 to nGroups).map(g => col("__g").getItem(g - 1).as(s"f$g")): _*)
  }

  // --------------------------------------------------------- MultiStorage

  /** MultiStorage('parent', splitField[, compression[, fieldDel]])
    * (reference: MultiStorage.java:102): write delimited text partitioned
    * by one field's value — one directory per distinct value. Spark's
    * `partitionBy` is the native equivalent (dir layout `field=value/`
    * vs the reference's `value/value-taskid`; the column round-trips via
    * partition discovery instead of being repeated in every record —
    * strictly better at scale, and `basePath` reads restore it). */
  def multiStore(df: DataFrame, parentPath: String, splitField: String,
                 compression: String = "none",
                 fieldDel: String = "\t"): Unit = {
    val codec = compression.toLowerCase match {
      case "none" => None
      case "gz" | "gzip" => Some("gzip")
      case "bz2" | "bzip2" => Some("bzip2")
      case other => throw new IllegalArgumentException(
        s"MultiStorage compression '$other' (none|gz|bz2)")
    }
    val w = df.write.mode("overwrite").partitionBy(splitField)
      .option("sep", fieldDel)
    codec.fold(w)(c => w.option("compression", c)).csv(parentPath)
  }

  // ----------------------------------------------------- SequenceFile

  /** SequenceFileLoader (reference: SequenceFileLoader.java:59): read
    * Hadoop SequenceFiles of Writable key/value pairs as a 2-column
    * DataFrame. Key/value classes come from the first file's header (read
    * once on the driver); each task then converts its split's Writables —
    * Text→string, Int/Long/Float/Double/Boolean-Writable→primitive,
    * BytesWritable→binary, NullWritable→null. */
  def sequenceFileLoad(spark: SparkSession, path: String): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    import org.apache.hadoop.io._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new HPath(path)
    val fs = FileSystem.get(p.toUri, conf)
    val first = {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .sortBy(_.getName).headOption.getOrElse(
            throw new IllegalArgumentException(s"no sequence files under $path"))
      else p
    }
    val (kc, vc) = {
      val r = new SequenceFile.Reader(conf, SequenceFile.Reader.file(first))
      try (r.getKeyClass, r.getValueClass) finally r.close()
    }
    def sparkType(c: Class[_]): DataType = c match {
      case x if x == classOf[Text] => StringType
      case x if x == classOf[IntWritable] => IntegerType
      case x if x == classOf[LongWritable] => LongType
      case x if x == classOf[FloatWritable] => FloatType
      case x if x == classOf[DoubleWritable] => DoubleType
      case x if x == classOf[BooleanWritable] => BooleanType
      case x if x == classOf[ByteWritable] => ByteType
      case x if x == classOf[BytesWritable] => BinaryType
      case x if x == classOf[NullWritable] => NullType
      case other => throw new IllegalArgumentException(
        s"unsupported SequenceFile Writable ${other.getName} " +
        "(Text, {Int,Long,Float,Double,Boolean,Byte,Bytes,Null}Writable)")
    }
    val schema = StructType(Seq(
      StructField("key", sparkType(kc)), StructField("value", sparkType(vc))))
    // convert on executors; Writables are REUSED by the record reader, so
    // every value must be copied out before the iterator advances
    def conv(w: Writable): Any = w match {
      case t: Text => t.toString
      case i: IntWritable => i.get
      case l: LongWritable => l.get
      case f: FloatWritable => f.get
      case d: DoubleWritable => d.get
      case b: BooleanWritable => b.get
      case b: ByteWritable => b.get
      case b: BytesWritable => java.util.Arrays.copyOf(b.getBytes, b.getLength)
      case _: NullWritable => null
      case other => other.toString
    }
    val rdd = spark.sparkContext
      .sequenceFile(path, kc.asInstanceOf[Class[Writable]],
        vc.asInstanceOf[Class[Writable]])
      .map { case (k, v) => org.apache.spark.sql.Row(conv(k), conv(v)) }
    spark.createDataFrame(rdd, schema)
  }

  // ------------------------------------------------ HiveColumnar (RCFile)

  /** HiveColumnarLoader('f1 type, f2 type, …') (reference:
    * contrib/piggybank/.../storage/HiveColumnarLoader.java): read
    * RCFile columnar data with a declared schema. RCFile row groups
    * store values column-wise with lazy per-column decompression (the
    * `BytesRefArrayWritable` container); values are the text-lazy
    * ColumnarSerDe encoding with `\N` nulls — exactly what
    * [[hiveColumnarStore]] writes. Decoding happens on executors; each
    * value is copied into a String before the record reader reuses its
    * Writables. Casts follow Pig load semantics (failure → null;
    * ansi=false). The reference's partition-path handling and
    * read-column pruning (`hive.io.file.readcolumn.ids`) are out of
    * scope — the whole declared width reads, AS narrows after. */
  def hiveColumnarLoad(spark: SparkSession, path: String,
                       schemaStr: String): DataFrame = {
    import org.apache.hadoop.hive.ql.io.RCFileInputFormat
    import org.apache.hadoop.hive.serde2.columnar.BytesRefArrayWritable
    import org.apache.hadoop.io.LongWritable
    val fields = parseHiveSchema(schemaStr)
    val n = fields.length
    val conf = new org.apache.hadoop.mapred.JobConf(
      spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.mapred.FileInputFormat.setInputPaths(conf, path)
    val rdd = spark.sparkContext.hadoopRDD(conf,
        classOf[RCFileInputFormat[LongWritable, BytesRefArrayWritable]],
        classOf[LongWritable], classOf[BytesRefArrayWritable],
        spark.sparkContext.defaultParallelism)
      .map { case (_, v) =>
        org.apache.spark.sql.Row((0 until n).map { i =>
          if (i >= v.size) null
          else {
            val br = v.get(i)
            val s = new String(br.getData, br.getStart, br.getLength,
              java.nio.charset.StandardCharsets.UTF_8)
            if (s == "\\N") null else s
          }
        }: _*)
      }
    val raw = spark.createDataFrame(rdd,
      StructType(fields.map(f => StructField(f._1, StringType))))
    raw.select(fields.map { case (name, tpe) =>
      col(name).cast(hiveType(tpe)).as(name) }: _*)
  }

  /** HiveColumnarStorage analog (reference:
    * contrib/piggybank/.../storage/HiveColumnarStorage.java): write a
    * DataFrame as RCFile with the text ColumnarSerDe encoding, `\N`
    * nulls — readable by Hive, real Pig's loader, and
    * [[hiveColumnarLoad]]. */
  def hiveColumnarStore(df: DataFrame, path: String): Unit = {
    import org.apache.hadoop.hive.ql.io.{RCFile, RCFileOutputFormat}
    import org.apache.hadoop.hive.serde2.columnar.{BytesRefArrayWritable, BytesRefWritable}
    val spark = df.sparkSession
    val n = df.columns.length
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    // overwrite semantics like every other STORE here
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).mkdirs(p.getParent)
    val pfs = p.getFileSystem(conf)
    if (pfs.exists(p)) pfs.delete(p, true)
    pfs.mkdirs(p)
    RCFileOutputFormat.setColumnNumber(conf, n)
    // direct per-partition RCFile.Writer (RCFileOutputFormat's
    // getRecordWriter needs the MR task framework's work-output dir,
    // which Spark's old-API write path never provides): each partition
    // writes its own uniquely named file with create-overwrite, so a
    // retried task simply rewrites it; job-level idempotence comes
    // from the delete-then-write above
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    // render every column to its text encoding FIRST (codegen'd), so
    // the partition loop only shuttles strings into Writables
    val texts = df.select(df.columns.map(c =>
      col(c).cast(StringType)).toIndexedSeq: _*)
    texts.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.hasNext) {
        val c = bc.value.value
        val dir = new org.apache.hadoop.fs.Path(path)
        val fs = dir.getFileSystem(c)
        // write to a per-ATTEMPT dot-file (invisible to readers), then
        // rename into place: concurrent/speculative attempts can never
        // interleave into one final file — the first rename wins,
        // losers delete their own tmp (HDFS rename-to-existing fails;
        // local-FS overwrite replaces with identical deterministic
        // content)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new org.apache.hadoop.fs.Path(dir,
          f".part-$pid%05d-a$attempt.rc.tmp")
        val fin = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.rc")
        val w = new RCFile.Writer(fs, c, tmp)
        try it.foreach { row =>
          val braw = new BytesRefArrayWritable(n)
          var i = 0
          while (i < n) {
            val bytes = (if (row.isNullAt(i)) "\\N" else row.getString(i))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            braw.set(i, new BytesRefWritable(bytes, 0, bytes.length))
            i += 1
          }
          w.append(braw)
        } finally w.close()
        if (!fs.rename(tmp, fin)) {
          // a rename can fail because a retried attempt already
          // published the file (fine — drop our tmp) or because of a
          // genuine FS error (NOT fine — deleting tmp would silently
          // lose the partition's rows); only the first is recoverable
          if (!fs.exists(fin))
            throw new java.io.IOException(
              s"hiveColumnarStore: rename $tmp -> $fin failed and the " +
                "destination does not exist — partition data would be lost")
          fs.delete(tmp, false)
        }
      }
      Iterator.empty
    }.count() // force the write job
    ()
  }

  /** "name type, name type" (the HiveColumnarLoader constructor
    * grammar) → (name, hive type) pairs. */
  def parseHiveSchema(s: String): Seq[(String, String)] =
    s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { f =>
      val parts = f.split("\\s+")
      require(parts.length == 2,
        s"HiveColumnarLoader schema field must be 'name type': '$f'")
      (parts(0), parts(1).toLowerCase)
    }

  private def hiveType(t: String): org.apache.spark.sql.types.DataType =
    t match {
      case "int" | "smallint" | "tinyint" => IntegerType
      case "bigint" | "long"              => LongType
      case "float"                        => FloatType
      case "double"                       => DoubleType
      case "boolean"                      => BooleanType
      case "string" | "chararray"         => StringType
      case other => throw new IllegalArgumentException(
        s"HiveColumnarLoader: unsupported type '$other' " +
          "(int/smallint/tinyint/bigint/float/double/boolean/string)")
    }

  // ----------------------------------------------------------- AllLoader

  /** `file.extension.loaders` mapping parser for the AllLoader analog
    * (reference: piggybank/storage/AllLoader.java:80): comma-separated
    * `[ext]:[loader func spec]` entries, where commas INSIDE a func
    * spec's parens don't split (`csv:PigStorage(','), json:JsonLoader`).
    * Func-spec arguments are Pig-quoted (single quotes). The
    * reference's optional path-tag and sequence-file-writer-class forms
    * are out of scope — the 2-part form covers the documented common
    * use. Returns ext → (loader name, args). */
  def parseExtensionLoaders(mapping: String)
      : Map[String, (String, Seq[String])] = {
    def splitTop(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      val cur = new StringBuilder
      var depth = 0
      var quoted = false
      var i = 0
      while (i < s.length) {
        s(i) match {
          // a backslash escape inside quotes consumes the next char
          // verbatim — an escaped \' must NOT toggle the quote state
          // (the arg regex below accepts it, the splitter must too)
          case '\\' if quoted && i + 1 < s.length =>
            cur += '\\'; cur += s(i + 1); i += 1
          case '\'' => quoted = !quoted; cur += '\''
          case '(' if !quoted => depth += 1; cur += '('
          case ')' if !quoted => depth -= 1; cur += ')'
          case ',' if depth == 0 && !quoted =>
            out += cur.result(); cur.clear()
          case c => cur += c
        }
        i += 1
      }
      if (cur.nonEmpty) out += cur.result()
      out.result().map(_.trim).filter(_.nonEmpty)
    }
    val specRe = """([\w.$]+)(?:\((.*)\))?""".r
    splitTop(mapping).map { entry =>
      val i = entry.indexOf(':')
      require(i > 0,
        s"AllLoader mapping entry must be ext:LoaderSpec — got '$entry'")
      val ext = entry.substring(0, i).trim.stripPrefix(".")
      entry.substring(i + 1).trim match {
        case specRe(name, null) => ext -> ((name, Seq.empty[String]))
        case specRe(name, argStr) =>
          // unescape like the main Pig lexer does (\' → ', \\ → \) so
          // the same loader spec means the same args via AllLoader as
          // via a direct USING clause
          val args = """'((?:[^'\\]|\\.)*)'""".r
            .findAllMatchIn(argStr)
            .map(_.group(1).replaceAll("""\\(.)""", "$1")).toSeq
          ext -> ((name, args))
        case other => throw new IllegalArgumentException(
          s"AllLoader: cannot parse loader spec '$other'")
      }
    }.toMap
  }
}
