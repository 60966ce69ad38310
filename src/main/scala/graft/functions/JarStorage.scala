package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.{RecordReader, RecordWriter, TaskAttemptContext}
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import org.apache.pig.{LoadFunc, StoreFuncInterface}
import org.apache.pig.data.{DataBag, DataByteArray, Tuple}

/** Registered-jar LoadFunc/StoreFunc bridge (reference: LoadFunc.java
  * :64 + StoreFuncInterface.java; PigServer.registerJar makes them
  * callable from `LOAD/STORE ... USING userClass()`). Two load paths:
  * the LINE-ORIENTED family (getInputFormat() is TextInputFormat or a
  * subclass — PigStorage-derived and text-record loaders, the shape
  * user jars overwhelmingly take) rides the engine's own text scan;
  * everything else (SequenceFile-backed and other binary loaders)
  * drives the loader's OWN InputFormat via newAPIHadoopRDD
  * ([[loadThroughFormat]], r11).
  *
  * Scale shape: the loader runs INSIDE mapPartitions over a
  * distributed scan — per-split parallel, no driver funnel; the store
  * side likewise renders per partition into a distributed text write.
  * One single-record probe fixes the schemaless column count (skipped
  * entirely when the script gives an AS schema).
  */
object JarStorage extends Serializable {

  def canLoad(registry: JarUdfs.Registry, name: String): Boolean =
    assignable(registry, name, classOf[LoadFunc])

  def canStore(registry: JarUdfs.Registry, name: String): Boolean =
    assignable(registry, name, classOf[StoreFuncInterface])

  private def assignable(registry: JarUdfs.Registry, name: String,
                         want: Class[_]): Boolean =
    JarUdfs.resolveClass(registry, name).exists { case (jar, ver, cls) =>
      try want.isAssignableFrom(
        Class.forName(cls, false, JarUdfs.loaderFor(jar, ver)))
      catch { case _: Throwable => false }
    }

  /** LOAD through a jar LoadFunc: drive the user loader per partition
    * over `lines` (the interpreter supplies the text scan — or a text
    * RENDERING when the path holds this engine's parquet
    * intermediates, since the reference's default intermediate format
    * was PigStorage text). All columns surface as text (`_cN`,
    * bytearray rule); the interpreter's AS-schema pass renames/casts.
    * `declaredWidth` (the AS arity) skips the schemaless width probe. */
  def load(spark: SparkSession, registry: JarUdfs.Registry,
           lines: org.apache.spark.sql.Dataset[String], name: String,
           ctorArgs: Seq[String], declaredWidth: Option[Int],
           location: String): DataFrame = {
    val inv = invokerFor(registry, name, ctorArgs)
    // lifecycle contract (LoadFunc.java:103-149): setLocation first
    // (loaders derive state from the path), then getInputFormat, then
    // prepareToRead, then getNext until null
    def openLoader(it: Iterator[String]): LoadFunc = {
      val lf = inv.newLoadFunc()
      lf.setLocation(location, scratchJob())
      lf.prepareToRead(feedReader(it), pigSplit())
      lf
    }
    val probe = inv.newLoadFunc()
    probe.setLocation(location, scratchJob())
    val fmt = try probe.getInputFormat catch { case _: Exception => null }
    // a self-describing loader (LoadMetadata.getSchema) supplies field
    // names + types when the script has no AS clause — the reference's
    // front-end schema path
    val metaSchema: Option[Seq[(String, Byte)]] =
      if (declaredWidth.isDefined) None
      else probe match {
        case lm: org.apache.pig.LoadMetadata =>
          // a getSchema FAILURE is a front-end error in the reference —
          // surfacing it beats silently degrading to untyped _cN
          // columns and a confusing downstream name-resolution error
          val rs = try Option(lm.getSchema(location, scratchJob()))
            catch {
              case e: Exception => throw new IllegalArgumentException(
                s"LOAD USING $name: LoadMetadata.getSchema failed for " +
                s"'$location': ${e.getMessage}", e)
            }
          rs.map(_.getFields.toSeq.zipWithIndex.map { case (f, i) =>
              (Option(f.getName).getOrElse(s"_c$i"), f.getType)
            }).filter(_.nonEmpty)
        case _ => None
      }
    val base =
      if (fmt != null && !fmt.isInstanceOf[TextInputFormat])
        // non-text loader: drive its OWN InputFormat (generic path)
        loadThroughFormat(spark, inv, fmt, location,
          declaredWidth.orElse(metaSchema.map(_.length)))
      else {
        val width = declaredWidth.orElse(metaSchema.map(_.length))
          .getOrElse {
            // schemaless: one line through a driver-local loader
            // instance fixes the column count (Pig's tuples are
            // variable-width; a DataFrame's are not — first-record
            // arity is the contract here)
            lines.take(1).headOption
              .flatMap(l =>
                Option(openLoader(Iterator.single(l)).getNext()))
              .map(_.size).getOrElse(1)
          }
        val rows = lines.rdd.mapPartitions(it =>
          tupleRows(openLoader(it), width))
        spark.createDataFrame(rows, textSchema(width))
      }
    metaSchema match {
      case Some(fs) =>
        import org.apache.spark.sql.functions.col
        base.select(fs.zipWithIndex.map { case ((n, t), i) =>
          val typeName = org.apache.pig.data.DataType.findTypeName(t)
          val meta = new org.apache.spark.sql.types.MetadataBuilder()
            .putString("pig_type", typeName).build()
          castScalar(col(s"_c$i"), t).as(n, meta)
        }: _*)
      case None => base
    }
  }

  /** Drive a NON-text jar loader through its OWN InputFormat
    * (reference: P/LoadFunc.java:103-149 makes no text assumption —
    * SequenceFile-backed and other binary loaders are legal). The
    * format itself runs distributed via `newAPIHadoopRDD` (per-split
    * parallel, exactly the reference's map-side split model), and each
    * partition's (key, value) stream replays into the loader's
    * prepareToRead/getNext lifecycle through a RecordReader facade —
    * the loader sees the same reader surface the reference's
    * PigRecordReader gives it. No driver funnel: the only driver work
    * is split computation, which Hadoop does for any scale of input. */
  private def loadThroughFormat(spark: SparkSession, inv: Invoker,
      fmt: org.apache.hadoop.mapreduce.InputFormat[_, _], location: String,
      knownWidth: Option[Int]): DataFrame = {
    // the SESSION's Hadoop conf (spark.hadoop.* settings — fs
    // credentials, defaultFS — must reach the format, same as the
    // engine's own scans); the loader's setLocation then configures
    // the job, and if it didn't set input paths, point the format at
    // `location`. NOTE the format CLASS is re-instantiated per task by
    // reflection (Hadoop's own job.setInputFormatClass contract), so a
    // loader's format must carry its configuration in the job conf,
    // not in instance fields — true of every mainline Hadoop format.
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration))
    inv.newLoadFunc().setLocation(location, job)
    if (job.getConfiguration
        .get("mapreduce.input.fileinputformat.inputdir") == null)
      org.apache.hadoop.mapreduce.lib.input.FileInputFormat
        .setInputPaths(job, location)
    val fmtCls = fmt.getClass.asInstanceOf[
      Class[org.apache.hadoop.mapreduce.InputFormat[AnyRef, AnyRef]]]
    val kv = spark.sparkContext.newAPIHadoopRDD(job.getConfiguration,
      fmtCls, classOf[AnyRef], classOf[AnyRef])
    def open(it: Iterator[(AnyRef, AnyRef)]): LoadFunc = {
      val lf = inv.newLoadFunc()
      lf.setLocation(location, scratchJob())
      lf.prepareToRead(replayReader(it), pigSplit())
      lf
    }
    val width = knownWidth.getOrElse {
      // width probe runs ON AN EXECUTOR: Writable records are not
      // java-serializable, so only the first tuple's arity ships back
      kv.mapPartitions { it =>
        val lf = open(it)
        Option(lf.getNext()).map(_.size).iterator
      }.take(1).headOption.getOrElse(1)
    }
    val rows = kv.mapPartitions(it => tupleRows(open(it), width))
    spark.createDataFrame(rows, textSchema(width))
  }

  /** getNext() until null → width-padded text Rows (both load paths). */
  private def tupleRows(lf: LoadFunc, width: Int): Iterator[Row] =
    Iterator.continually(lf.getNext()).takeWhile(_ != null).map { t =>
      val vals = t.getAll.asScala
      Row((0 until width).map(i =>
        if (i < vals.length) leafText(vals(i)) else null): _*)
    }

  private def textSchema(width: Int): StructType =
    StructType((0 until width).map(i => StructField(s"_c$i", StringType)))

  /** RecordReader facade replaying an already-driven (key, value)
    * stream — what a generic-format loader's getNext() pulls from. */
  private def replayReader(it: Iterator[(AnyRef, AnyRef)])
      : RecordReader[AnyRef, AnyRef] =
    new RecordReader[AnyRef, AnyRef] {
      private var cur: (AnyRef, AnyRef) = _
      override def initialize(
          split: org.apache.hadoop.mapreduce.InputSplit,
          ctx: TaskAttemptContext): Unit = ()
      override def nextKeyValue(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def getCurrentKey: AnyRef = cur._1
      override def getCurrentValue: AnyRef = cur._2
      override def getProgress: Float = 0f
      override def close(): Unit = ()
    }

  /** Scalar cast for a LoadMetadata-declared type code; complex types
    * stay as their Pig-literal text (the engine-wide bytearray rule —
    * the LoadCaster parses them on first complex use). */
  private def castScalar(c: org.apache.spark.sql.Column,
                         t: Byte): org.apache.spark.sql.Column = {
    import org.apache.pig.data.{DataType => P}
    t match {
      case P.INTEGER => c.cast(org.apache.spark.sql.types.IntegerType)
      case P.LONG    => c.cast(org.apache.spark.sql.types.LongType)
      case P.FLOAT   => c.cast(org.apache.spark.sql.types.FloatType)
      case P.DOUBLE  => c.cast(org.apache.spark.sql.types.DoubleType)
      case P.BOOLEAN => c.cast(org.apache.spark.sql.types.BooleanType)
      case _         => c
    }
  }

  /** STORE through a jar StoreFunc: rows become tuples, the storer's
    * putNext writes through a collecting writer, lines land as a
    * distributed text write. */
  def store(df: DataFrame, path: String, registry: JarUdfs.Registry,
            name: String, ctorArgs: Seq[String]): Unit = {
    val inv = invokerFor(registry, name, ctorArgs)
    val probe = inv.newStoreFunc() // plan-time class check
    val outFmt =
      try {
        probe.setStoreLocation(path, scratchJob())
        probe.getOutputFormat
      } catch { case _: Exception => null }
    if (outFmt != null && !outFmt.isInstanceOf[
        org.apache.hadoop.mapreduce.lib.output.TextOutputFormat[_, _]]) {
      storeThroughFormat(df, path, inv, outFmt)
      return
    }
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.rdd.mapPartitions { rows =>
      val sf = inv.newStoreFunc()
      // lifecycle contract (StoreFuncInterface): setStoreLocation, then
      // prepareToWrite, then putNext per tuple; close the writer at
      // partition end so a batching storer's tail is not dropped
      sf.setStoreLocation(path, scratchJob())
      // the tuple line delimiter belongs to the STORER (PigStorage's
      // fieldDel), never a positional ctor-arg guess — a storer whose
      // first arg is a format flag must not see it as a separator
      val delim = sf match {
        case ps: org.apache.pig.builtin.PigStorage =>
          (ps.getFieldDel & 0xff).toChar.toString
        case _ => "\t"
      }
      val w = new CollectingWriter(delim)
      sf.prepareToWrite(w)
      rows.flatMap { r =>
        sf.putNext(org.apache.pig.data.TupleFactory.getInstance()
          .newTuple(r.toSeq.map(v =>
            JarUdfs.toPig(v.asInstanceOf[AnyRef])).asJava))
        w.drain()
      } ++ Iterator.single(()).flatMap { _ => w.close(null); w.drain() }
    }
    spark.createDataset(lines).write.mode("overwrite").text(path)
  }

  /** STORE through a storer with its OWN (non-text) OutputFormat
    * (reference: StoreFuncInterface.getOutputFormat makes no text
    * assumption — SequenceFile-backed storers are legal). Inversion of
    * control: per partition, putNext writes into a CAPTURING writer
    * whose (key, value) stream becomes the RDD's pairs, and
    * saveAsNewAPIHadoopDataset then drives the real OutputFormat —
    * commit protocol, speculative-task safety, and file naming all
    * come from the Hadoop committer, exactly as the reference's
    * reduce-side store. No shuffle: the capture and the write share
    * one stage. */
  private def storeThroughFormat(df: DataFrame, path: String,
      inv: Invoker,
      fmt: org.apache.hadoop.mapreduce.OutputFormat[_, _]): Unit = {
    // session Hadoop conf, and class-not-instance reflection, as in
    // loadThroughFormat — storer OutputFormats must be job-conf
    // configured (the Hadoop job.setOutputFormatClass contract)
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      new org.apache.hadoop.conf.Configuration(
        df.sparkSession.sparkContext.hadoopConfiguration))
    inv.newStoreFunc().setStoreLocation(path, job)
    val conf = job.getConfiguration
    val outPath = new org.apache.hadoop.fs.Path(path)
    if (conf.get("mapreduce.output.fileoutputformat.outputdir") == null)
      org.apache.hadoop.mapreduce.lib.output.FileOutputFormat
        .setOutputPath(job, outPath)
    job.setOutputFormatClass(fmt.getClass.asInstanceOf[
      Class[_ <: org.apache.hadoop.mapreduce.OutputFormat[_, _]]])
    // key/value classes (SequenceFile headers record them): the
    // storer's setStoreLocation usually sets them; if not, probe one
    // row driver-side and use the written pair's classes
    if (conf.get("mapreduce.job.output.key.class") == null)
      df.take(1).headOption.foreach { r =>
        capturePairs(inv, path, Iterator.single(r)).toVector.headOption
          .foreach { case (k, v) =>
            // a null component defaults to NullWritable, the Hadoop
            // convention for keyless/valueless records
            job.setOutputKeyClass(if (k == null)
              classOf[org.apache.hadoop.io.NullWritable] else k.getClass)
            job.setOutputValueClass(if (v == null)
              classOf[org.apache.hadoop.io.NullWritable] else v.getClass)
          }
      }
    // STORE overwrites (engine-wide contract; the Hadoop committer
    // refuses an existing dir)
    val fs = outPath.getFileSystem(conf)
    if (fs.exists(outPath)) fs.delete(outPath, true)
    val kv = df.rdd.mapPartitions(rows => capturePairs(inv, path, rows))
    new org.apache.spark.rdd.PairRDDFunctions(kv)
      .saveAsNewAPIHadoopDataset(conf)
  }

  /** Drive putNext over `rows` with a capturing RecordWriter; yields
    * the (key, value) pairs the storer wrote, streamed per row.
    * Writables are CLONED into the buffer: the standard Hadoop
    * set-then-write pattern reuses one Writable across write() calls
    * (a real RecordWriter serializes on each write), so holding the
    * caller's reference would alias every buffered pair to the last
    * value. */
  private def capturePairs(inv: Invoker, path: String,
      rows: Iterator[Row]): Iterator[(AnyRef, AnyRef)] = {
    val sf = inv.newStoreFunc()
    sf.setStoreLocation(path, scratchJob())
    val cloneConf = new org.apache.hadoop.conf.Configuration()
    def snap(x: AnyRef): AnyRef = x match {
      case w: org.apache.hadoop.io.Writable =>
        org.apache.hadoop.util.ReflectionUtils.copy(cloneConf, w,
          org.apache.hadoop.util.ReflectionUtils
            .newInstance(w.getClass, cloneConf))
      case other => other
    }
    val buf = scala.collection.mutable.ArrayBuffer.empty[(AnyRef, AnyRef)]
    val w = new RecordWriter[AnyRef, AnyRef] {
      override def write(k: AnyRef, v: AnyRef): Unit =
        buf += ((snap(k), snap(v)))
      override def close(ctx: TaskAttemptContext): Unit = ()
    }
    sf.prepareToWrite(w)
    rows.flatMap { r =>
      sf.putNext(org.apache.pig.data.TupleFactory.getInstance()
        .newTuple(r.toSeq.map(v =>
          JarUdfs.toPig(v.asInstanceOf[AnyRef])).asJava))
      val out = buf.toVector; buf.clear(); out.iterator
    }
  }

  /** A throwaway Hadoop Job for the setLocation/setStoreLocation
    * contract calls — loaders configure it, the engine reads nothing
    * back (the text scan is the engine's own). */
  private def scratchJob(): org.apache.hadoop.mapreduce.Job =
    org.apache.hadoop.mapreduce.Job.getInstance(
      new org.apache.hadoop.conf.Configuration(false))

  private def pigSplit() =
    new org.apache.pig.backend.hadoop.executionengine.mapReduceLayer.PigSplit()

  /** RecordReader over an in-memory line iterator — what the user
    * loader's getNext() pulls from (nextKeyValue/getCurrentValue). */
  private def feedReader(it: Iterator[String])
      : RecordReader[LongWritable, Text] =
    new RecordReader[LongWritable, Text] {
      private val key = new LongWritable(-1)
      private val value = new Text()
      override def initialize(split: org.apache.hadoop.mapreduce.InputSplit,
                              ctx: TaskAttemptContext): Unit = ()
      override def nextKeyValue(): Boolean =
        if (it.hasNext) {
          key.set(key.get + 1); value.set(it.next()); true
        } else false
      override def getCurrentKey: LongWritable = key
      override def getCurrentValue: Text = value
      override def getProgress: Float = 0f
      override def close(): Unit = ()
    }

  /** RecordWriter the storer writes through: tuples render as the
    * PigTextOutputFormat line (fields joined by the storer's
    * delimiter, nested values in Pig literal syntax); raw text passes
    * through. */
  private final class CollectingWriter(delim: String)
      extends RecordWriter[AnyRef, AnyRef] {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    override def write(k: AnyRef, v: AnyRef): Unit = buf += (v match {
      case t: Tuple =>
        t.getAll.asScala.map(f => pigText(f.asInstanceOf[AnyRef]))
          .mkString(delim)
      case other => leafText(other)
    })
    override def close(ctx: TaskAttemptContext): Unit = ()
    def drain(): Seq[String] = {
      val out = buf.toVector; buf.clear(); out
    }
  }

  /** Top-level field rendering: bytearray/string raw; nested complex
    * values in Pig literal syntax (StorageUtil.putField). */
  private def pigText(v: AnyRef): String = v match {
    case null => ""
    case b: DataByteArray => b.toString
    case t: Tuple => t.getAll.asScala
      .map(f => pigText(f.asInstanceOf[AnyRef])).mkString("(", ",", ")")
    case b: DataBag => b.asScala.map(pigText).mkString("{", ",", "}")
    case m: java.util.Map[_, _] => m.asScala
      .map { case (k, x) => s"$k#${pigText(x.asInstanceOf[AnyRef])}" }
      .mkString("[", ",", "]")
    case other => String.valueOf(other)
  }

  /** Leaf conversion at the LOAD boundary (bytearray-as-string). */
  private def leafText(v: AnyRef): String = v match {
    case null => null
    case b: DataByteArray => b.toString
    case t: Tuple => pigText(t)
    case b: DataBag => pigText(b)
    case other => String.valueOf(other)
  }

  private def invokerFor(registry: JarUdfs.Registry, name: String,
                         ctorArgs: Seq[String]): Invoker = {
    val (jarInfo, cls) = JarUdfs.resolveClass(registry, name)
      .map { case (jar, ver, c) => (Some((jar, ver)), c) }
      .getOrElse((None, name))
    Invoker(jarInfo, cls, ctorArgs)
  }

  /** Serializable per-partition instantiation bridge (same shape as
    * JarUdfs.Invoker — loaders/storers keep per-instance state, one
    * instance per partition). */
  private final case class Invoker(jarInfo: Option[(String, String)],
                                   cls: String, ctorArgs: Seq[String]) {
    private def instantiate(): AnyRef =
      JarUdfs.instantiateUserClass(jarInfo, cls, ctorArgs)
    def newLoadFunc(): LoadFunc = instantiate() match {
      case lf: LoadFunc => lf
      case other => throw new IllegalArgumentException(
        s"$cls is not a LoadFunc (got ${other.getClass.getName})")
    }
    def newStoreFunc(): StoreFuncInterface = instantiate() match {
      case sf: StoreFuncInterface => sf
      case other => throw new IllegalArgumentException(
        s"$cls is not a StoreFunc (got ${other.getClass.getName})")
    }
  }
}
