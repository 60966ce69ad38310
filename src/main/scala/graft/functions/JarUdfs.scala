package graft.functions

import java.io.File
import java.net.URLClassLoader

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.api.java._
import org.apache.spark.sql.functions.call_udf
import org.apache.spark.sql.types._

import org.apache.pig.EvalFunc
import org.apache.pig.data.{BagFactory, DataBag, Tuple, TupleFactory}

/** REGISTER 'x.jar' support (reference: P/PigServer.java registerJar +
  * QueryParser.g REGISTER): user jars containing `EvalFunc` subclasses
  * compiled against the engine's `org.apache.pig` API facade are loaded
  * through a per-jar URLClassLoader and each UDF call site is bridged to
  * a Spark udf — `exec(Tuple)` per row, result type from the
  * `outputSchema` override when present, else the EvalFunc's generic
  * return type.
  *
  * Scale shape: `SparkContext.addJar` ships the jar to executors (the
  * cluster path); the invoker in the udf closure carries only strings
  * (jar path + class + ctor args) and re-resolves the class lazily
  * per executor thread — EvalFunc instances are NOT shared across
  * threads, matching the reference's one-instance-per-task contract.
  */
object JarUdfs {

  /** Per-script-session jar registrations, insertion-ordered (classpath
    * semantics: first-registered jar wins a bare-name tie) — owned by
    * each PigRunner, matching PyUdfs.Registry: the reference's
    * registerJar is PigServer-scoped, so a jar registered by one script
    * must not resolve in the next. Each entry carries a VERSION key
    * (size+mtime) so re-REGISTERing a rebuilt jar at the same path gets
    * a fresh scan and a fresh classloader instead of stale classes. */
  final class Registry {
    private[JarUdfs] val entries =
      new java.util.concurrent.CopyOnWriteArrayList[(String, String, Seq[String])]()
    def registeredJars: Seq[String] =
      entries.asScala.map(_._1).toSeq
  }

  /** Spark-side udf names already registered in a session (keyed by
    * session hash + udf name — a new session re-registers). */
  private val bound = TrieMap.empty[String, Unit]
  /** (verKey) → classloader: version-keyed so a rebuilt jar never
    * serves classes from its previous build. */
  private val loaders = TrieMap.empty[String, URLClassLoader]

  private def verKeyOf(f: File): String =
    s"${f.getAbsolutePath}|${f.length}|${f.lastModified}"

  private[graft] def loaderFor(jar: String, verKey: String): ClassLoader =
    loaders.getOrElseUpdate(verKey, new URLClassLoader(
      Array(new File(jar).toURI.toURL), classOf[EvalFunc[_]].getClassLoader))

  /** Handle `REGISTER 'path.jar'`: record + scan the jar and ship it to
    * executors. Missing file errors like the reference (ERROR 101). */
  def register(registry: Registry, spark: SparkSession, path: String): Unit = {
    val f = new File(path)
    if (!f.exists()) throw new IllegalArgumentException(
      s"ERROR 101: file '$path' does not exist.")
    val verKey = verKeyOf(f)
    if (!registry.entries.asScala.exists(_._2 == verKey)) {
      // drop a stale entry for the SAME path (rebuilt jar re-registered)
      // and evict+close its classloader — otherwise an edit-rebuild loop
      // leaks one loader + open jar handle per rebuild. close() only
      // blocks NEW class loading; already-loaded classes keep working,
      // so a still-running task from the old registration is unaffected.
      val stale = registry.entries.asScala.zipWithIndex
        .filter(_._1._1 == f.getAbsolutePath).toVector
      stale.map(_._2).reverse.foreach(i => registry.entries.remove(i))
      stale.map(_._1._2).foreach { oldVer =>
        loaders.remove(oldVer).foreach { l =>
          try l.close() catch { case _: Exception => () }
        }
      }
      // an unreadable/empty jar registers with zero classes (the
      // reference defers jar problems to class-load time too)
      val classes =
        try {
          val jf = new java.util.jar.JarFile(f)
          try jf.entries().asScala
            .map(_.getName)
            .filter(n => n.endsWith(".class") && !n.contains("$"))
            .map(_.stripSuffix(".class").replace('/', '.'))
            .toVector
          finally jf.close()
        } catch {
          case e: Exception =>
            System.err.println(s"[graft] REGISTER '$path': cannot scan jar " +
              s"(${e.getMessage}) — registered with no resolvable classes")
            Vector.empty
        }
      registry.entries.add((f.getAbsolutePath, verKey, classes)); ()
    }
    // cluster path: executors fetch the jar and add it to their
    // classloader; local mode resolves through the URLClassLoader
    try spark.sparkContext.addJar(f.getAbsolutePath)
    catch { case _: Exception => () } // already added
  }

  /** Every registered class matching `name` (FQN, or bare class name
    * in any case), in REGISTRATION ORDER (classpath semantics). */
  private def classHits(registry: Registry,
                        name: String): Seq[(String, String, String)] = {
    val simple = name.split('.').last.toLowerCase
    for {
      (jar, ver, classes) <- registry.entries.asScala.toSeq
      c <- classes
      if c.equalsIgnoreCase(name) || c.split('.').last.toLowerCase == simple
    } yield (jar, ver, c)
  }

  /** Resolve a script-side FUNCTION name: exact FQN hit first, then
    * the first simple-name hit that actually IS an EvalFunc (jars
    * carry helper classes too). */
  private def resolve(registry: Registry,
                      name: String): Option[(String, String, String)] = {
    val hits = classHits(registry, name)
    hits.find(_._3.equalsIgnoreCase(name)).orElse(
      hits.find { case (jar, ver, c) =>
        try classOf[EvalFunc[_]].isAssignableFrom(
          Class.forName(c, false, loaderFor(jar, ver)))
        catch { case _: Throwable => false }
      })
  }

  def canResolve(registry: Registry, name: String): Boolean =
    resolve(registry, name).isDefined

  /** Resolve ANY class (not just EvalFuncs) from the session's jars —
    * custom partitioners, comparators, load/store funcs. Same
    * precedence: exact FQN, then first simple-name hit. */
  private[functions] def resolveClass(registry: Registry, name: String)
      : Option[(String, String, String)] = {
    val hits = classHits(registry, name)
    hits.find(_._3.equalsIgnoreCase(name)).orElse(hits.headOption)
  }

  /** Resolution when `name` is a registered EvalFunc implementing
    * `iface` (Algebraic, Accumulator, ...). */
  private[functions] def resolveImplementing(registry: Registry,
      name: String, iface: Class[_])
      : Option[(Option[(String, String)], String)] =
    resolveClass(registry, name).flatMap { case (jar, ver, cls) =>
      try {
        val c = Class.forName(cls, false, loaderFor(jar, ver))
        if (iface.isAssignableFrom(c) &&
            classOf[EvalFunc[_]].isAssignableFrom(c))
          Some((Some((jar, ver)), cls))
        else None
      } catch { case _: Throwable => None }
    }

  /** Executor-side construction every aggregate bridge shares with
    * Invoker: restore shipped UDFContext state BEFORE the ctor runs,
    * then hand the instance its call-site signature. */
  private[functions] def newContextualInstance(
      jarInfo: Option[(String, String)], cls: String,
      ctorArgs: Seq[String], sig: String,
      ctx: java.util.HashMap[String, java.util.Properties]): AnyRef = {
    org.apache.pig.impl.util.UDFContext.mergeFromShipping(ctx)
    val inst = instantiateUserClass(jarInfo, cls, ctorArgs)
    inst match {
      case f: EvalFunc[_] => f.setUDFContextSignature(sig)
      case _ => ()
    }
    materializeCacheFiles(inst)
    inst
  }

  // --------------------------------------- EvalFunc distributed cache

  /** 'spec#link' → (local-ish path, link name); bare specs link under
    * their base name (Hadoop fragment convention). */
  private def cacheEntries(f: AnyRef): Seq[(String, String)] = f match {
    case ef: EvalFunc[_] =>
      (Option(ef.getCacheFiles).map(_.asScala.toSeq).getOrElse(Nil) ++
        Option(ef.getShipFiles).map(_.asScala.toSeq).getOrElse(Nil))
        .map { spec =>
          val (raw, link) = spec.split('#') match {
            case Array(p, l) => (p, l)
            case _           => (spec, new File(spec).getName)
          }
          val path =
            try {
              val u = new java.net.URI(raw)
              if (u.getPath != null && u.getPath.nonEmpty) u.getPath
              else raw
            } catch { case _: Exception => raw }
          (path, link)
        }
    case _ => Nil
  }

  /** Driver side of EvalFunc.getCacheFiles/getShipFiles (reference:
    * JobControlCompiler.setupDistributedCache): ship each file to
    * executors so [[materializeCacheFiles]] can link it there. */
  private[functions] def shipCacheFiles(spark: SparkSession,
                                        f: AnyRef): Unit =
    cacheEntries(f).foreach { case (src, _) =>
      if (new File(src).exists())
        try spark.sparkContext.addFile(src)
        catch { case _: Exception => () } // already added
    }

  private val cachedLinks = TrieMap.empty[String, Unit]

  /** Executor side: make each cache entry readable at ./link relative
    * to the task JVM's working directory (the reference's task-cwd
    * symlink contract — UDFs open `new FileReader("./link")`). Copies
    * once per JVM (direct path first, SparkFiles fallback for shipped
    * files) and removes the link on JVM exit. */
  private[functions] def materializeCacheFiles(f: AnyRef): Unit =
    cacheEntries(f).foreach { case (src, link) =>
      cachedLinks.getOrElseUpdate(s"$src#$link", {
        val dst = new File(link).getAbsoluteFile
        if (!dst.exists()) {
          val direct = new File(src)
          val resolved =
            if (direct.exists()) direct
            else try new File(
              org.apache.spark.SparkFiles.get(new File(src).getName))
            catch { case _: Exception => direct }
          if (resolved.exists()) {
            java.nio.file.Files.copy(resolved.toPath, dst.toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            dst.deleteOnExit()
          } else System.err.println(
            s"[graft] UDF cache file not found: $src — ./$link " +
            "not materialized")
        }
        ()
      })
    }

  /** Shared user-class loading for every serialized bridge (EvalFunc
    * invoker, partitioner, comparator, load/store funcs): version-keyed
    * jar loader first; an executor without the jar file locally falls
    * back to the context classloader, where addJar has placed it. */
  private[functions] def loadUserClass(jarInfo: Option[(String, String)],
                                       cls: String): Class[_] = {
    def ctxLoad() = Class.forName(cls, true,
      Option(Thread.currentThread.getContextClassLoader)
        .getOrElse(getClass.getClassLoader))
    try jarInfo match {
      case Some((jar, ver)) => Class.forName(cls, true, loaderFor(jar, ver))
      case None => ctxLoad()
    } catch { case _: Throwable => ctxLoad() }
  }

  /** Instantiate with the reference's ctor convention: no-arg, or one
    * String parameter per ctor arg. */
  private[functions] def instantiateUserClass(
      jarInfo: Option[(String, String)], cls: String,
      ctorArgs: Seq[String]): AnyRef = {
    val c = loadUserClass(jarInfo, cls)
    val inst =
      if (ctorArgs.isEmpty) c.getDeclaredConstructor().newInstance()
      else c.getDeclaredConstructor(
        Seq.fill(ctorArgs.length)(classOf[String]): _*)
        .newInstance(ctorArgs.map(_.asInstanceOf[AnyRef]): _*)
    inst.asInstanceOf[AnyRef]
  }

  /** Collision-proof call-site identity: MD5 over NUL-separated parts.
    * A 32-bit hashCode — or space-joined parts, where ctor args
    * Seq("a b") and Seq("a","b") collide — could bind two differently
    * configured call sites of one UDF to the same per-signature
    * UDFContext state. Shared by the scalar, Algebraic, and
    * Accumulator jar paths so all three use one identity scheme. */
  private[graft] def sigDigest(parts: Seq[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("\u0000").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)

  /** Build the Column for a call to a registered-jar EvalFunc — or None
    * when no registered jar provides the name. `inputSchema` (the Pig
    * schema of the call's arguments) reaches the EvalFunc's
    * setInputSchema/outputSchema exactly like the reference's
    * front-end type derivation, and UDFContext state the front-end
    * pass writes ships to executors inside the invoker. */
  def columnFor(spark: SparkSession, registry: Registry, name: String,
                ctorArgs: Seq[String], args: Seq[Column],
                inputSchema: Option[org.apache.pig.impl.logicalLayer.schema.Schema] = None)
      : Option[Column] =
    resolve(registry, name).map { case (jar, verKey, cls) =>
      // identity = (jar VERSION, class, EXACT ctor-arg vector, arity,
      // input schema) digested with separators: a 32-bit hash, or a
      // name without the jar identity, could silently bind a call site
      // to another configuration's udf; the schema component keeps two
      // call sites with different input types distinct (their
      // outputSchema results — and UDFContext keys — differ)
      val idDigest = sigDigest(verKey +: cls +: args.length.toString +:
        inputSchema.map(_.toString).getOrElse("") +: ctorArgs)
      val sig = "graft_sig_" + idDigest
      // plan-time pass: signature + input schema, then outputSchema
      // (which may stash state in UDFContext — the reference's order)
      val probe = Invoker(jar, verKey, cls, ctorArgs, sig,
        new java.util.HashMap[String, java.util.Properties]())
      val probeInst = probe.newInstance()
      // getCacheFiles/getShipFiles declared files ship to executors now
      // (reference: JobControlCompiler.setupDistributedCache at plan
      // time); tasks link them at ./name on instantiation
      shipCacheFiles(spark, probeInst)
      val dt = returnTypeOf(probeInst, args.length, inputSchema)
      val inv = Invoker(jar, verKey, cls, ctorArgs, sig,
        shippableUdfContext())
      val udfName =
        ("graft_jar_" + cls.split('.').last + "_" + idDigest).toLowerCase
      bindUdf(spark, udfName, a => coerce(inv.call(a), dt), dt, args.length)
      call_udf(udfName, args: _*)
    }

  /** UDFContext snapshot safe to serialize into a task closure:
    * non-serializable property values are dropped with a warning (the
    * reference serializes the whole context into the job conf and
    * fails there instead). */
  /** frontend-visible alias (the interpreter snapshots per call). */
  private[graft] def udfContextSnapshot()
      : java.util.HashMap[String, java.util.Properties] =
    shippableUdfContext()

  private[functions] def shippableUdfContext()
      : java.util.HashMap[String, java.util.Properties] = {
    val snap = org.apache.pig.impl.util.UDFContext.snapshotForShipping()
    snap.forEach { (k, props) =>
      val bad = props.keySet().asScala.filter { pk =>
        !props.get(pk).isInstanceOf[java.io.Serializable]
      }.toSeq
      bad.foreach { pk =>
        System.err.println(s"[graft] UDFContext property $pk of $k is " +
          "not Serializable — not shipped to executors")
        props.remove(pk)
      }
    }
    snap
  }

  /** EvalFunc result DataType: outputSchema override first (the
    * reference's contract — null means "use the generic type").
    * `argHint` sizes the fallback tuple shape for UNTYPED bag/tuple
    * declarations (a BAG with no inner schema is usually a pack of the
    * call's own arguments — CreateTupleBag-style UDFs). */
  private[functions] def returnTypeOf(f: EvalFunc[_], argHint: Int,
      inputSchema: Option[org.apache.pig.impl.logicalLayer.schema.Schema] = None)
      : DataType = {
    val in = inputSchema.getOrElse(
      new org.apache.pig.impl.logicalLayer.schema.Schema())
    val declared =
      try {
        f.setInputSchema(in)
        Option(f.outputSchema(in))
      }
      catch { case _: Throwable => None }
    declared.filter(_.size() == 1)
      .map(s => fieldType(s.getField(0), argHint))
      .getOrElse(f.getReturnType match {
        case c: Class[_] => classType(c, argHint)
        case p: java.lang.reflect.ParameterizedType =>
          classType(p.getRawType.asInstanceOf[Class[_]], argHint)
        case t => throw new IllegalArgumentException(
          s"${f.getClass.getName}: unsupported generic return $t — " +
          "override outputSchema, or return a scalar type")
      })
  }

  private def untypedTuple(argHint: Int): StructType =
    StructType((0 until math.max(argHint, 1)).map(i =>
      StructField(s"c$i", StringType)))

  private def fieldType(fs: org.apache.pig.impl.logicalLayer.schema.Schema.FieldSchema,
                        argHint: Int): DataType = {
    import org.apache.pig.data.{DataType => P}
    def structOf(s: org.apache.pig.impl.logicalLayer.schema.Schema): StructType =
      StructType(s.getFields.asScala.toSeq.zipWithIndex.map { case (f, i) =>
        StructField(Option(f.alias).getOrElse(s"c$i"), fieldType(f, argHint))
      })
    fs.`type` match {
      case P.BOOLEAN   => BooleanType
      case P.INTEGER   => IntegerType
      case P.LONG      => LongType
      case P.FLOAT     => FloatType
      case P.DOUBLE    => DoubleType
      case P.CHARARRAY => StringType
      case P.BYTEARRAY => BinaryType
      // SURVEY §1.2: joda DateTime ↔ TimestampType (UTC session);
      // biginteger/bigdecimal ride DecimalType (38,0) / (38,18) — the
      // reference's own DateTimeMax/BigDecimalSum builtin families
      // prove user jars declare these
      case P.DATETIME   => TimestampType
      case P.BIGINTEGER => DecimalType(38, 0)
      case P.BIGDECIMAL => DecimalType(38, 18)
      case P.MAP =>
        // untyped map values flow as text, the engine-wide bytearray rule
        Option(fs.schema).filter(_.size() > 0)
          .map(s => MapType(StringType, fieldType(s.getField(0), argHint)))
          .getOrElse(MapType(StringType, StringType))
      case P.TUPLE =>
        Option(fs.schema).filter(_.size() > 0).map(structOf)
          .getOrElse(untypedTuple(argHint))
      case P.BAG =>
        val inner = Option(fs.schema).filter(_.size() > 0).map { s =>
          // a bag schema usually wraps ONE tuple field; unwrap it
          val f0 = s.getField(0)
          if (f0.`type` == P.TUPLE && f0.schema != null) structOf(f0.schema)
          else structOf(s)
        }.getOrElse(untypedTuple(argHint))
        ArrayType(inner)
      case other => throw new IllegalArgumentException(
        s"unsupported outputSchema type code $other")
    }
  }

  private def classType(c: Class[_], argHint: Int): DataType = c match {
    case x if x == classOf[String]            => StringType
    case x if x == classOf[java.lang.Integer] => IntegerType
    case x if x == classOf[java.lang.Long]    => LongType
    case x if x == classOf[java.lang.Float]   => FloatType
    case x if x == classOf[java.lang.Double]  => DoubleType
    case x if x == classOf[java.lang.Boolean] => BooleanType
    case x if x == classOf[Array[Byte]]       => BinaryType
    case x if x == classOf[org.joda.time.DateTime]  => TimestampType
    case x if x == classOf[java.math.BigInteger]    => DecimalType(38, 0)
    case x if x == classOf[java.math.BigDecimal]    => DecimalType(38, 18)
    case x if classOf[java.util.Map[_, _]].isAssignableFrom(x) =>
      MapType(StringType, StringType)
    case x if classOf[Tuple].isAssignableFrom(x) => untypedTuple(argHint)
    case x if classOf[DataBag].isAssignableFrom(x) =>
      ArrayType(untypedTuple(argHint))
    case other => throw new IllegalArgumentException(
      s"unsupported EvalFunc return class $other — override outputSchema " +
      "(SURVEY §2.7)")
  }

  /** Serializable per-call bridge: resolves the class and instantiates
    * one EvalFunc PER EXECUTOR THREAD (reference contract: instances are
    * not shared across tasks; user EvalFuncs keep per-instance state). */
  private final case class Invoker(jar: String, verKey: String,
      cls: String, ctorArgs: Seq[String], sig: String,
      udfCtx: java.util.HashMap[String, java.util.Properties]) {
    @transient private lazy val local: ThreadLocal[EvalFunc[_]] =
      ThreadLocal.withInitial(() => newInstance())

    private[JarUdfs] def newInstance(): EvalFunc[_] = {
      // restore plan-time UDFContext state BEFORE construction (ctors
      // may read it), then hand the instance its call-site signature
      org.apache.pig.impl.util.UDFContext.mergeFromShipping(udfCtx)
      val inst = instantiateUserClass(Some((jar, verKey)), cls, ctorArgs)
        .asInstanceOf[EvalFunc[_]]
      inst.setUDFContextSignature(sig)
      materializeCacheFiles(inst)
      inst
    }

    def call(args: Seq[AnyRef]): AnyRef = {
      val t = TupleFactory.getInstance()
        .newTuple(args.map(toJava).asJava)
      val f = local.get()
      monitorOf(f) match {
        case None => f.exec(t).asInstanceOf[AnyRef]
        case Some(m) =>
          // @MonitoredUDF (reference: builtin/MonitoredUDF.java +
          // MonitoredUDFExecutor): bound the call, return the annotated
          // default (null if none) on timeout, and interrupt the stray
          // evaluation (an interrupt-ignoring exec keeps its pool thread
          // until it returns — the same residual the reference's
          // executor has)
          val fut = monitorPool.submit(
            new java.util.concurrent.Callable[AnyRef] {
              def call(): AnyRef = f.exec(t).asInstanceOf[AnyRef]
            })
          try fut.get(m.duration.toLong, m.timeUnit)
          catch {
            case _: java.util.concurrent.TimeoutException =>
              fut.cancel(true)
              // the interrupted exec may IGNORE the interrupt and keep
              // running on its pool thread — discard this thread's
              // instance so the next row gets a FRESH EvalFunc rather
              // than sharing one with a still-live evaluation (stateful
              // UDFs would race on per-instance buffers otherwise)
              local.remove()
              defaultOf(m, f)
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
      }
    }

    @transient private lazy val monitorCache =
      new java.util.concurrent.ConcurrentHashMap[String,
        Option[org.apache.pig.builtin.MonitoredUDF]]()
    private def monitorOf(f: EvalFunc[_]) =
      monitorCache.computeIfAbsent(f.getClass.getName, _ =>
        Option(f.getClass.getAnnotation(
          classOf[org.apache.pig.builtin.MonitoredUDF])))
  }

  /** Daemon pool for @MonitoredUDF-bounded calls (only annotated UDFs
    * pay the submit overhead). */
  private lazy val monitorPool =
    java.util.concurrent.Executors.newCachedThreadPool(
      new java.util.concurrent.ThreadFactory {
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, "graft-monitored-udf")
          t.setDaemon(true); t
        }
      })

  private def defaultOf(m: org.apache.pig.builtin.MonitoredUDF,
                        f: EvalFunc[_]): AnyRef =
    f.getReturnType match {
      case c: Class[_] if c == classOf[java.lang.Integer] =>
        m.intDefault.headOption.map(Int.box).orNull
      case c: Class[_] if c == classOf[java.lang.Long] =>
        m.longDefault.headOption.map(Long.box).orNull
      case c: Class[_] if c == classOf[java.lang.Double] =>
        m.doubleDefault.headOption.map(Double.box).orNull
      case c: Class[_] if c == classOf[java.lang.Float] =>
        m.floatDefault.headOption.map(Float.box).orNull
      case c: Class[_] if c == classOf[String] =>
        m.stringDefault.headOption.orNull
      case _ => null
    }

  /** Spark hands udf args as Scala collections; EvalFunc authors expect
    * the reference's Java model — rows become tuples and ARRAYS BECOME
    * BAGS (Pig has no array type: a grouped relation's bag argument is
    * what `(DataBag) input.get(0)` unwraps in every reference-era UDF).
    * Non-struct array elements wrap as 1-field tuples, the Pig rule. */
  /** [[toJava]] for sibling bridges (CustomPartitioner keys). */
  private[functions] def toPig(v: AnyRef): AnyRef = toJava(v)

  private def toJava(v: AnyRef): AnyRef = v match {
    case null => null
    // reference UDFs unwrap datetime args as joda DateTime
    // (e.g. P/builtin/DateTimeMax.java); session TZ is UTC
    case ts: java.sql.Timestamp =>
      new org.joda.time.DateTime(ts.getTime, org.joda.time.DateTimeZone.UTC)
    case i: java.time.Instant =>
      new org.joda.time.DateTime(i.toEpochMilli,
        org.joda.time.DateTimeZone.UTC)
    case ldt: java.time.LocalDateTime => // TimestampNTZ columns
      new org.joda.time.DateTime(
        ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        org.joda.time.DateTimeZone.UTC)
    case d: java.sql.Date => // DateType columns (midnight UTC, Pig rule)
      new org.joda.time.DateTime(
        d.toLocalDate.atStartOfDay(java.time.ZoneOffset.UTC)
          .toInstant.toEpochMilli,
        org.joda.time.DateTimeZone.UTC)
    case ld: java.time.LocalDate =>
      new org.joda.time.DateTime(
        ld.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli,
        org.joda.time.DateTimeZone.UTC)
    case s: scala.collection.Seq[_] =>
      val bag = BagFactory.getInstance().newDefaultBag()
      s.foreach { x =>
        toJava(x.asInstanceOf[AnyRef]) match {
          case t: Tuple => bag.add(t)
          case o => bag.add(TupleFactory.getInstance().newTuple(o))
        }
      }
      bag
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => k -> toJava(x.asInstanceOf[AnyRef]) }.asJava
    case r: org.apache.spark.sql.Row =>
      TupleFactory.getInstance().newTuple(
        r.toSeq.map(x => toJava(x.asInstanceOf[AnyRef])).asJava)
    case other => other
  }

  /** Coerce an exec() result to the DECLARED Spark type: facade tuples/
    * bags/maps become rows/seqs/maps, and leaves align to the declared
    * scalar (untyped Pig declarations surface values as text — the
    * engine-wide bytearray-as-string rule). */
  private[functions] def coerce(v: AnyRef, dt: DataType): AnyRef = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => s
    case (x, StringType) => String.valueOf(x)
    case (n: java.lang.Number, IntegerType) => Int.box(n.intValue)
    case (n: java.lang.Number, LongType) => Long.box(n.longValue)
    case (n: java.lang.Number, FloatType) => Float.box(n.floatValue)
    case (n: java.lang.Number, DoubleType) => Double.box(n.doubleValue)
    case (b: java.lang.Boolean, BooleanType) => b
    case (b: Array[Byte], BinaryType) => b
    case (d: org.joda.time.DateTime, TimestampType) =>
      new java.sql.Timestamp(d.getMillis)
    case (ts: java.sql.Timestamp, TimestampType) => ts
    case (n: java.math.BigInteger, dt: DecimalType) =>
      new java.math.BigDecimal(n).setScale(dt.scale)
    case (n: java.math.BigDecimal, dt: DecimalType) =>
      // align to the declared scale the way a Spark cast would (half-up);
      // overflow past the declared precision surfaces as Spark's own
      // null-on-overflow, not an exception here
      n.setScale(dt.scale, java.math.RoundingMode.HALF_UP)
    case (n: java.lang.Number, dt: DecimalType) =>
      new java.math.BigDecimal(n.toString)
        .setScale(dt.scale, java.math.RoundingMode.HALF_UP)
    case (t: Tuple, st: StructType) =>
      org.apache.spark.sql.Row(
        st.fields.toSeq.zipWithIndex.map { case (f, i) =>
          coerce(if (i < t.size) t.getAll.get(i) else null, f.dataType)
        }: _*)
    case (b: DataBag, ArrayType(et, _)) =>
      b.asScala.map(t => coerce(t, et)).toSeq
    case (l: java.util.List[_], ArrayType(et, _)) =>
      l.asScala.map(x => coerce(x.asInstanceOf[AnyRef], et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, x) =>
        String.valueOf(k) -> coerce(x.asInstanceOf[AnyRef], vt) }.toMap
    case (other, _) => other
  }

  /** Register (once per session) a Seq[AnyRef] => AnyRef as a Spark
    * udf of fixed arity — shared by the jar EvalFunc and HiveUDF
    * bridges (`fn` must be a serializable closure). */
  private[functions] def bindUdf(spark: SparkSession, name: String,
      fn: Seq[AnyRef] => AnyRef, dt: DataType, n: Int): Unit = {
    val key = System.identityHashCode(spark) + "/" + name
    bound.getOrElseUpdate(key, { registerArity(spark, name, fn, dt, n); () })
    ()
  }

  private def registerArity(spark: SparkSession, name: String,
                            fn: Seq[AnyRef] => AnyRef, dt: DataType,
                            n: Int): Unit = {
    def c(args: AnyRef*): AnyRef = fn(args)
    n match {
      case 0 => spark.udf.register(name, new UDF0[AnyRef] {
        def call() = c() }, dt)
      case 1 => spark.udf.register(name, new UDF1[AnyRef, AnyRef] {
        def call(a: AnyRef) = c(a) }, dt)
      case 2 => spark.udf.register(name, new UDF2[AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef) = c(a, b) }, dt)
      case 3 => spark.udf.register(name, new UDF3[AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, d: AnyRef) = c(a, b, d) }, dt)
      case 4 => spark.udf.register(name, new UDF4[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, d: AnyRef, e: AnyRef) = c(a, b, d, e) }, dt)
      case 5 => spark.udf.register(name, new UDF5[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, d: AnyRef, e: AnyRef, f: AnyRef) = c(a, b, d, e, f) }, dt)
      case 6 => spark.udf.register(name, new UDF6[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, d: AnyRef, e: AnyRef, f: AnyRef, g: AnyRef) = c(a, b, d, e, f, g) }, dt)
      case 7 => spark.udf.register(name, new UDF7[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, d: AnyRef, e: AnyRef, f: AnyRef, g: AnyRef, h: AnyRef) = c(a, b, d, e, f, g, h) }, dt)
      case 8 => spark.udf.register(name, new UDF8[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, d: AnyRef, e: AnyRef, f: AnyRef, g: AnyRef, h: AnyRef, i: AnyRef) = c(a, b, d, e, f, g, h, i) }, dt)
      case bad => throw new IllegalArgumentException(
        s"jar EvalFunc call with $bad args — 8 max")
    }
  }
}
