package graft.functions

import java.io.{BufferedReader, BufferedWriter, File, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.api.java._
import org.apache.spark.sql.functions.call_udf
import org.apache.spark.sql.types._

import org.json4s._
import org.json4s.jackson.JsonMethods

/** `REGISTER 'udfs.py' USING streaming_python AS ns;` — the reference's
  * streaming Python UDF surface (reference:
  * P/scripting/streaming/python/PythonScriptEngine.java:103-134 function
  * discovery via the `@outputSchema(...)` decorator + `def name(...)`,
  * P/impl/builtin/StreamingUDF.java per-task external python process).
  *
  * Spark-first re-expression: each `ns.fn(args)` call site becomes a
  * Spark udf whose closure talks to ONE long-lived `python3` process per
  * executor thread (the same process-per-task shape as the reference's
  * controller) over a line-oriented JSON protocol. The python source is
  * carried in the closure as a string and materialized to the executor's
  * tempdir — no shared filesystem needed. Per-row cost is one pipe
  * round-trip, identical in shape to the reference's
  * InputHandler/OutputHandler loop; the pipeline stays per-partition
  * parallel with no driver funnel.
  */
object PyUdfs {

  final case class PyFn(source: String, fn: String, schema: String,
                        dataType: DataType)

  /** Per-script-session registry ("ns.fn" lowercased → record) — owned
    * by each PigRunner, matching the reference's per-script function
    * registry (a bare `concat` registered in one script must not shadow
    * CONCAT in the next). */
  final class Registry {
    private val m = TrieMap.empty[String, PyFn]
    def put(name: String, fn: PyFn): Unit = { m.put(name.toLowerCase, fn); () }
    def get(name: String): Option[PyFn] = m.get(name.toLowerCase)
    def isRegistered(name: String): Boolean = m.contains(name.toLowerCase)
  }

  private val bound = TrieMap.empty[String, Unit]

  /** Session-registered udf name → function record. The batch-eval
    * planner rule ([[graft.plans.BatchPyEval]]) uses this to recognize
    * a `graft_py_*` ScalaUDF in a plan and drive the batched wire
    * protocol for it directly. */
  private val specs = TrieMap.empty[String, PyFn]

  /** The function record behind a registered `graft_py_*` udf name. */
  def specFor(udfName: String): Option[PyFn] = specs.get(udfName.toLowerCase)

  /** Evaluate a whole batch of rows' EXTERNAL-typed argument tuples in
    * one wire round-trip; returns external-typed results (same
    * conversion surface as the scalar udf closure). */
  def callBatch(rec: PyFn, argsBatch: Seq[Seq[AnyRef]]): Seq[AnyRef] =
    Pool.procFor(rec.source)
      .callBatch(rec.fn, argsBatch.map(_.map(toJson)))
      .map(fromJson(_, rec.dataType))

  private val decoratorRe =
    """^\s*@\s*outputSchema\s*\(\s*(['"])(.*?)\1\s*\)""".r
  private val defRe = """^\s*def\s+(\w+)\s*\(""".r

  /** Scan a python source for decorated functions — same discovery rule
    * as the reference: an @outputSchema decorator applies to the next
    * `def`; undecorated defs are helpers, not UDFs. */
  private[graft] def functionsIn(source: String): Seq[(String, String)] = {
    var pending: Option[String] = None
    val out = Seq.newBuilder[(String, String)]
    source.linesIterator.foreach { line =>
      decoratorRe.findFirstMatchIn(line) match {
        case Some(m) => pending = Some(m.group(2))
        case None =>
          defRe.findFirstMatchIn(line).foreach { m =>
            pending.foreach(s => out += ((m.group(1), s)))
            pending = None
          }
      }
    }
    out.result()
  }

  /** Pig schema string from an @outputSchema decorator → Spark type.
    * Scalars, tuples of scalars, and bags of tuples cover the decorators
    * in the reference's own e2e python UDFs. */
  private[graft] def pigSchemaType(s0: String): DataType = {
    val s = s0.trim
    def field(f: String): StructField = {
      val t = f.trim
      val i = t.indexOf(':')
      if (i < 0) StructField(t, StringType)
      else StructField(t.take(i).trim, pigSchemaType(t.drop(i + 1)))
    }
    s.toLowerCase match {
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "chararray" => StringType
      case "boolean" => BooleanType
      // bytearray is modeled as string engine-wide (lazy casts at use
      // site — same pragmatic rule as the frontend's pigType)
      case "bytearray" => StringType
      case l if l.startsWith("tuple(") && s.endsWith(")") =>
        // keyword form: tuple(a:int, b:chararray)
        pigSchemaType(s.substring(5))
      case l if l.startsWith("map[") && s.endsWith("]") =>
        val inner = s.substring(4, s.length - 1).trim
        MapType(StringType,
          if (inner.isEmpty) StringType else pigSchemaType(inner))
      case _ if s.startsWith("{") && s.endsWith("}") =>
        // bag {tuple...} — possibly named: {t:(...)}
        val inner = s.substring(1, s.length - 1).trim
        val tup = inner.indexOf('(') match {
          case -1 => throw new IllegalArgumentException(
            s"bag schema needs a tuple: $s0")
          case i => inner.substring(i)
        }
        ArrayType(pigSchemaType(tup))
      case _ if s.startsWith("(") && s.endsWith(")") =>
        StructType(splitTop(s.substring(1, s.length - 1)).map(field))
      case _ if s.contains(":") && !s.contains("(") =>
        // a single named scalar field: `word:chararray` → the value type
        pigSchemaType(s.drop(s.indexOf(':') + 1))
      case _ if s.contains(":") =>
        // named complex field: `t:(a:int,b:int)`
        pigSchemaType(s.drop(s.indexOf(':') + 1))
      case other => throw new IllegalArgumentException(
        s"unsupported @outputSchema type: $other")
    }
  }

  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var d = 0
    s.foreach {
      case c @ ('(' | '{' | '[') => d += 1; cur.append(c)
      case c @ (')' | '}' | ']') => d -= 1; cur.append(c)
      case ',' if d == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** Handle the REGISTER statement: discover decorated functions and
    * enter them under `ns.fn`. Missing file errors like the reference. */
  def register(registry: Registry, path: String,
               namespace: Option[String]): Unit = {
    val f = new File(path)
    if (!f.exists()) throw new IllegalArgumentException(
      s"ERROR 101: file '$path' does not exist.")
    val source = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8)
    val fns = functionsIn(source)
    if (fns.isEmpty) throw new IllegalArgumentException(
      s"no @outputSchema-decorated functions found in '$path'")
    // no AS clause → the GLOBAL namespace: functions are callable bare
    // and (reference semantics) take precedence over same-named builtins
    val prefix = namespace.map(_ + ".").getOrElse("")
    fns.foreach { case (fn, schema) =>
      registry.put(s"$prefix$fn",
        PyFn(source, fn, schema, pigSchemaType(schema)))
    }
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Column for a `ns.fn(args)` call site, or None if not registered.
    * The Spark-side udf name is keyed by the SOURCE digest (+fn+arity),
    * so two script sessions registering different code under the same
    * alias never collide in the shared session registry. */
  def columnFor(spark: SparkSession, registry: Registry, name: String,
                args: Seq[Column]): Option[Column] =
    registry.get(name).map { rec =>
      val udfName = "graft_py_" + md5(rec.source + "\u0000" + pythonExe)
        .take(12) + "_" + rec.fn.toLowerCase + "_" + args.length
      val key = System.identityHashCode(spark) + "/" + udfName
      bound.getOrElseUpdate(key, {
        registerArity(spark, udfName, rec, args.length); ()
      })
      call_udf(udfName, args: _*)
    }

  // ------------------------------------------------------------ protocol

  /** Controller program (ours): predefines the `outputSchema` decorator
    * (and a `pig_util` module alias so reference-style
    * `from pig_util import outputSchema` imports work), execs the user
    * file, then serves {"f":name,"a":[args]} → {"r":result} JSON lines. */
  private val controllerSource =
    """import sys, json, types, traceback
      |def outputSchema(s):
      |    def deco(f):
      |        return f
      |    return deco
      |_m = types.ModuleType("pig_util"); _m.outputSchema = outputSchema
      |sys.modules["pig_util"] = _m
      |_g = {"outputSchema": outputSchema, "__name__": "__udf__"}
      |with open(sys.argv[1]) as _f:
      |    exec(compile(_f.read(), sys.argv[1], "exec"), _g)
      |_out = sys.stdout
      |_in = sys.stdin
      |sys.stdout = sys.stderr   # user prints must not corrupt the protocol
      |while True:
      |    # readline, NOT iteration: python2's file iteration read-ahead
      |    # buffers and would deadlock the request/response protocol
      |    _line = _in.readline()
      |    if not _line:
      |        break
      |    try:
      |        _req = json.loads(_line)
      |        _fn = _g[_req["f"]]
      |        if "b" in _req:
      |            # batched form: one request carries N rows' argument
      |            # tuples, one response carries N results
      |            _rs = []
      |            for _a in _req["b"]:
      |                _r = _fn(*_a)
      |                if isinstance(_r, tuple):
      |                    _r = list(_r)
      |                _rs.append(_r)
      |            _resp = json.dumps({"r": _rs})
      |        else:
      |            _r = _fn(*_req["a"])
      |            if isinstance(_r, tuple):
      |                _r = list(_r)
      |            _resp = json.dumps({"r": _r})
      |    except Exception:
      |        _resp = json.dumps({"e": traceback.format_exc()})
      |    _out.write(_resp); _out.write("\n"); _out.flush()
      |""".stripMargin

  /** -Dgraft.python / GRAFT_PYTHON pick the interpreter (python2 for
    * py2-era scripts — the reference's cpython fixtures predate py3). */
  private def pythonExe: String = sys.props.get("graft.python")
    .orElse(sys.env.get("GRAFT_PYTHON")).getOrElse("python3")

  private final class PyProc(source: String) {
    private val dir = Files.createTempDirectory("graft_py").toFile
    dir.deleteOnExit()
    private val ctl = new File(dir, "controller.py")
    private val udfFile = new File(dir, "udf.py")
    Files.write(ctl.toPath, controllerSource.getBytes(StandardCharsets.UTF_8))
    Files.write(udfFile.toPath, source.getBytes(StandardCharsets.UTF_8))
    private val exe = pythonExe
    private val errFile = new File(dir, "stderr.txt")
    private val proc = new ProcessBuilder(exe, ctl.getAbsolutePath,
        udfFile.getAbsolutePath)
      .redirectError(ProcessBuilder.Redirect.to(errFile))
      .start()
    private val in = new BufferedWriter(new OutputStreamWriter(
      proc.getOutputStream, StandardCharsets.UTF_8))
    private val out = new BufferedReader(new InputStreamReader(
      proc.getInputStream, StandardCharsets.UTF_8))

    private def roundTrip(fn: String, req: String): JValue = {
      in.write(req); in.write("\n"); in.flush()
      val line = out.readLine()
      if (line == null) {
        val err = try new String(Files.readAllBytes(errFile.toPath),
          StandardCharsets.UTF_8).takeRight(2000) catch { case _: Exception => "" }
        throw new IllegalStateException(
          s"python UDF process died calling $fn. stderr tail:\n$err")
      }
      JsonMethods.parse(line) match {
        case o: JObject =>
          (o \ "e") match {
            case JString(tb) => throw new IllegalStateException(
              s"python UDF $fn raised:\n$tb")
            case _ => o \ "r"
          }
        case other => throw new IllegalStateException(
          s"bad python UDF response: $other")
      }
    }

    def call(fn: String, args: Seq[JValue]): JValue =
      roundTrip(fn, JsonMethods.compact(JsonMethods.render(
        JObject("f" -> JString(fn), "a" -> JArray(args.toList)))))

    /** One request/response for a whole batch of rows' argument tuples —
      * the wire-cost amortization the scalar path cannot have (one pipe
      * round-trip + two flushes per ROW there, per BATCH here). */
    def callBatch(fn: String, rows: Seq[Seq[JValue]]): Seq[JValue] = {
      val req = JsonMethods.compact(JsonMethods.render(
        JObject("f" -> JString(fn),
          "b" -> JArray(rows.map(a => JArray(a.toList): JValue).toList))))
      roundTrip(fn, req) match {
        case JArray(rs) =>
          if (rs.length != rows.length) throw new IllegalStateException(
            s"python UDF $fn batch returned ${rs.length} results for " +
              s"${rows.length} rows")
          rs
        case other => throw new IllegalStateException(
          s"bad python UDF batch response: $other")
      }
    }

    def destroy(): Unit = { try proc.destroy() catch { case _: Exception => () } }
  }

  /** One process per (script, executor thread) — the reference's
    * process-per-task shape; processes are reaped on JVM exit. */
  private object Pool {
    // owner thread tracked per process: a process whose thread has died
    // (task-pool resize, session teardown) is reaped on the next
    // procFor, so long-lived drivers registering many distinct scripts
    // don't accumulate orphaned interpreters. Live-thread processes stay
    // cached for the JVM's life — bounded by (scripts × task threads),
    // the same envelope as PySpark's worker pool.
    private val owned =
      new java.util.concurrent.ConcurrentLinkedQueue[(Thread, PyProc)]()
    private val perThread = TrieMap.empty[String, ThreadLocal[PyProc]]
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      owned.forEach(e => e._2.destroy())
    }))
    private def reapDead(): Unit = {
      val it = owned.iterator()
      while (it.hasNext) {
        val e = it.next()
        if (!e._1.isAlive) { e._2.destroy(); it.remove() }
      }
    }
    def procFor(source: String): PyProc = {
      reapDead()
      // keyed by (source, interpreter): switching -Dgraft.python must
      // not reuse a process started under the other interpreter
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest((source + "\u0000" + pythonExe)
          .getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      perThread.getOrElseUpdate(key, ThreadLocal.withInitial { () =>
        val p = new PyProc(source)
        owned.add((Thread.currentThread(), p))
        p
      }).get()
    }
  }

  // --------------------------------------------------- value conversion

  private def toJson(v: AnyRef): JValue = v match {
    case null => JNull
    case s: String => JString(s)
    case b: java.lang.Boolean => JBool(b)
    case i: java.lang.Integer => JInt(BigInt(i.intValue))
    case l: java.lang.Long => JInt(BigInt(l.longValue))
    case f: java.lang.Float => JDouble(f.doubleValue)
    case d: java.lang.Double => JDouble(d.doubleValue)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case b: Array[Byte] => JString(java.util.Base64.getEncoder.encodeToString(b))
    case s: scala.collection.Seq[_] =>
      JArray(s.toList.map(x => toJson(x.asInstanceOf[AnyRef])))
    case m: scala.collection.Map[_, _] =>
      JObject(m.toList.map { case (k, x) =>
        String.valueOf(k) -> toJson(x.asInstanceOf[AnyRef]) })
    case r: org.apache.spark.sql.Row =>
      JArray(r.toSeq.toList.map(x => toJson(x.asInstanceOf[AnyRef])))
    case other => JString(other.toString)
  }

  private def fromJson(v: JValue, dt: DataType): AnyRef = (v, dt) match {
    case (JNull | JNothing, _) => null
    case (JString(s), StringType) => s
    case (x, StringType) => JsonMethods.compact(JsonMethods.render(x))
    case (JInt(i), IntegerType) => Int.box(i.toInt)
    case (JInt(i), LongType) => Long.box(i.toLong)
    case (JDouble(d), IntegerType) => Int.box(d.toInt)
    case (JDouble(d), LongType) => Long.box(d.toLong)
    case (JInt(i), DoubleType) => Double.box(i.toDouble)
    case (JDouble(d), DoubleType) => Double.box(d)
    case (JInt(i), FloatType) => Float.box(i.toFloat)
    case (JDouble(d), FloatType) => Float.box(d.toFloat)
    case (JDecimal(d), DoubleType) => Double.box(d.toDouble)
    case (JBool(b), BooleanType) => Boolean.box(b)
    case (JString(s), BinaryType) => java.util.Base64.getDecoder.decode(s)
    case (JArray(xs), ArrayType(et, _)) =>
      xs.map(x => fromJson(x, et))
    case (JArray(xs), st: StructType) =>
      org.apache.spark.sql.Row(
        st.fields.zipWithIndex.map { case (f, i) =>
          if (i < xs.length) fromJson(xs(i), f.dataType) else null }.toSeq: _*)
    case (o: JObject, st: StructType) =>
      org.apache.spark.sql.Row(
        st.fields.map(f => fromJson(o \ f.name, f.dataType)).toSeq: _*)
    case (JObject(fields), MapType(_, vt, _)) =>
      fields.map { case (k, x) => k -> fromJson(x, vt) }.toMap
    case (other, t) => throw new IllegalStateException(
      s"python UDF returned $other where $t was declared")
  }

  private def registerArity(spark: SparkSession, name: String, rec: PyFn,
                            n: Int): Unit = {
    specs.put(name.toLowerCase, rec)
    val (src, fn, dt) = (rec.source, rec.fn, rec.dataType)
    def c(args: AnyRef*): AnyRef =
      fromJson(Pool.procFor(src).call(fn, args.map(toJson)), dt)
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
      case bad => throw new IllegalArgumentException(
        s"python UDF call with $bad args — 6 max")
    }
  }
}
