package graft.frontend

import java.io.File
import java.net.{InetAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.TimeUnit

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Embedded Pig driver API — reference `P/scripting/Pig.java` +
  * `P/scripting/BoundScript.java`, exercised end-to-end by
  * `test/e2e/pig/tests/turing_jython.conf`.
  *
  * The reference embeds a jython interpreter in the JVM and hands the
  * python driver script a live `Pig.compile(...).bind(...).run()` API.
  * This engine runs the SAME driver scripts under CPython 2.7 instead:
  * a generated `org.apache.pig.scripting` python shim proxies each API
  * call over a line-JSON loopback socket to this server, which executes
  * the compiled Pig Latin through [[PigRunner]] (grunt-only compiled
  * strings — `sh`/`fs` — through [[graft.tools.GruntShell]]).
  *
  * Shim-pinned semantics (BoundScript.java / turing_jython.conf):
  *  - `bind()` with no args resolves the script's `$name`s from the
  *    CALLER's python namespace, locals over globals (the jython
  *    behavior — BoundScript fills unbound params from the interpreter
  *    namespace)
  *  - `bind([dict,...]).run()` runs once per parameter set; `runSingle`
  *    refuses a multi-bound script
  *  - `runSingle(Properties)` forwards java properties; the engine
  *    honors `pig.default.load.func` (USING-less LOADs route through
  *    it — an unresolvable class fails with the reference's ERROR 1070)
  *  - `result(alias)` is null for an unknown alias (the driver's
  *    subsequent `.iterator()` then fails python-side, which is exactly
  *    the reference's ERROR 1121 path); for a known alias its
  *    `.iterator()` yields java-shaped `hasNext/next` over Tuples
  *  - `describe/explain/illustrate` compile the script WITHOUT
  *    executing its stores (diagnostics never materialize output)
  *  - any python-level failure surfaces as `ERROR 1121` on stderr
  *    (PigException's "Python Error" code); pig-level failures keep
  *    their own codes (1003 unknown alias, 1070 unresolvable function)
  *
  * Divergence from the reference (documented): the driver is CPython,
  * not in-JVM jython, so java interop beyond the scripting API is
  * shimmed — `java.util.Properties` and hadoop `Configuration` /
  * `FileSystem` are minimal python stand-ins, and driver scripts that
  * reach into arbitrary java classes are out of scope.
  */
object EmbeddedPig {

  final case class Result(rc: Int, stdout: String, stderr: String)

  /** -Dgraft.python / GRAFT_PYTHON pick the interpreter (python2 for
    * the reference's py2-era driver scripts), same as PyUdfs. */
  private def defaultPython: String = sys.props.get("graft.python")
    .orElse(sys.env.get("GRAFT_PYTHON")).getOrElse("python3")

  /** Run one embedded-pig python driver script to completion: start the
    * loopback API server, launch the interpreter with the shim on
    * PYTHONPATH, serve calls until the script exits. */
  def runScript(spark: SparkSession, scriptText: String,
                cmdArgs: Seq[String] = Nil,
                baseParams: Map[String, String] = Map.empty,
                cwd: File = new File(".").getCanonicalFile,
                pythonExe: String = defaultPython,
                timeoutSec: Long = 300L): Result = {
    val shimDir = shim // generated once per JVM
    val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    // loopback auth: only a client presenting this one-time token gets
    // served — the control protocol can reach GruntShell's `sh`, so an
    // unauthenticated local connection would be command execution
    val token = java.util.UUID.randomUUID().toString
    val handler = new Server(spark)
    val scratch = Files.createTempDirectory("pig_embed").toFile
    val scriptFile = new File(scratch, "driver.py")
    Files.write(scriptFile.toPath,
      scriptText.getBytes(StandardCharsets.UTF_8))
    val outFile = new File(scratch, "stdout.txt")
    val errFile = new File(scratch, "stderr.txt")
    val pb = new ProcessBuilder(
      (Seq(pythonExe, "-u", scriptFile.getAbsolutePath) ++ cmdArgs): _*)
    pb.directory(cwd)
    pb.redirectOutput(ProcessBuilder.Redirect.to(outFile))
    pb.redirectError(ProcessBuilder.Redirect.to(errFile))
    val env = pb.environment()
    env.put("PYTHONPATH", shimDir.getAbsolutePath)
    env.put("GRAFT_PIG_PORT", server.getLocalPort.toString)
    env.put("GRAFT_PIG_TOKEN", token)
    env.put("GRAFT_PIG_PARAMS", JsonMethods.compact(JsonMethods.render(
      JObject(baseParams.toList.map { case (k, v) => k -> JString(v) }))))
    val proc = pb.start()
    // serve the first connection whose handshake line carries the
    // one-time token (others are closed and the accept loop continues);
    // a script that never connects just runs to exit and the accept
    // dies with the socket close below
    val serverThread = new Thread(() => {
      try {
        var sock: java.net.Socket = null
        var in: java.io.BufferedReader = null
        while (sock == null) {
          val cand = server.accept()
          // a connection that never completes its handshake line must
          // not starve the legitimate shim client for the whole run.
          // SO_TIMEOUT alone only bounds a fully-idle peer (it re-arms
          // on every byte, so a drip-feed of one byte per few seconds
          // would hold the loop forever) — enforce a TOTAL handshake
          // deadline and a line-length cap, reading char-at-a-time
          cand.setSoTimeout(1000)
          val candIn = new java.io.BufferedReader(new java.io.InputStreamReader(
            cand.getInputStream, StandardCharsets.UTF_8))
          val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
          val hello =
            try {
              val sb = new StringBuilder
              var c = candIn.read()
              while (c != -1 && c != '\n' &&
                     System.nanoTime() < deadline && sb.length <= 512) {
                sb.append(c.toChar); c = candIn.read()
              }
              // readLine() semantics for the legit client: \r\n tolerated
              if (c == '\n') sb.toString.stripSuffix("\r") else null
            } catch { case _: java.net.SocketTimeoutException => null }
          if (hello == token) {
            cand.setSoTimeout(0) // handshake done: requests block freely
            sock = cand; in = candIn
          } else cand.close()
        }
        val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          sock.getOutputStream, StandardCharsets.UTF_8))
        var line = in.readLine()
        while (line != null) {
          val resp =
            try handler.handle(JsonMethods.parse(line))
            catch {
              case e: Throwable => JObject(
                "ok" -> JBool(false),
                "msg" -> JString(Option(e.getMessage)
                  .getOrElse(e.getClass.getName).take(4000)))
            }
          out.write(JsonMethods.compact(JsonMethods.render(resp)))
          out.write("\n"); out.flush()
          line = in.readLine()
        }
      } catch { case _: Exception => () } // socket closed at shutdown
    }, "pig-embed-server")
    serverThread.setDaemon(true)
    serverThread.start()
    try {
      val finished = proc.waitFor(timeoutSec, TimeUnit.SECONDS)
      if (!finished) proc.destroyForcibly()
      val rc = if (finished) proc.exitValue() else 124
      val stdout = new String(Files.readAllBytes(outFile.toPath),
        StandardCharsets.UTF_8)
      var stderr = new String(Files.readAllBytes(errFile.toPath),
        StandardCharsets.UTF_8)
      // the reference wraps any driver-script failure in PigException
      // 1121 ("Python Error") — mirror it so error-parity checks hold
      if (rc != 0) stderr += "\nERROR 1121: Python Error.\n"
      Result(rc, stdout, stderr)
    } finally {
      try server.close() catch { case _: Exception => () }
      handler.close()
    }
  }

  // ------------------------------------------------------------ server

  private def jstr(v: JValue): String = v match {
    case JString(s) => s
    case JNothing | JNull => ""
    case other => JsonMethods.compact(JsonMethods.render(other))
  }

  private def jsmap(v: JValue): Map[String, String] = v match {
    case JObject(fs) => fs.map { case (k, x) => k -> jstr(x) }.toMap
    case _ => Map.empty
  }

  private def ok(fields: (String, JValue)*): JValue =
    JObject(("ok" -> JBool(true)) :: fields.toList)

  /** Per-driver-script API server state: completed runs stay addressable
    * for `result(alias).iterator()` until the script exits. */
  private final class Server(spark: SparkSession) {
    private val runs = mutable.Map.empty[Int, PigRunner]
    private var nextId = 0
    // Pig.registerJar/registerUDF/define/set accumulate session-wide
    // context that every subsequently compiled script sees (reference:
    // ScriptPigContext state) — re-expressed as statements prepended
    // to each compiled script
    private val prelude = mutable.ArrayBuffer.empty[String]
    private lazy val fsRunner = PigRunner(spark)
    private lazy val fsShell = new graft.tools.GruntShell(fsRunner)
    private var fsUsed = false
    private val iterDir = Files.createTempDirectory("pig_embed_iter").toFile

    def close(): Unit = {
      runs.values.foreach(r => try r.close() catch { case _: Exception => () })
      if (fsUsed) { try fsRunner.close() catch { case _: Exception => () } }
    }

    def handle(req: JValue): JValue = jstr(req \ "op") match {
      case "run" => run(req)
      case "fs" =>
        fsUsed = true
        ok("out" -> JString(fsShell.execute("fs " + jstr(req \ "cmd"))))
      case "prelude" =>
        prelude += jstr(req \ "stmt")
        ok()
      case k @ ("describe" | "explain" | "illustrate") => diagnostics(req, k)
      case "iter" => iter(req)
      case other =>
        JObject("ok" -> JBool(false), "msg" -> JString(s"unknown op $other"))
    }

    private def withPrelude(s: String): String =
      if (prelude.isEmpty) s else prelude.mkString("", "\n", "\n") + s

    // properties from a props-bearing runSingle persist into the session
    // (reference: getProperties().putAll(prop) mutates the PigContext, so
    // later compiles/runs in the same driver script still see them)
    private val sessionProps = mutable.Map.empty[String, String]

    private def run(req: JValue): JValue = {
      val script0 = jstr(req \ "script")
      val params = jsmap(req \ "params")
      sessionProps ++= jsmap(req \ "props")
      val props = sessionProps.toMap
      // pig.default.load.func: USING-less LOADs route through the
      // configured loader (reference: QueryParserUtils default load
      // func resolution) — an unknown class then errors with 1070
      val script = props.get("pig.default.load.func") match {
        case Some(cls) if cls.nonEmpty =>
          script0.replaceAll("(?i)\\b(load\\s+'[^']*')(?!\\s*using\\b)",
            "$1 USING " +
              java.util.regex.Matcher.quoteReplacement(cls) + "()")
        case _ => script0
      }
      val lines = script.split("\n").map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("--"))
      // a compiled string of pure grunt commands (`sh ...` — the
      // Jython_Command group) executes through the grunt dispatcher
      val gruntOnly = lines.nonEmpty && lines.forall { l =>
        val w = l.split("\\s+")(0).toLowerCase
        w == "sh" || w == "fs"
      }
      if (gruntOnly) {
        val runner = PigRunner(spark)
        try {
          val shell = new graft.tools.GruntShell(runner)
          val out = lines.map(shell.execute).filter(_.nonEmpty).mkString("\n")
          ok("out" -> JString(out))
        } finally runner.close()
      } else {
        val runner = PigRunner(spark)
        runner.run(withPrelude(script), params)
        nextId += 1
        runs(nextId) = runner
        ok("id" -> JInt(nextId))
      }
    }

    private def diagnostics(req: JValue, kind: String): JValue = {
      val script = jstr(req \ "script")
      val params = jsmap(req \ "params")
      val storeAliases = "(?is)\\bstore\\s+(\\w+)\\s+into".r
        .findAllMatchIn(script).map(_.group(1)).toSeq.distinct
      // diagnostics compile the plan but never materialize stores
      val stripped =
        script.replaceAll("(?is)\\bstore\\s+\\w+\\s+into\\s+[^;]*;", "")
      val runner = PigRunner(spark)
      try {
        runner.run(withPrelude(stripped), params)
        def targets: Seq[String] =
          if (storeAliases.nonEmpty) storeAliases
          else runner.relations.keys.toSeq.sorted.takeRight(1)
        val out = kind match {
          case "describe" => runner.describeLine(jstr(req \ "alias"))
          case "illustrate" =>
            targets.map(runner.illustrateText(_)).mkString("\n")
          case _ => // explain: the analyzed/optimized/physical plan text
            targets.map(a => s"# $a\n" +
              runner(a).df.queryExecution.toString).mkString("\n")
        }
        ok("out" -> JString(out))
      } finally runner.close()
    }

    private def iter(req: JValue): JValue = {
      val id = (req \ "id") match { case JInt(n) => n.toInt; case _ => -1 }
      val alias = jstr(req \ "alias")
      runs.get(id) match {
        case None =>
          JObject("ok" -> JBool(false), "msg" -> JString(s"no such run $id"))
        case Some(runner) if !runner.relations.contains(alias) =>
          ok("path" -> JNull) // reference: PigStats.result(unknown) == null
        case Some(runner) =>
          // stream partition-at-a-time (the reference's openIterator
          // streams from a temp STORE — P/PigServer.java:993); a
          // corpus-sized alias must never materialize on the driver
          val f = new File(iterDir, s"iter_${id}_$alias.jsonl")
          val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
            new java.io.FileOutputStream(f), StandardCharsets.UTF_8))
          var n = 0L
          try {
            val it = runner(alias).df.toLocalIterator()
            while (it.hasNext) {
              w.write(JsonMethods.compact(JsonMethods.render(
                JArray(it.next().toSeq.map(toJ).toList))))
              w.write("\n"); n += 1
            }
          } finally w.close()
          ok("path" -> JString(f.getAbsolutePath), "n" -> JInt(n))
      }
    }

    private def toJ(v: Any): JValue = v match {
      case null => JNull
      case s: String => JString(s)
      case i: Int => JInt(i)
      case l: Long => JInt(l)
      case i: java.math.BigInteger => JInt(BigInt(i))
      case d: java.math.BigDecimal => JDecimal(scala.math.BigDecimal(d))
      case d: Double => JDouble(d)
      case f: Float => JDouble(f.toDouble)
      case b: Boolean => JBool(b)
      case b: Array[Byte] => JString(new String(b, StandardCharsets.UTF_8))
      case r: org.apache.spark.sql.Row => JArray(r.toSeq.map(toJ).toList)
      case s: scala.collection.Seq[_] => JArray(s.map(toJ).toList)
      case m: scala.collection.Map[_, _] =>
        JObject(m.map { case (k, x) => String.valueOf(k) -> toJ(x) }.toList)
      case other => JString(String.valueOf(other))
    }
  }

  // ------------------------------------------------------------ shim

  /** The generated CPython package tree: `org.apache.pig.scripting`
    * (the API), plus the minimal `java.util` / `org.apache.hadoop`
    * stand-ins the reference's jython driver scripts import. */
  private lazy val shim: File = {
    val dir = Files.createTempDirectory("pig_embed_shim").toFile
    def put(rel: String, body: String): Unit = {
      val f = new File(dir, rel)
      f.getParentFile.mkdirs()
      Files.write(f.toPath, body.getBytes(StandardCharsets.UTF_8))
    }
    Seq("org/__init__.py", "org/apache/__init__.py",
      "org/apache/pig/__init__.py", "org/apache/hadoop/__init__.py",
      "java/__init__.py").foreach(put(_, ""))
    put("org/apache/pig/scripting.py", scriptingPy)
    put("java/util/__init__.py", javaUtilPy)
    put("org/apache/hadoop/conf.py", hadoopConfPy)
    put("org/apache/hadoop/fs.py", hadoopFsPy)
    dir
  }

  private val scriptingPy =
    """# org.apache.pig.scripting -- embedded Pig driver API (CPython shim).
      |# Proxies each call over a line-JSON loopback socket to the engine.
      |import json, os, re, socket, sys
      |
      |_PY3 = sys.version_info[0] >= 3
      |try:
      |    unicode
      |except NameError:       # py3 tolerance; the reference corpus is py2
      |    unicode = str
      |    long = int
      |
      |_sock = None
      |_rf = None
      |_wf = None
      |
      |def _connect():
      |    global _sock, _rf, _wf
      |    if _sock is None:
      |        _sock = socket.create_connection(
      |            ("127.0.0.1", int(os.environ["GRAFT_PIG_PORT"])))
      |        _rf = _sock.makefile("rb")
      |        _wf = _sock.makefile("wb")
      |        # handshake: the server only serves the connection that
      |        # presents its one-time token
      |        _wf.write(os.environ["GRAFT_PIG_TOKEN"].encode("utf-8") + b"\n")
      |        _wf.flush()
      |    return _rf, _wf
      |
      |class PigError(Exception):
      |    pass
      |
      |def _call(op, **kw):
      |    rf, wf = _connect()
      |    kw["op"] = op
      |    wf.write(json.dumps(kw).encode("utf-8") + b"\n")
      |    wf.flush()
      |    line = rf.readline()
      |    if not line:
      |        raise PigError("pig server connection closed")
      |    resp = json.loads(line.decode("utf-8"))
      |    if not resp.get("ok"):
      |        msg = resp.get("msg") or "pig error"
      |        sys.stderr.write(msg + "\n")
      |        raise PigError(msg)
      |    return resp
      |
      |_BASE_PARAMS = json.loads(os.environ.get("GRAFT_PIG_PARAMS") or "{}")
      |
      |def _tostr(v):
      |    # py2: jython strings are byte-strings, so unicode encodes;
      |    # py3: str IS the text type -- never encode (bytes keys would
      |    # break json.dumps on the param dict)
      |    if _PY3:
      |        return v if isinstance(v, str) else str(v)
      |    if isinstance(v, unicode):
      |        return v.encode("utf-8")
      |    return str(v)
      |
      |def _emit(out):
      |    if out:
      |        sys.stdout.write(out if out.endswith("\n") else out + "\n")
      |
      |class Pig(object):
      |    def __init__(self, script):
      |        self._script = script
      |
      |    @staticmethod
      |    def compile(*args):
      |        # compile(script) or compile(name, script)
      |        return Pig(args[-1])
      |
      |    @staticmethod
      |    def compileFromFile(*args):
      |        f = open(args[-1])   # IOError on a missing file, like the
      |        try:                 # reference's compileFromFile
      |            return Pig(f.read())
      |        finally:
      |            f.close()
      |
      |    @staticmethod
      |    def fs(cmd):
      |        # reference contract: return FsShell's rc, never raise --
      |        # drivers routinely `Pig.fs("-rmr out")` a missing dir
      |        try:
      |            _emit(_call("fs", cmd=cmd).get("out") or "")
      |            return 0
      |        except PigError:
      |            return 1
      |
      |    # session-wide context every later compile sees (reference:
      |    # Pig.registerJar/registerUDF/define/set -> ScriptPigContext)
      |    @staticmethod
      |    def registerJar(path):
      |        _call("prelude", stmt="REGISTER '%s';" % path)
      |
      |    @staticmethod
      |    def registerUDF(udffile, namespace):
      |        _call("prelude", stmt="REGISTER '%s' USING jython AS %s;"
      |              % (udffile, namespace))
      |
      |    @staticmethod
      |    def define(alias, definition):
      |        _call("prelude", stmt="DEFINE %s %s;" % (alias, definition))
      |
      |    @staticmethod
      |    def set(var, value):
      |        _call("prelude", stmt="SET %s %s;" % (var, value))
      |
      |    def bind(self, params=None):
      |        if params is None:
      |            # jython semantics: unbound $names resolve from the
      |            # CALLER's namespace, locals over globals, restricted
      |            # to names the script references
      |            frame = sys._getframe(1)
      |            scope = dict(frame.f_globals)
      |            scope.update(frame.f_locals)
      |            bound = {}
      |            for name in set(re.findall(r"\$([A-Za-z_]\w*)",
      |                                       self._script)):
      |                if name in scope and isinstance(
      |                        scope[name], (str, unicode, int, long, float)):
      |                    bound[name] = scope[name]
      |            return BoundScript(self._script, [bound])
      |        if isinstance(params, dict):
      |            return BoundScript(self._script, [params])
      |        return BoundScript(self._script, list(params))
      |
      |class BoundScript(object):
      |    def __init__(self, script, paramsets):
      |        self._script = script
      |        self._paramsets = paramsets or [{}]
      |
      |    def _params(self, i):
      |        merged = dict(_BASE_PARAMS)
      |        for k, v in self._paramsets[i].items():
      |            merged[_tostr(k)] = _tostr(v)
      |        return merged
      |
      |    def _run_one(self, i, props):
      |        pr = {}
      |        if props is not None:
      |            pr = props.toDict() if hasattr(props, "toDict") \
      |                else dict(props)
      |        try:
      |            resp = _call("run", script=self._script,
      |                         params=self._params(i), props=pr)
      |            _emit(resp.get("out") or "")
      |            return PigStats(True, resp.get("id"))
      |        except PigError:
      |            return PigStats(False, None)
      |
      |    def runSingle(self, props=None):
      |        if len(self._paramsets) > 1:
      |            raise PigError("runSingle() on a multi-bound script; "
      |                           "use run()")
      |        return self._run_one(0, props)
      |
      |    def run(self):
      |        return [self._run_one(i, None)
      |                for i in range(len(self._paramsets))]
      |
      |    def explain(self):
      |        _emit(_call("explain", script=self._script,
      |                    params=self._params(0)).get("out") or "")
      |        return None
      |
      |    def describe(self, alias):
      |        _emit(_call("describe", script=self._script, alias=alias,
      |                    params=self._params(0)).get("out") or "")
      |        return None
      |
      |    def illustrate(self):
      |        _emit(_call("illustrate", script=self._script,
      |                    params=self._params(0)).get("out") or "")
      |        return None
      |
      |class PigStats(object):
      |    def __init__(self, ok, run_id):
      |        self._ok = ok
      |        self._id = run_id
      |
      |    def isSuccessful(self):
      |        return self._ok
      |
      |    def getReturnCode(self):
      |        return 0 if self._ok else 6
      |
      |    def getAllErrorMessages(self):
      |        return []
      |
      |    def result(self, alias):
      |        if not self._ok or self._id is None:
      |            return None
      |        resp = _call("iter", id=self._id, alias=alias)
      |        path = resp.get("path")
      |        if path is None:
      |            return None  # reference: unknown alias -> null
      |        return OutputStats(path, resp.get("n") or 0)
      |
      |class OutputStats(object):
      |    def __init__(self, path, n):
      |        self._path = path
      |        self._n = n
      |
      |    def getNumberRecords(self):
      |        return self._n
      |
      |    def iterator(self):
      |        return _TupleIterator(self._path)
      |
      |class _TupleIterator(object):
      |    def __init__(self, path):
      |        self._f = open(path, "rb")
      |        self._buf = None
      |
      |    def hasNext(self):
      |        if self._buf is None:
      |            self._buf = self._f.readline()
      |        return bool(self._buf)
      |
      |    def next(self):
      |        if not self.hasNext():
      |            raise StopIteration()
      |        line, self._buf = self._buf, None
      |        return Tuple(json.loads(line.decode("utf-8")))
      |
      |class Tuple(object):
      |    def __init__(self, vals):
      |        self._v = vals
      |
      |    def get(self, i):
      |        v = self._v[i]
      |        if not _PY3 and isinstance(v, unicode):
      |            return v.encode("utf-8")
      |        return v
      |
      |    def size(self):
      |        return len(self._v)
      |
      |    def __str__(self):
      |        return "(" + ",".join([_tostr(x) for x in self._v]) + ")"
      |""".stripMargin

  private val javaUtilPy =
    """# java.util stand-in for driver scripts (`from java.util import
      |# Properties`) -- the reference runs them under jython where this
      |# is real java; here a dict wrapper with the same call surface.
      |class Properties(object):
      |    def __init__(self):
      |        self._d = {}
      |
      |    def put(self, k, v):
      |        old = self._d.get(k)
      |        self._d[k] = v
      |        return old
      |
      |    def get(self, k):
      |        return self._d.get(k)
      |
      |    def setProperty(self, k, v):
      |        return self.put(k, v)
      |
      |    def getProperty(self, k, default=None):
      |        return self._d.get(k, default)
      |
      |    def toDict(self):
      |        return dict(self._d)
      |""".stripMargin

  private val hadoopConfPy =
    """# org.apache.hadoop.conf stand-in (jython-interop shim).
      |class Configuration(object):
      |    def __init__(self, *args):
      |        self._d = {}
      |
      |    def set(self, k, v):
      |        self._d[k] = v
      |
      |    def get(self, k, default=None):
      |        return self._d.get(k, default)
      |""".stripMargin

  private val hadoopFsPy =
    """# org.apache.hadoop.fs stand-in (jython-interop shim): the engine's
      |# filesystem is the local one.
      |import os
      |
      |class Path(object):
      |    def __init__(self, p):
      |        self.p = str(p)
      |
      |    def __str__(self):
      |        return self.p
      |
      |class FileSystem(object):
      |    @staticmethod
      |    def get(conf):
      |        return FileSystem()
      |
      |    def exists(self, path):
      |        return os.path.exists(str(path))
      |""".stripMargin
}
