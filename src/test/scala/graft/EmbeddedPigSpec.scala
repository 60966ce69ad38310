package graft

import java.io.File
import java.nio.file.{Files, Paths}
import java.util.regex.Pattern

/** Runs the REFERENCE'S OWN embedded-scripting e2e suite
  * (test/e2e/pig/tests/turing_jython.conf — the `Pig.compile().bind()
  * .run()` driver API) verbatim. The reference executes these driver
  * scripts under in-JVM jython; this engine runs the same py2-era
  * sources under CPython 2.7 with the generated
  * `org.apache.pig.scripting` shim proxying to
  * [[graft.frontend.EmbeddedPig]]. Each test honors the conf's own
  * checks: expected rc (zero vs nonzero), expected_out_regex /
  * expected_err_regex, and verify_pig_script differential comparison
  * on this engine. */
class EmbeddedPigSpec extends SparkSpec {

  private val confPath =
    "/root/reference/test/e2e/pig/tests/turing_jython.conf"
  private val paramPath = "/root/reference/test/e2e/pig/paramfiles"
  private val py2 = "/root/.pyenv/versions/2.7.18/bin/python2"

  private case class JyTest(group: String, num: Int, pig: String,
      verify: Option[String], rc: Int, outRegex: Option[String],
      errRegex: Option[String], params: Map[String, String],
      cmdArgs: Seq[String])

  /** Perl q<delim>...<delim> body unescape: inside a q-quoted string
    * only `\<delim>` and `\\` collapse (left-to-right); everything
    * else is literal. (The Iterator test's python source carries
    * `"\\t"` which must reach python as the two-char escape `\t`.) */
  private def unescapeQ(body: String, delim: Char): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length &&
          (body.charAt(i + 1) == '\\' || body.charAt(i + 1) == delim)) {
        sb.append(body.charAt(i + 1)); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Perl double-quoted escapes (same rule as E2eSpec.perlUnescape). */
  private def perlUnescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case c   => sb.append(c)
        }
        i += 2
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private lazy val tests: Seq[JyTest] = {
    val conf = new String(Files.readAllBytes(Paths.get(confPath)), "UTF-8")
    val groupRe =
      ("""(?s)\{\s*\n(?:\s*#[^\n]*\n)*\s*'name' => '([^']+)'(.*?)""" +
       """(?=\{\s*\n(?:\s*#[^\n]*\n)*\s*'name' => '|\z)""").r
    def qField(entry: String, field: String): Option[String] =
      (s"(?s)'$field' =>\\s*q([\\\\?#@])(.*?)\\1").r
        .findFirstMatchIn(entry)
        .map(m => unescapeQ(m.group(2), m.group(1).charAt(0)))
    def dqField(entry: String, field: String): Option[String] =
      (s"(?s)'$field' =>\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
        .findFirstMatchIn(entry).map(m => perlUnescape(m.group(1)))
    groupRe.findAllMatchIn(conf).flatMap { g =>
      val group = g.group(1)
      val body = g.group(2)
      val starts = """'num' =>""".r.findAllMatchIn(body).map(_.start).toSeq
      if (starts.isEmpty) Seq.empty
      else starts.zipAll(starts.drop(1), 0, body.length).map { case (a, b) =>
        val entry = body.substring(a, b)
        val num = """'num' =>\s*(\d+)""".r.findFirstMatchIn(entry)
          .map(_.group(1).toInt).getOrElse(0)
        val pig = qField(entry, "pig").getOrElse(
          fail(s"turing_jython.conf $group/$num: no pig script extracted"))
        val rc = """'rc'\s*=>\s*(\d+)""".r.findFirstMatchIn(entry)
          .map(_.group(1).toInt).getOrElse(0)
        // pig_params: the two concrete forms the conf uses —
        // ['-p', qq(k='v')] inline and ['-m', ":PARAMPATH:/file"]
        val inlineParam = """\['-p',\s*qq\(([^=]+)=(.*?)\)\]""".r
          .findFirstMatchIn(entry)
          .map(m => Map(m.group(1).trim ->
            m.group(2).trim.stripPrefix("'").stripSuffix("'")))
        val fileParam = """\['-m',\s*"([^"]+)"\]""".r
          .findFirstMatchIn(entry).map { m =>
            val f = m.group(1).replace(":PARAMPATH:", paramPath)
            new String(Files.readAllBytes(Paths.get(f)), "UTF-8")
              .split("\n").map(_.trim)
              .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
              .map { l =>
                val Array(k, v) = l.split("=", 2)
                k.trim -> v.trim.stripPrefix("'").stripSuffix("'")
              }.toMap
          }
        val cmdArgs = """'additional_cmd_args' =>\s*\['([^']*)'\]""".r
          .findFirstMatchIn(entry).map(m => Seq(m.group(1)))
          .getOrElse(Seq.empty)
        JyTest(group, num, pig,
          verify = qField(entry, "verify_pig_script"),
          rc = rc,
          outRegex = dqField(entry, "expected_out_regex"),
          errRegex = dqField(entry, "expected_err_regex"),
          params = inlineParam.orElse(fileParam).getOrElse(Map.empty),
          cmdArgs = cmdArgs)
      }
    }.toSeq
  }

  // ------------------------------------------------------ output compare
  // (same canonicalization as E2eSpec's python-UDF differential: floats
  // to 6 significant digits — the conf's floatpostprocess rule)
  private def canon(v: Any): String = v match {
    case null => ""
    case d: Double => f"$d%.6g"
    case f: Float => f"${f.toDouble}%.6g"
    case s: scala.collection.Seq[_] => s.map(canon).mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row =>
      r.toSeq.map(canon).mkString("(", ",", ")")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"$k#${canon(x)}" }
        .toSeq.sorted.mkString("[", ",", "]")
    case other =>
      val s = String.valueOf(other)
      if (s.matches("-?\\d+\\.\\d+([eE].*)?")) f"${s.toDouble}%.6g" else s
  }

  /** Read one output dir as canonical sorted rows: parquet (this
    * engine's STORE) or plain text part files (the Iterator test
    * copies a python-written TSV into place). */
  private def readAll(dir: java.nio.file.Path): Seq[String] = {
    if (!Files.exists(dir)) return Seq.empty
    val files = Files.list(dir).iterator()
    var isParquet = false
    while (files.hasNext) {
      val n = files.next().getFileName.toString
      if (n.endsWith(".parquet")) isParquet = true
    }
    if (isParquet)
      spark.read.parquet(dir.toString).collect().toSeq
        .map(_.toSeq.map(canon).mkString("\t")).sorted
    else {
      val parts = Files.list(dir).iterator()
      val lines = scala.collection.mutable.ArrayBuffer.empty[String]
      while (parts.hasNext) {
        val p = parts.next()
        if (!Files.isDirectory(p) &&
            !p.getFileName.toString.startsWith("_") &&
            !p.getFileName.toString.startsWith("."))
          lines ++= new String(Files.readAllBytes(p), "UTF-8")
            .split("\n").filter(_.nonEmpty)
            .map(_.split("\t", -1).map(canon(_)).mkString("\t"))
      }
      lines.toSeq.sorted
    }
  }

  /** All outputs sharing a base path, keyed by suffix ("" or ".1"...). */
  private def outputsOf(base: java.nio.file.Path): Map[String, java.nio.file.Path] = {
    val parent = base.getParent
    val prefix = base.getFileName.toString
    if (!Files.exists(parent)) return Map.empty
    val it = Files.list(parent).iterator()
    val m = scala.collection.mutable.Map.empty[String, java.nio.file.Path]
    while (it.hasNext) {
      val p = it.next()
      val n = p.getFileName.toString
      if (n.startsWith(prefix)) m(n.stripPrefix(prefix)) = p
    }
    m.toMap
  }

  test("turing_jython.conf: the reference's embedded-scripting e2e " +
       "suite runs VERBATIM under CPython 2.7") {
    assume(new File(py2).exists(), "python 2.7 not installed")
    assert(tests.size >= 29,
      s"expected the full 29-test suite, extracted ${tests.size}")
    val outBase = Files.createTempDirectory("pig_jython_out")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    tests.foreach { t =>
      val tag = s"${t.group}_${t.num}"
      val tmpDir = Files.createTempDirectory(s"jy_tmp_$tag").toFile
      def subst(s: String, side: String) = s
        .replace(":INPATH:", E2eFixtures.dir)
        .replace(":OUTPATH:", s"$outBase/${side}_$tag")
        .replace(":TMP:", tmpDir.getPath)
        .replace(":PARAMPATH:", paramPath)
      try {
        val res = graft.frontend.EmbeddedPig.runScript(spark,
          subst(t.pig, "got"), cmdArgs = t.cmdArgs, baseParams = t.params,
          cwd = tmpDir, pythonExe = py2, timeoutSec = 180L)
        if ((res.rc == 0) != (t.rc == 0))
          failures += s"$tag: rc ${res.rc} (expected ${t.rc}); " +
            s"stderr: ${res.stderr.takeRight(300)}"
        else {
          t.outRegex.foreach { r =>
            if (!Pattern.compile(r, Pattern.DOTALL)
                 .matcher(res.stdout).find())
              failures += s"$tag: stdout !~ /$r/; got: " +
                res.stdout.take(300)
          }
          t.errRegex.foreach { r =>
            if (!Pattern.compile(r, Pattern.DOTALL)
                 .matcher(res.stderr).find())
              failures += s"$tag: stderr !~ /$r/; got: " +
                res.stderr.takeRight(300)
          }
          t.verify.foreach { v =>
            graft.frontend.PigRunner(spark).run(subst(v, "exp"))
            val got = outputsOf(Paths.get(s"$outBase/got_$tag"))
            val exp = outputsOf(Paths.get(s"$outBase/exp_$tag"))
            // the driver side may store extra scratch outputs (the
            // Iterator test's :OUTPATH:.tmp); every EXPECTED output
            // must exist and match
            if (!exp.keySet.subsetOf(got.keySet))
              failures += s"$tag: output set ${got.keySet} != ${exp.keySet}"
            else exp.keys.foreach { sfx =>
              val (g, e) = (readAll(got(sfx)), readAll(exp(sfx)))
              if (g != e)
                failures += s"$tag$sfx: ${g.size} rows vs ${e.size} " +
                  s"(first diff: ${g.zipAll(e, "<none>", "<none>")
                    .find(p => p._1 != p._2)})"
            }
          }
        }
      } catch {
        case e: Throwable =>
          failures += s"$tag: ${String.valueOf(e.getMessage).take(300)}"
      } finally GraftSession.unpersistAll()
    }
    info(s"turing_jython.conf: ${tests.size - failures.size}/${tests.size} pass")
    assert(failures.isEmpty,
      s"${failures.size}/${tests.size} failed:\n${failures.mkString("\n")}")
  }

  test("python3 driver: bind(dict) params, Pig.fs rc contract, " +
       "runSingle(props) session carry-over") {
    val tmp = Files.createTempDirectory("jy_py3").toFile
    val f = s"${E2eFixtures.dir}/singlefile/studenttab10k"
    val driver =
      s"""from org.apache.pig.scripting import Pig
         |from java.util import Properties
         |
         |# fs returns FsShell's rc (never raises) -- common
         |# Pig.fs("-rmr out")-then-run driver pattern
         |rc = Pig.fs("-rm -r ${tmp.getPath}/definitely_missing_xyz")
         |assert rc != 0, "fs on a missing path must return nonzero"
         |
         |P = Pig.compile('''
         |A = load '$f' as (name:chararray, age:int, gpa:double);
         |B = filter A by age > $$minage;
         |store B into '${tmp.getPath}/out1';
         |''')
         |result = P.bind({'minage': '50'}).runSingle()
         |assert result.isSuccessful(), "bind(dict) run failed"
         |it = result.result("B").iterator()
         |n = 0
         |while it.hasNext():
         |    t = it.next()
         |    assert int(t.get(1)) > 50, "param not applied: %s" % t
         |    n += 1
         |print("ROWS=%d" % n)
         |
         |# properties persist into the session (reference: PigContext
         |# getProperties().putAll) -- a later no-props run still sees them
         |p = Properties()
         |p.put("pig.default.load.func", "com.acme.MissingLoader")
         |s1 = Pig.compile(
         |    "A = load '$f'; store A into '${tmp.getPath}/o1';"
         |).bind({}).runSingle(p)
         |assert not s1.isSuccessful(), "unresolvable loader must fail"
         |s2 = Pig.compile(
         |    "A = load '$f'; store A into '${tmp.getPath}/o2';"
         |).bind({}).runSingle()
         |assert not s2.isSuccessful(), "props must persist into session"
         |print("PROPS-CARRY OK")
         |""".stripMargin
    try {
      val res = graft.frontend.EmbeddedPig.runScript(spark, driver,
        cwd = tmp, pythonExe = "python3", timeoutSec = 180L)
      assert(res.rc == 0, s"py3 driver failed: ${res.stderr.takeRight(800)}")
      assert(res.stdout.contains("PROPS-CARRY OK"), res.stdout.take(500))
      val n = "ROWS=(\\d+)".r.findFirstMatchIn(res.stdout)
        .map(_.group(1).toInt).getOrElse(-1)
      assert(n > 0 && n < 10000, s"filtered row count off: $n")
    } finally GraftSession.unpersistAll()
  }

  test("result(alias).iterator() streams partition-at-a-time " +
       "(no driver-side collect of the whole relation)") {
    val tmp = Files.createTempDirectory("jy_iter").toFile
    val f = s"${E2eFixtures.dir}/singlefile/studenttab10k"
    val driver =
      s"""from org.apache.pig.scripting import Pig
         |P = Pig.compile(
         |    "A = load '$f' as (name:chararray, age:int, gpa:double);")
         |r = P.bind().runSingle()
         |it = r.result("A").iterator()
         |n = 0
         |while it.hasNext():
         |    it.next()
         |    n += 1
         |print("N=%d" % n)
         |""".stripMargin
    // force a multi-partition scan, then count Spark jobs while the
    // driver iterates: toLocalIterator submits one job per partition,
    // a collect() exactly one — >=2 jobs proves streaming
    val prevMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val res = graft.frontend.EmbeddedPig.runScript(spark, driver,
        cwd = tmp, pythonExe = "python3", timeoutSec = 180L)
      assert(res.rc == 0, s"driver failed: ${res.stderr.takeRight(500)}")
      // the regenerated fixture holds 1000 rows + 3 pinned alice-allen
      assert(res.stdout.contains("N=1003"), res.stdout.take(300))
      // listener events are async; give the bus a moment to drain
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (jobs.get() < 2 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(jobs.get() >= 2,
        s"expected one job per partition (streaming); saw ${jobs.get()}")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevMax)
      GraftSession.unpersistAll()
    }
  }

  test("Pig.registerUDF/define/set feed every later compile " +
       "(ScriptPigContext prelude semantics)") {
    assume(new File(py2).exists(), "python 2.7 not installed")
    val tmp = Files.createTempDirectory("jy_prelude").toFile
    val out = new File(tmp, "out").getPath
    // a python UDF file the driver registers under a namespace
    Files.write(new File(tmp, "udf.py").toPath,
      """@outputSchema("sq:int")
        |def square(n):
        |    return n * n
        |""".stripMargin.getBytes("UTF-8"))
    val q3 = "\"\"\""
    val driver =
      s"""#!/usr/bin/python
         |from org.apache.pig.scripting import Pig
         |
         |Pig.set("default_parallel", "8")
         |Pig.define("MYUP", "UPPER()")
         |Pig.registerUDF("${tmp.getPath}/udf.py", "myfuncs")
         |
         |P = Pig.compile(${q3}
         |A = load '${E2eFixtures.dir}/singlefile/studenttab10k'
         |    as (name:chararray, age:int, gpa:double);
         |B = foreach A generate MYUP(name) as nm, myfuncs.square(age) as sq;
         |store B into '$out';
         |${q3})
         |result = P.bind().runSingle()
         |if result.isSuccessful():
         |    print "Pig job PASSED"
         |else:
         |    raise Exception("Pig job FAILED")
         |""".stripMargin
    val prev = sys.props.get("graft.python")
    sys.props("graft.python") = py2
    try {
      val res = graft.frontend.EmbeddedPig.runScript(spark, driver,
        cwd = tmp, pythonExe = py2, timeoutSec = 180L)
      assert(res.rc == 0, s"driver failed: ${res.stderr.takeRight(500)}")
      assert(res.stdout.contains("Pig job PASSED"))
      val rows = spark.read.parquet(out).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val nm = r.getString(0)
        assert(nm == nm.toUpperCase, s"MYUP (DEFINE'd UPPER) not applied: $nm")
      }
      // spot-check the python UDF: sq must be a perfect square of an age
      val sq = rows.head.get(1).toString.toLong
      val root = math.sqrt(sq.toDouble).round
      assert(root * root == sq, s"myfuncs.square not applied: $sq")
    } finally {
      prev match {
        case Some(v) => sys.props("graft.python") = v
        case None => sys.props.remove("graft.python")
      }
      GraftSession.unpersistAll()
    }
  }
}
