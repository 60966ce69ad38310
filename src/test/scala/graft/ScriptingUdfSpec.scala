package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.frontend.PigRunner
import graft.functions.PyUdfs

/** REGISTER surfaces (VERDICT r9 items 3+4): user EvalFunc jars
  * (reference: P/PigServer.java registerJar) and streaming python UDFs
  * (reference: P/scripting/streaming/python/PythonScriptEngine.java,
  * P/impl/builtin/StreamingUDF.java). The jar below is COMPILED IN-TEST
  * against the engine's org.apache.pig API facade — the same binary
  * surface a real user jar links against. */
class ScriptingUdfSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ----------------------------------------------------------- python

  private def writePy(body: String): String = {
    val f = Files.createTempFile("graft_udfs", ".py")
    Files.write(f, body.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  test("streaming_python: decorator discovery matches the reference's rule") {
    val fns = PyUdfs.functionsIn(
      """from pig_util import outputSchema
        |
        |@outputSchema("word:chararray")
        |def rev(s):
        |    return s[::-1]
        |
        |def helper(x):
        |    return x
        |
        |@outputSchema('n:long')
        |def wordcount(s):
        |    return len(s.split())
        |""".stripMargin)
    assert(fns == Seq(("rev", "word:chararray"), ("wordcount", "n:long")))
  }

  test("streaming_python: REGISTER + ns.fn call end-to-end on a relation") {
    val py = writePy(
      """from pig_util import outputSchema
        |
        |@outputSchema("rev:chararray")
        |def rev(s):
        |    return None if s is None else s[::-1]
        |
        |@outputSchema("n:long")
        |def nwords(s):
        |    return 0 if s is None else len(s.split())
        |""".stripMargin)
    val out = PigRunner(spark).run(s"""
      REGISTER '$py' USING streaming_python AS myfuncs;
      n = LOAD '$dir/nation.parquet';
      r = FOREACH n GENERATE n_name, myfuncs.rev(n_name) AS rev,
                             myfuncs.nwords(n_name) AS nw;
    """).apply("r").df.collect()
    assert(out.length == 25)
    out.foreach { row =>
      assert(row.getString(1) == row.getString(0).reverse)
      assert(row.getLong(2) > 0)
    }
  }

  test("streaming_python: tuple and bag returns map to struct and array") {
    val py = writePy(
      """@outputSchema("t:(a:int,b:int)")
        |def minmax(s):
        |    xs = [len(w) for w in s.split()]
        |    return (min(xs), max(xs))
        |
        |@outputSchema("b:{t:(w:chararray)}")
        |def words(s):
        |    return [(w,) for w in s.split()]
        |""".stripMargin)
    val out = PigRunner(spark).run(s"""
      REGISTER '$py' USING streaming_python AS f;
      n = LOAD '$dir/region.parquet';
      r = FOREACH n GENERATE r_name, f.minmax(r_name) AS mm,
                             f.words(r_name) AS ws;
    """).apply("r").df.collect()
    assert(out.length == 5)
    out.foreach { row =>
      val mm = row.getStruct(1)
      assert(mm.getInt(0) <= mm.getInt(1))
      val ws = row.getSeq[org.apache.spark.sql.Row](2)
      assert(ws.map(_.getString(0)).mkString(" ") == row.getString(0))
    }
  }

  test("streaming_python: a python exception surfaces with the traceback") {
    val py = writePy(
      """@outputSchema("x:long")
        |def boom(s):
        |    raise ValueError("kapow: " + s)
        |""".stripMargin)
    val e = intercept[Exception] {
      PigRunner(spark).run(s"""
        REGISTER '$py' USING streaming_python AS f;
        n = LOAD '$dir/region.parquet';
        r = FOREACH n GENERATE f.boom(r_name) AS x;
        STORE r INTO '${Files.createTempDirectory("pyboom")}/out' USING PigStorage();
      """)
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("kapow")), e.toString)
  }

  test("streaming_python: missing file errors like the reference (101)") {
    val e = intercept[IllegalArgumentException] {
      PigRunner(spark).run("REGISTER '/no/such/file.py' USING streaming_python AS f;")
    }
    assert(e.getMessage.contains("ERROR 101"))
  }

  // -------------------------------------------------------------- jar

  /** Compile EvalFunc sources against the engine's facade and jar them. */
  private lazy val sampleJar: String = {
    val tmp = Files.createTempDirectory("graft_jarudf").toFile
    val srcDir = new File(tmp, "src"); srcDir.mkdirs()
    val clsDir = new File(tmp, "classes"); clsDir.mkdirs()
    def writeSrc(rel: String, body: String): File = {
      val f = new File(srcDir, rel)
      f.getParentFile.mkdirs()
      Files.write(f.toPath, body.getBytes(StandardCharsets.UTF_8))
      f
    }
    val exclaim = writeSrc("com/example/udf/Exclaim.java",
      """package com.example.udf;
        |import java.io.IOException;
        |import org.apache.pig.EvalFunc;
        |import org.apache.pig.data.Tuple;
        |public class Exclaim extends EvalFunc<String> {
        |  private final String suffix;
        |  public Exclaim() { this("!"); }
        |  public Exclaim(String s) { suffix = s; }
        |  public String exec(Tuple input) throws IOException {
        |    Object o = input.get(0);
        |    return o == null ? null : o.toString() + suffix;
        |  }
        |}
        |""".stripMargin)
    val addTwo = writeSrc("com/example/udf/AddTwo.java",
      """package com.example.udf;
        |import java.io.IOException;
        |import org.apache.pig.EvalFunc;
        |import org.apache.pig.data.Tuple;
        |public class AddTwo extends EvalFunc<Long> {
        |  public Long exec(Tuple input) throws IOException {
        |    Object a = input.get(0), b = input.get(1);
        |    if (a == null || b == null) return null;
        |    return ((Number) a).longValue() + ((Number) b).longValue();
        |  }
        |}
        |""".stripMargin)
    val isLong = writeSrc("com/example/udf/IsLongName.java",
      """package com.example.udf;
        |import java.io.IOException;
        |import org.apache.pig.FilterFunc;
        |import org.apache.pig.data.Tuple;
        |public class IsLongName extends FilterFunc {
        |  public Boolean exec(Tuple input) throws IOException {
        |    Object o = input.get(0);
        |    return o != null && o.toString().length() > 6;
        |  }
        |}
        |""".stripMargin)
    // classpath = wherever the engine's facade classes live right now
    val facadeCp = classOf[org.apache.pig.EvalFunc[_]]
      .getProtectionDomain.getCodeSource.getLocation.getPath
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    val rc = javac.run(null, null, null,
      "-cp", facadeCp, "-d", clsDir.getPath,
      exclaim.getPath, addTwo.getPath, isLong.getPath)
    assert(rc == 0, "sample EvalFunc javac failed")
    val jar = new File(tmp, "myudfs.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    def addAll(dir: File, prefix: String): Unit =
      dir.listFiles().foreach { f =>
        if (f.isDirectory) addAll(f, prefix + f.getName + "/")
        else {
          jos.putNextEntry(new java.util.jar.JarEntry(prefix + f.getName))
          jos.write(Files.readAllBytes(f.toPath))
          jos.closeEntry()
        }
      }
    addAll(clsDir, "")
    jos.close()
    jar.getPath
  }

  test("REGISTER jar: FQN call, bare-name call, and DEFINE'd ctor args") {
    val out = PigRunner(spark).run(s"""
      REGISTER '$sampleJar';
      DEFINE shout com.example.udf.Exclaim('!!');
      n = LOAD '$dir/region.parquet';
      r = FOREACH n GENERATE r_name,
            com.example.udf.Exclaim(r_name) AS e1,
            AddTwo(r_regionkey, 40) AS s1,
            shout(r_name) AS e2;
    """).apply("r").df.collect()
    assert(out.length == 5)
    out.foreach { row =>
      assert(row.getString(1) == row.getString(0) + "!")
      assert(row.getLong(2) == row.getAs[Long]("s1"))
      assert(row.getString(3) == row.getString(0) + "!!")
    }
    val expectSum = PigRunner(spark).run(s"""
      n = LOAD '$dir/region.parquet';
      r = FOREACH n GENERATE r_regionkey;
    """).apply("r").df.collect().map(_.getInt(0).toLong).sorted
    assert(out.map(_.getLong(2) - 40).sorted.toSeq == expectSum.toSeq)
  }

  test("REGISTER jar: FilterFunc usable in FILTER BY") {
    val out = PigRunner(spark).run(s"""
      REGISTER '$sampleJar';
      n = LOAD '$dir/nation.parquet';
      f = FILTER n BY com.example.udf.IsLongName(n_name);
      r = FOREACH f GENERATE n_name;
    """).apply("r").df.collect().map(_.getString(0))
    assert(out.nonEmpty && out.forall(_.length > 6))
  }

  test("@MonitoredUDF: a wedged exec times out and yields the annotated " +
       "default (reference: builtin/MonitoredUDF + MonitoredUDFExecutor)") {
    val tmp = Files.createTempDirectory("graft_monudf").toFile
    val src = new File(tmp, "Wedged.java")
    Files.write(src.toPath,
      """import java.io.IOException;
        |import java.util.concurrent.TimeUnit;
        |import org.apache.pig.EvalFunc;
        |import org.apache.pig.builtin.MonitoredUDF;
        |import org.apache.pig.data.Tuple;
        |@MonitoredUDF(timeUnit = TimeUnit.MILLISECONDS, duration = 200,
        |              stringDefault = {"dflt"})
        |public class Wedged extends EvalFunc<String> {
        |  public String exec(Tuple input) throws IOException {
        |    try { Thread.sleep(60000); } catch (InterruptedException e) {}
        |    return "never";
        |  }
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val cls = new File(tmp, "classes"); cls.mkdirs()
    val facadeCp = classOf[org.apache.pig.EvalFunc[_]]
      .getProtectionDomain.getCodeSource.getLocation.getPath
    assert(javax.tools.ToolProvider.getSystemJavaCompiler.run(null, null,
      null, "-cp", facadeCp, "-d", cls.getPath, src.getPath) == 0)
    val jar = new File(tmp, "wedged.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    jos.putNextEntry(new java.util.jar.JarEntry("Wedged.class"))
    jos.write(Files.readAllBytes(new File(cls, "Wedged.class").toPath))
    jos.closeEntry(); jos.close()
    val out = PigRunner(spark).run(s"""
      REGISTER '${jar.getPath}';
      n = LOAD '$dir/region.parquet';
      r = FOREACH n GENERATE Wedged(r_name) AS w;
    """).apply("r").df.collect().map(_.getString(0))
    assert(out.length == 5 && out.forall(_ == "dflt"), out.toSeq)
  }

  test("REGISTER statements spanning lines: path on a continuation " +
       "line, USING clause split across lines (review: the end-at-" +
       "newline rule must not truncate them)") {
    val py = writePy(
      """@outputSchema("n:long")
        |def one(s):
        |    return 1
        |""".stripMargin)
    val out = PigRunner(spark).run(s"""
      REGISTER
        '$sampleJar';
      REGISTER '$py' USING
        streaming_python AS f;
      n = LOAD '$dir/region.parquet';
      r = FOREACH n GENERATE AddTwo(r_regionkey, 1) AS s, f.one(r_name) AS o;
    """).apply("r").df.collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(1) == 1L))
  }

  test("REGISTER jar: missing file errors like the reference (101)") {
    val e = intercept[IllegalArgumentException] {
      PigRunner(spark).run("REGISTER '/no/such/thing.jar';")
    }
    assert(e.getMessage.contains("ERROR 101"))
  }

  // ------------------------------------------------- custom partitioner

  /** Compile a deterministic key%n partitioner against the facade +
    * hadoop (reference shape: test/e2e/.../SimpleCustomPartitioner2
    * extends Partitioner<PigNullableWritable, Writable>). */
  private lazy val partitionerJar: String = {
    val tmp = Files.createTempDirectory("graft_part").toFile
    val src = new File(tmp, "ModPartitioner.java")
    Files.write(src.toPath,
      """import org.apache.hadoop.io.Writable;
        |import org.apache.hadoop.mapreduce.Partitioner;
        |import org.apache.pig.impl.io.PigNullableWritable;
        |public class ModPartitioner
        |    extends Partitioner<PigNullableWritable, Writable> {
        |  @Override
        |  public int getPartition(PigNullableWritable key, Writable value,
        |                          int n) {
        |    Object v = key.getValueAsPigType();
        |    if (v instanceof Number)
        |      return (int) (((Number) v).longValue() % n);
        |    return (key.hashCode() & Integer.MAX_VALUE) % n;
        |  }
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    // a misbehaving partitioner: returns the RAW key as the partition
    // id, so any key >= n exercises the illegal-partition guard
    val bad = new File(tmp, "RawKeyPartitioner.java")
    Files.write(bad.toPath,
      """import org.apache.hadoop.io.Writable;
        |import org.apache.hadoop.mapreduce.Partitioner;
        |import org.apache.pig.impl.io.PigNullableWritable;
        |public class RawKeyPartitioner
        |    extends Partitioner<PigNullableWritable, Writable> {
        |  @Override
        |  public int getPartition(PigNullableWritable key, Writable value,
        |                          int n) {
        |    return (int) ((Number) key.getValueAsPigType()).longValue();
        |  }
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    // a ComparisonFunc (reference OrdDesc shape) riding the same jar
    val cmp = new File(tmp, "DescCmp.java")
    Files.write(cmp.toPath,
      """import org.apache.pig.ComparisonFunc;
        |import org.apache.pig.data.Tuple;
        |public class DescCmp extends ComparisonFunc {
        |  public int compare(Tuple t1, Tuple t2) {
        |    return t2.compareTo(t1);
        |  }
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val cls = new File(tmp, "classes"); cls.mkdirs()
    def cpOf(c: Class[_]) =
      c.getProtectionDomain.getCodeSource.getLocation.getPath
    val cp = Seq(cpOf(classOf[org.apache.pig.EvalFunc[_]]),
      cpOf(classOf[org.apache.hadoop.mapreduce.Partitioner[_, _]]),
      cpOf(classOf[org.apache.hadoop.io.Writable]))
      .distinct.mkString(File.pathSeparator)
    assert(javax.tools.ToolProvider.getSystemJavaCompiler.run(null, null,
      null, "-cp", cp, "-d", cls.getPath, src.getPath, bad.getPath,
      cmp.getPath) == 0,
      "partitioner javac failed")
    val jar = new File(tmp, "partitioner.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    Seq("ModPartitioner.class", "RawKeyPartitioner.class",
        "DescCmp.class").foreach { n =>
      jos.putNextEntry(new java.util.jar.JarEntry(n))
      jos.write(Files.readAllBytes(new File(cls, n).toPath))
      jos.closeEntry()
    }
    jos.close()
    jar.getPath
  }

  test("ORDER BY ... USING a ComparisonFunc: total sort under the user " +
       "comparator, top-level ($0, *) and nested-in-FOREACH") {
    val runner = PigRunner(spark).run(s"""
      REGISTER '$partitionerJar';
      n = LOAD '$dir/nation.parquet';
      s = ORDER n BY n_nationkey USING DescCmp;
      w = ORDER n BY * USING DescCmp;
      g = GROUP n BY n_regionkey;
      f = FOREACH g { srt = ORDER n BY n_name USING DescCmp;
                      GENERATE group, srt.n_name AS names; }
    """)
    def keyseq(alias: String): Seq[Long] =
      runner(alias).df.collect()
        .map(_.getAs[Number]("n_nationkey").longValue).toSeq
    assert(keyseq("s") == (0L until 25L).reverse, "BY $0 USING DescCmp")
    // BY * passes the whole row; first field dominates → same order
    assert(keyseq("w") == (0L until 25L).reverse, "BY * USING DescCmp")
    // nested: each group's bag is name-descending
    runner("f").df.collect().foreach { r =>
      val names = r.getSeq[String](1)
      assert(names == names.sorted.reverse, s"group ${r.get(0)}: $names")
    }
  }

  test("GROUP ... PARTITION BY customPartitioner PARALLEL n routes each " +
       "group to the partition the user class picks") {
    val runner = PigRunner(spark).run(s"""
      REGISTER '$partitionerJar';
      n = LOAD '$dir/nation.parquet';
      g = GROUP n BY n_regionkey PARTITION BY ModPartitioner PARALLEL 3;
      c = FOREACH g GENERATE group, COUNT(n) AS cnt;
    """)
    // placement: every group-key row sits in partition key % 3
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    val placed = runner("g").df
      .select(col("group"), spark_partition_id().as("pid")).collect()
    assert(placed.length == 5)
    placed.foreach { r =>
      assert(r.getInt(1) == (r.getAs[Number](0).longValue % 3).toInt,
        s"group ${r.get(0)} in partition ${r.get(1)}")
    }
    assert(runner("g").df.rdd.getNumPartitions == 3)
    // content: identical to an unpartitioned GROUP + COUNT
    val got = runner("c").df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1))).sorted.toSeq
    val want = spark.read.parquet(s"$dir/nation.parquet")
      .groupBy("n_regionkey").count().collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1))).sorted.toSeq
    assert(got == want)
  }

  test("JOIN/DISTINCT accept PARTITION BY; out-of-range partition ids " +
       "fail loudly (MR 'Illegal partition' contract)") {
    val runner = PigRunner(spark).run(s"""
      REGISTER '$partitionerJar';
      n = LOAD '$dir/nation.parquet';
      r = LOAD '$dir/region.parquet';
      j = JOIN n BY n_regionkey, r BY r_regionkey PARTITION BY ModPartitioner PARALLEL 2;
      d = FOREACH n GENERATE n_regionkey;
      dd = DISTINCT d PARTITION BY ModPartitioner PARALLEL 5;
    """)
    assert(runner("j").df.count() == 25)
    assert(runner("j").df.rdd.getNumPartitions == 2)
    // DISTINCT routes by the whole row (here a 1-col row; hash path)
    assert(runner("dd").df.collect()
      .map(_.getAs[Number](0).longValue).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
    // a partitioner returning pid >= n must fail, not wrap silently
    val e = intercept[Exception] {
      PigRunner(spark).run(s"""
        REGISTER '$partitionerJar';
        n = LOAD '$dir/nation.parquet';
        g = GROUP n BY n_regionkey PARTITION BY RawKeyPartitioner PARALLEL 2;
      """).apply("g").df.count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("Illegal partition")), e.toString)
  }

  // --------------------------------------------- jar load/store funcs

  /** A PigStorage-derived loader and storer, compiled in-test (the
    * LoadFunc/StoreFunc bridge's content-level check — the e2e corpus
    * only verifies stores materialize). */
  private lazy val storageJar: String = {
    val tmp = Files.createTempDirectory("graft_jarstorage").toFile
    def src(n: String, body: String): File = {
      val f = new File(tmp, n)
      Files.write(f.toPath, body.getBytes(StandardCharsets.UTF_8)); f
    }
    val up = src("UpperLoader.java",
      """import java.io.IOException;
        |import org.apache.pig.builtin.PigStorage;
        |import org.apache.pig.data.Tuple;
        |public class UpperLoader extends PigStorage {
        |  public UpperLoader() { super(); }
        |  public UpperLoader(String d) { super(d); }
        |  @Override
        |  public Tuple getNext() throws IOException {
        |    try {
        |      Tuple t = super.getNext();
        |      if (t != null && t.size() > 0 && t.get(0) != null)
        |        t.set(0, t.get(0).toString().toUpperCase());
        |      return t;
        |    } catch (Exception e) { throw new IOException(e); }
        |  }
        |}
        |""".stripMargin)
    val ps = src("ParenStore.java",
      """import java.io.IOException;
        |import org.apache.pig.builtin.PigStorage;
        |import org.apache.pig.data.DataByteArray;
        |import org.apache.pig.data.DefaultTupleFactory;
        |import org.apache.pig.data.Tuple;
        |public class ParenStore extends PigStorage {
        |  @Override
        |  public void putNext(Tuple f) throws IOException {
        |    StringBuilder sb = new StringBuilder("(");
        |    try {
        |      for (int i = 0; i < f.size(); i++) {
        |        if (i > 0) sb.append('|');
        |        Object v = f.get(i);
        |        sb.append(v == null ? "" : v.toString());
        |      }
        |    } catch (Exception e) { throw new IOException(e); }
        |    sb.append(')');
        |    Tuple t = DefaultTupleFactory.getInstance().newTuple(1);
        |    try { t.set(0, new DataByteArray(sb.toString())); }
        |    catch (Exception e) { throw new IOException(e); }
        |    try { writer.write(null, t); }
        |    catch (InterruptedException e) { throw new RuntimeException(e); }
        |  }
        |}
        |""".stripMargin)
    val cls = new File(tmp, "classes"); cls.mkdirs()
    def cpOf(c: Class[_]) =
      c.getProtectionDomain.getCodeSource.getLocation.getPath
    val cp = Seq(cpOf(classOf[org.apache.pig.EvalFunc[_]]),
      cpOf(classOf[org.apache.hadoop.io.Writable]),
      cpOf(classOf[org.apache.hadoop.mapreduce.RecordReader[_, _]]))
      .distinct.mkString(File.pathSeparator)
    assert(javax.tools.ToolProvider.getSystemJavaCompiler.run(null, null,
      null, "-cp", cp, "-d", cls.getPath, up.getPath, ps.getPath) == 0,
      "storage javac failed")
    val jar = new File(tmp, "storage.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    Seq("UpperLoader.class", "ParenStore.class").foreach { n =>
      jos.putNextEntry(new java.util.jar.JarEntry(n))
      jos.write(Files.readAllBytes(new File(cls, n).toPath))
      jos.closeEntry()
    }
    jos.close()
    jar.getPath
  }

  test("jar LoadMetadata: a self-describing loader's getSchema supplies " +
       "names and types when the LOAD has no AS clause") {
    val tmp = Files.createTempDirectory("graft_loadmeta").toFile
    val src = new File(tmp, "TypedLoader.java")
    Files.write(src.toPath,
      """import java.io.IOException;
        |import org.apache.hadoop.mapreduce.Job;
        |import org.apache.pig.Expression;
        |import org.apache.pig.LoadMetadata;
        |import org.apache.pig.ResourceSchema;
        |import org.apache.pig.ResourceStatistics;
        |import org.apache.pig.builtin.PigStorage;
        |import org.apache.pig.data.DataType;
        |import org.apache.pig.impl.logicalLayer.schema.Schema;
        |public class TypedLoader extends PigStorage implements LoadMetadata {
        |  public ResourceSchema getSchema(String loc, Job job)
        |      throws IOException {
        |    Schema s = new Schema();
        |    s.add(new Schema.FieldSchema("word", DataType.CHARARRAY));
        |    s.add(new Schema.FieldSchema("n", DataType.INTEGER));
        |    return new ResourceSchema(s);
        |  }
        |  public ResourceStatistics getStatistics(String loc, Job job) {
        |    return null;
        |  }
        |  public String[] getPartitionKeys(String loc, Job job) {
        |    return null;
        |  }
        |  public void setPartitionFilter(Expression e) {}
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val cls = new File(tmp, "classes"); cls.mkdirs()
    def cpOf(c: Class[_]) =
      c.getProtectionDomain.getCodeSource.getLocation.getPath
    val cp = Seq(cpOf(classOf[org.apache.pig.EvalFunc[_]]),
      cpOf(classOf[org.apache.hadoop.io.Writable]),
      cpOf(classOf[org.apache.hadoop.mapreduce.RecordReader[_, _]]))
      .distinct.mkString(File.pathSeparator)
    assert(javax.tools.ToolProvider.getSystemJavaCompiler.run(null, null,
      null, "-cp", cp, "-d", cls.getPath, src.getPath) == 0)
    val jar = new File(tmp, "typed.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    jos.putNextEntry(new java.util.jar.JarEntry("TypedLoader.class"))
    jos.write(Files.readAllBytes(new File(cls, "TypedLoader.class").toPath))
    jos.closeEntry(); jos.close()
    val d = Files.createTempDirectory("loadmeta").toString
    Files.write(java.nio.file.Paths.get(s"$d/in.tsv"),
      "aa\t3\nbb\t7\n".getBytes(StandardCharsets.UTF_8))
    val runner = PigRunner(spark).run(s"""
      REGISTER '${jar.getPath}';
      a = LOAD '$d/in.tsv' USING TypedLoader();
      b = FOREACH a GENERATE word, n + 1 AS m;
    """)
    // names + types came from getSchema, not an AS clause
    assert(runner.describeLine("a").contains("word: chararray"),
      runner.describeLine("a"))
    assert(runner.describeLine("a").contains("n: int"))
    val out = runner("b").df.collect()
      .map(r => (r.getString(0), r.getAs[Number](1).intValue)).sorted.toSeq
    assert(out == Seq(("aa", 4), ("bb", 8)))
  }

  test("jar LoadFunc/StoreFunc bridge: a PigStorage-derived loader " +
       "transforms fields on read; a custom putNext controls the " +
       "written line format") {
    val d = Files.createTempDirectory("jarstorage").toString
    Files.write(java.nio.file.Paths.get(s"$d/in.tsv"),
      "alice\t3\nbob\t7\ncarol\t11\n".getBytes(StandardCharsets.UTF_8))
    val runner = PigRunner(spark).run(s"""
      REGISTER '$storageJar';
      a = LOAD '$d/in.tsv' USING UpperLoader() AS (name:chararray, n:int);
      b = FILTER a BY n > 3;
      STORE b INTO '$d/out' USING ParenStore();
    """)
    // load side: first field uppercased by the user loader, AS casts
    // applied over the bridge's text columns
    val rows = runner("a").df.collect()
      .map(r => (r.getString(0), r.getInt(1))).sorted.toSeq
    assert(rows == Seq(("ALICE", 3), ("BOB", 7), ("CAROL", 11)))
    // store side: the custom putNext's exact line bytes
    val written = Files.list(java.nio.file.Paths.get(s"$d/out"))
      .iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => new String(Files.readAllBytes(p), "UTF-8")
        .split("\n").filter(_.nonEmpty))
      .toSeq.sorted
    assert(written == Seq("(BOB|7)", "(CAROL|11)"), written)
  }

  test("UDFContext + input schema: outputSchema's front-end pass sees " +
       "the call's Pig schema and its stashed state reaches exec") {
    val tmp = Files.createTempDirectory("graft_udfctx").toFile
    val src = new File(tmp, "SchemaEcho.java")
    Files.write(src.toPath,
      """import java.io.IOException;
        |import java.util.Properties;
        |import org.apache.pig.EvalFunc;
        |import org.apache.pig.data.DataType;
        |import org.apache.pig.data.Tuple;
        |import org.apache.pig.impl.logicalLayer.schema.Schema;
        |import org.apache.pig.impl.util.UDFContext;
        |public class SchemaEcho extends EvalFunc<String> {
        |  String signature;
        |  @Override
        |  public String exec(Tuple input) throws IOException {
        |    return (String) UDFContext.getUDFContext()
        |      .getUDFProperties(this.getClass())
        |      .get("echo.inputschema." + signature);
        |  }
        |  @Override
        |  public void setUDFContextSignature(String signature) {
        |    this.signature = signature;
        |  }
        |  @Override
        |  public Schema outputSchema(Schema input) {
        |    Properties props = UDFContext.getUDFContext()
        |      .getUDFProperties(this.getClass());
        |    props.put("echo.inputschema." + signature, input.toString());
        |    return new Schema(
        |      new Schema.FieldSchema(null, DataType.CHARARRAY));
        |  }
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val cls = new File(tmp, "classes"); cls.mkdirs()
    val facadeCp = classOf[org.apache.pig.EvalFunc[_]]
      .getProtectionDomain.getCodeSource.getLocation.getPath
    assert(javax.tools.ToolProvider.getSystemJavaCompiler.run(null, null,
      null, "-cp", facadeCp, "-d", cls.getPath, src.getPath) == 0)
    val jar = new File(tmp, "echo.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    jos.putNextEntry(new java.util.jar.JarEntry("SchemaEcho.class"))
    jos.write(Files.readAllBytes(new File(cls, "SchemaEcho.class").toPath))
    jos.closeEntry(); jos.close()
    val d = Files.createTempDirectory("udfctx").toString
    Files.write(java.nio.file.Paths.get(s"$d/t.tsv"),
      "x\t1\ny\t2\n".getBytes(StandardCharsets.UTF_8))
    // two call sites, different declared schemas — each exec must see
    // ITS OWN front-end-stashed schema (distinct signatures)
    val runner = PigRunner(spark).run(s"""
      REGISTER '${jar.getPath}';
      a = LOAD '$d/t.tsv' AS (a0);
      b = FOREACH a GENERATE SchemaEcho(a0) AS s;
      c = LOAD '$d/t.tsv' AS (c0:chararray, c1:int);
      e = FOREACH c GENERATE SchemaEcho(c0, c1) AS s;
    """)
    val bVals = runner("b").df.collect().map(_.getString(0)).distinct.toSeq
    val eVals = runner("e").df.collect().map(_.getString(0)).distinct.toSeq
    assert(bVals == Seq("{a0: bytearray}"), bVals)
    assert(eVals == Seq("{c0: chararray,c1: int}"), eVals)
  }

  test("Algebraic jar UDF fuses to a partial-aggregating plan: no bag " +
       "materialization, combiner-equivalent Initial/Intermed/Final") {
    val tmp = Files.createTempDirectory("graft_alg").toFile
    val src = new File(tmp, "AlgSum.java")
    Files.write(src.toPath,
      """import java.io.IOException;
        |import org.apache.pig.Algebraic;
        |import org.apache.pig.EvalFunc;
        |import org.apache.pig.data.DataBag;
        |import org.apache.pig.data.Tuple;
        |public class AlgSum extends EvalFunc<Long> implements Algebraic {
        |  public Long exec(Tuple input) throws IOException { // bag fallback
        |    try {
        |      DataBag b = (DataBag) input.get(0);
        |      long s = 0;
        |      for (Tuple t : b) {
        |        Object v = t.get(0);
        |        if (v != null) s += ((Number) v).longValue();
        |      }
        |      return s;
        |    } catch (Exception e) { throw new IOException(e); }
        |  }
        |  public String getInitial() { return Init.class.getName(); }
        |  public String getIntermed() { return Inter.class.getName(); }
        |  public String getFinal() { return Fin.class.getName(); }
        |  public static class Init extends EvalFunc<Long> {
        |    public Long exec(Tuple input) throws IOException {
        |      try {
        |        DataBag b = (DataBag) input.get(0);
        |        Object v = b.iterator().next().get(0);
        |        return v == null ? null : ((Number) v).longValue();
        |      } catch (Exception e) { throw new IOException(e); }
        |    }
        |  }
        |  public static class Inter extends EvalFunc<Long> {
        |    public Long exec(Tuple input) throws IOException {
        |      try {
        |        DataBag b = (DataBag) input.get(0);
        |        long s = 0;
        |        for (Tuple t : b) {
        |          Object v = t.get(0);
        |          if (v != null) s += ((Number) v).longValue();
        |        }
        |        return s;
        |      } catch (Exception e) { throw new IOException(e); }
        |    }
        |  }
        |  public static class Fin extends Inter {}
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val cls = new File(tmp, "classes"); cls.mkdirs()
    val facadeCp = classOf[org.apache.pig.EvalFunc[_]]
      .getProtectionDomain.getCodeSource.getLocation.getPath
    assert(javax.tools.ToolProvider.getSystemJavaCompiler.run(null, null,
      null, "-cp", facadeCp, "-d", cls.getPath, src.getPath) == 0)
    val jar = new File(tmp, "algsum.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    cls.listFiles().filter(_.getName.endsWith(".class")).foreach { f =>
      jos.putNextEntry(new java.util.jar.JarEntry(f.getName))
      jos.write(Files.readAllBytes(f.toPath)); jos.closeEntry()
    }
    jos.close()
    val runner = PigRunner(spark).run(s"""
      REGISTER '${jar.getPath}';
      o = LOAD '$dir/orders.parquet';
      g = GROUP o BY o_custkey;
      b = FOREACH g GENERATE group AS k, AlgSum(o.o_orderkey) AS s;
    """)
    val plan = runner("b").df.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      "Algebraic call must fuse — the bag materialized:\n" + plan.take(800))
    assert(plan.toLowerCase.contains("partial"),
      "expected a partial-aggregate stage:\n" + plan.take(800))
    val got = runner("b").df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1))).sorted.toSeq
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.sum("o_orderkey").as("s"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue)).sorted.toSeq
    assert(got == want)
  }

  test("Accumulator jar UDF streams each group through accumulate() " +
       "(MapGroups plan, no bag materialization)") {
    val tmp = Files.createTempDirectory("graft_acc").toFile
    val src = new File(tmp, "AccSum.java")
    Files.write(src.toPath,
      """import java.io.IOException;
        |import org.apache.pig.AccumulatorEvalFunc;
        |import org.apache.pig.data.DataBag;
        |import org.apache.pig.data.Tuple;
        |public class AccSum extends AccumulatorEvalFunc<Long> {
        |  private long sum = 0;
        |  private int batches = 0;
        |  public void accumulate(Tuple input) throws IOException {
        |    try {
        |      batches++;
        |      DataBag b = (DataBag) input.get(0);
        |      for (Tuple t : b) {
        |        Object v = t.get(0);
        |        if (v != null) sum += ((Number) v).longValue();
        |      }
        |    } catch (Exception e) { throw new IOException(e); }
        |  }
        |  public Long getValue() { return sum; }
        |  public void cleanup() { sum = 0; batches = 0; }
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    // a MULTI-ARG accumulator: bag arg + literal separator read via
    // input.get(1) — pins the exec tuple shape (review finding: a
    // combined per-row bag would fold the literal into every tuple)
    val src2 = new File(tmp, "AccMaxTimes.java")
    Files.write(src2.toPath,
      """import java.io.IOException;
        |import org.apache.pig.AccumulatorEvalFunc;
        |import org.apache.pig.data.DataBag;
        |import org.apache.pig.data.Tuple;
        |public class AccMaxTimes extends AccumulatorEvalFunc<Long> {
        |  private long max = Long.MIN_VALUE;
        |  private long factor = 1;
        |  public void accumulate(Tuple input) throws IOException {
        |    try {
        |      DataBag b = (DataBag) input.get(0);
        |      factor = Long.parseLong(input.get(1).toString());
        |      for (Tuple t : b) {
        |        Object v = t.get(0);
        |        if (v != null)
        |          max = Math.max(max, ((Number) v).longValue());
        |      }
        |    } catch (Exception e) { throw new IOException(e); }
        |  }
        |  public Long getValue() { return max * factor; }
        |  public void cleanup() { max = Long.MIN_VALUE; factor = 1; }
        |}
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    val cls = new File(tmp, "classes"); cls.mkdirs()
    val facadeCp = classOf[org.apache.pig.EvalFunc[_]]
      .getProtectionDomain.getCodeSource.getLocation.getPath
    assert(javax.tools.ToolProvider.getSystemJavaCompiler.run(null, null,
      null, "-cp", facadeCp, "-d", cls.getPath, src.getPath,
      src2.getPath) == 0)
    val jar = new File(tmp, "accsum.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    Seq("AccSum.class", "AccMaxTimes.class").foreach { n =>
      jos.putNextEntry(new java.util.jar.JarEntry(n))
      jos.write(Files.readAllBytes(new File(cls, n).toPath))
      jos.closeEntry()
    }
    jos.close()
    val runner = PigRunner(spark).run(s"""
      REGISTER '${jar.getPath}';
      o = LOAD '$dir/orders.parquet';
      g = GROUP o BY o_custkey;
      b = FOREACH g GENERATE group AS k, AccSum(o.o_orderkey) AS s;
      m = FOREACH g GENERATE group AS k, AccMaxTimes(o.o_orderkey, '10') AS mx;
    """)
    val plan = runner("b").df.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      "Accumulator call must stream — the bag materialized:\n" +
        plan.take(800))
    assert(plan.contains("MapGroups"),
      "expected a MapGroups streaming stage:\n" + plan.take(800))
    // multi-arg call: accumulate() must see tuple(bag, "10")
    val gotM = runner("m").df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1))).sorted.toSeq
    val wantM = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.max("o_orderkey").as("mx"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue * 10)).sorted.toSeq
    assert(gotM == wantM)
    val got = runner("b").df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1))).sorted.toSeq
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.sum("o_orderkey").as("s"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getAs[Number](1).longValue)).sorted.toSeq
    assert(got == want)
  }

  // ----------------------- terminating / iterating accumulators (r11)

  /** Compile `sources` (name → body) against the facade and jar them. */
  private def buildJar(sources: Seq[(String, String)]): String = {
    val tmp = Files.createTempDirectory("graft_udfjar").toFile
    val cls = new File(tmp, "classes"); cls.mkdirs()
    val files = sources.map { case (n, body) =>
      val f = new File(tmp, n)
      Files.write(f.toPath, body.getBytes(StandardCharsets.UTF_8)); f
    }
    val cp = Seq(classOf[org.apache.pig.EvalFunc[_]],
        classOf[org.joda.time.DateTime],
        classOf[org.apache.hadoop.io.Writable],
        classOf[org.apache.hadoop.mapreduce.RecordReader[_, _]],
        classOf[org.apache.commons.logging.Log])
      .map(_.getProtectionDomain.getCodeSource.getLocation.getPath)
      .distinct.mkString(File.pathSeparator)
    val javacArgs = Seq("-cp", cp, "-d", cls.getPath) ++
      files.map(_.getPath)
    assert(javax.tools.ToolProvider.getSystemJavaCompiler.run(null, null,
      null, javacArgs: _*) == 0, "udf javac failed")
    // unique basename: SparkContext.addJar keys on the FILE NAME and
    // refuses a same-name jar from a different path
    val jar = new File(tmp, s"udf_${tmp.getName.replace("graft_udfjar", "")}.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    cls.listFiles().filter(_.getName.endsWith(".class")).foreach { f =>
      jos.putNextEntry(new java.util.jar.JarEntry(f.getName))
      jos.write(Files.readAllBytes(f.toPath)); jos.closeEntry()
    }
    jos.close()
    jar.getPath
  }

  test("TerminatingAccumulator: isFinished() stops the group stream " +
       "after the first chunk (bounded accumulate-call count)") {
    // value = number of accumulate() calls received; finished after one.
    // lineitem groups by l_returnflag are ~2000 rows at sf0.001 — well
    // past the 1024-row chunk, so WITHOUT the early exit each group
    // would see 2+ calls.
    val jar = buildJar(Seq("TermCalls.java" ->
      """import java.io.IOException;
        |import org.apache.pig.AccumulatorEvalFunc;
        |import org.apache.pig.TerminatingAccumulator;
        |import org.apache.pig.data.Tuple;
        |public class TermCalls extends AccumulatorEvalFunc<Long>
        |    implements TerminatingAccumulator<Long> {
        |  private long calls = 0;
        |  public void accumulate(Tuple input) throws IOException { calls++; }
        |  public boolean isFinished() { return calls > 0; }
        |  public Long getValue() { return calls; }
        |  public void cleanup() { calls = 0; }
        |}
        |""".stripMargin))
    val runner = PigRunner(spark).run(s"""
      REGISTER '$jar';
      l = LOAD '$dir/lineitem.parquet';
      g = GROUP l BY l_returnflag;
      t = FOREACH g GENERATE group AS k, TermCalls(l.l_quantity) AS calls;
    """)
    val plan = runner("t").df.queryExecution.executedPlan.toString
    assert(plan.contains("MapGroups"),
      "terminating accumulator must take the streamed path:\n" +
        plan.take(800))
    // groups must actually exceed one chunk for the assertion to bite
    val sizes = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect().map(_.getLong(1))
    assert(sizes.exists(_ > 1024), sizes.mkString(","))
    runner("t").df.collect().foreach { r =>
      assert(r.getLong(1) == 1L,
        s"group ${r.get(0)}: expected 1 accumulate call, got ${r.get(1)}")
    }
  }

  test("IteratingAccumulatorEvalFunc: exec streams tuples across chunk " +
       "boundaries; an early-returning exec doesn't stall the feed") {
    val jar = buildJar(Seq(
      "IterCount.java" ->
        """import java.io.IOException;
          |import java.util.Iterator;
          |import org.apache.pig.IteratingAccumulatorEvalFunc;
          |import org.apache.pig.data.Tuple;
          |public class IterCount extends IteratingAccumulatorEvalFunc<Long> {
          |  public Long exec(Iterator<Tuple> it) throws IOException {
          |    long n = 0;
          |    while (it.hasNext()) { it.next(); n++; }
          |    return n;
          |  }
          |}
          |""".stripMargin,
      "IterPeek.java" ->
        """import java.io.IOException;
          |import java.util.Iterator;
          |import org.apache.pig.IteratingAccumulatorEvalFunc;
          |import org.apache.pig.data.Tuple;
          |public class IterPeek extends IteratingAccumulatorEvalFunc<Long> {
          |  public Long exec(Iterator<Tuple> it) throws IOException {
          |    if (!it.hasNext()) return -1L;
          |    it.next();
          |    return 7L; // stop consuming after one tuple
          |  }
          |}
          |""".stripMargin))
    val runner = PigRunner(spark).run(s"""
      REGISTER '$jar';
      l = LOAD '$dir/lineitem.parquet';
      g = GROUP l BY l_returnflag;
      c = FOREACH g GENERATE group AS k, IterCount(l.l_quantity) AS n;
      p = FOREACH g GENERATE group AS k, IterPeek(l.l_quantity) AS v;
    """)
    val plan = runner("c").df.queryExecution.executedPlan.toString
    assert(plan.contains("MapGroups") && !plan.contains("collect_list"),
      plan.take(800))
    // every tuple of every group crossed the queue (counts exact)
    val got = runner("c").df.collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val want = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == want)
    // early-returning exec: isFinished turns true, remaining chunks are
    // dropped, no deadlock, value intact
    runner("p").df.collect().foreach(r => assert(r.getLong(1) == 7L))
  }

  test("IteratingAccumulatorEvalFunc facade: bounded-queue plumbing " +
       "(50k tuples, reuse after cleanup, exec exception surfaces)") {
    import org.apache.pig.data.{BagFactory, TupleFactory}
    val tf = TupleFactory.getInstance()
    val bf = BagFactory.getInstance()
    def bag(n: Int) = {
      val b = bf.newDefaultBag()
      (1 to n).foreach(i => b.add(tf.newTuple(Long.box(i.toLong))))
      b
    }
    val count = new org.apache.pig.IteratingAccumulatorEvalFunc[java.lang.Long] {
      override def exec(it: java.util.Iterator[org.apache.pig.data.Tuple])
          : java.lang.Long = {
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
    }
    // 50 bags x 1000 tuples = 50k > the 10k queue bound: the producer
    // must block-and-drain, not buffer (the old facade materialized all)
    (1 to 50).foreach(_ => count.accumulate(tf.newTuple(bag(1000))))
    assert(count.getValue == 50000L)
    assert(count.isFinished)
    count.cleanup()
    count.accumulate(tf.newTuple(bag(3))) // fresh cycle after cleanup
    assert(count.getValue == 3L)
    count.cleanup()

    val early = new org.apache.pig.IteratingAccumulatorEvalFunc[java.lang.Long] {
      override def exec(it: java.util.Iterator[org.apache.pig.data.Tuple])
          : java.lang.Long = {
        if (!it.hasNext) return -1L
        it.next(); 42L
      }
    }
    // once exec returns, further accumulates must drop tuples instead of
    // blocking on a full queue (5 x 100k tuples >> capacity)
    (1 to 5).foreach(_ => early.accumulate(tf.newTuple(bag(100000))))
    assert(early.getValue == 42L)
    early.cleanup()

    val boom = new org.apache.pig.IteratingAccumulatorEvalFunc[java.lang.Long] {
      override def exec(it: java.util.Iterator[org.apache.pig.data.Tuple])
          : java.lang.Long =
        throw new java.io.IOException("iterating exec boom")
    }
    val e = intercept[Exception] {
      boom.accumulate(tf.newTuple(bag(10)))
      boom.getValue
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("iterating exec boom")), e.toString)
  }

  test("Accumulator path groups -0.0 with 0.0 and NaN with NaN " +
       "(parity with the DataFrame groupBy paths)") {
    val jar = buildJar(Seq("AccCount2.java" ->
      """import java.io.IOException;
        |import org.apache.pig.AccumulatorEvalFunc;
        |import org.apache.pig.data.DataBag;
        |import org.apache.pig.data.Tuple;
        |public class AccCount2 extends AccumulatorEvalFunc<Long> {
        |  private long n = 0;
        |  public void accumulate(Tuple input) throws IOException {
        |    try { for (Tuple t : (DataBag) input.get(0)) n++; }
        |    catch (Exception e) { throw new IOException(e); }
        |  }
        |  public Long getValue() { return n; }
        |  public void cleanup() { n = 0; }
        |}
        |""".stripMargin))
    val p = Files.createTempDirectory("graft_negzero")
      .resolve("d.parquet").toString
    import spark.implicits._
    Seq((-0.0, 1L), (0.0, 2L), (1.0, 3L), (Double.NaN, 4L),
        (Double.NaN, 5L))
      .toDF("k", "v").repartition(3).write.parquet(p)
    val runner = PigRunner(spark).run(s"""
      REGISTER '$jar';
      d = LOAD '$p';
      g = GROUP d BY k;
      c = FOREACH g GENERATE group AS k, AccCount2(d.v) AS n;
    """)
    val plan = runner("c").df.queryExecution.executedPlan.toString
    assert(plan.contains("MapGroups"), plan.take(800))
    val got = runner("c").df.collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(got.length == 3, s"-0.0/0.0 or NaN split a group: " +
      got.sortBy(_._1).mkString(", "))
    assert(got.collectFirst {
      case (k, n) if k == 0.0 => n }.contains(2L))
    assert(got.collectFirst {
      case (k, n) if k.isNaN => n }.contains(2L))
  }

  test("JOIN outer PARTITION BY: unmatched rows route by the surviving " +
       "side's key, not by null") {
    val runner = PigRunner(spark).run(s"""
      REGISTER '$partitionerJar';
      n = LOAD '$dir/nation.parquet';
      r0 = LOAD '$dir/region.parquet';
      r = FILTER r0 BY r_regionkey < 3;
      j = JOIN r BY r_regionkey RIGHT OUTER, n BY n_regionkey PARTITION BY ModPartitioner PARALLEL 3;
    """)
    import org.apache.spark.sql.functions.{coalesce => cl, col,
      spark_partition_id}
    val placed = runner("j").df.select(
      cl(col("r_regionkey"), col("n_regionkey")).as("k"),
      spark_partition_id().as("pid")).collect()
    assert(placed.length == 25)
    assert(placed.exists(_.getAs[Number](0).longValue >= 3),
      "expected unmatched right rows (regions 3/4 filtered off the left)")
    placed.foreach { r =>
      assert(r.getInt(1) == (r.getAs[Number](0).longValue % 3).toInt,
        s"key ${r.get(0)} in partition ${r.get(1)}")
    }
  }

  test("jar UDFs returning datetime / biginteger / bigdecimal " +
       "(VERDICT r10 item 1: joda↔Timestamp, Big*↔Decimal)") {
    val jar = buildJar(Seq(
      // generic-return path (classType): joda DateTime in and out
      "NextDay.java" ->
        """import java.io.IOException;
          |import org.apache.pig.EvalFunc;
          |import org.apache.pig.data.Tuple;
          |import org.joda.time.DateTime;
          |public class NextDay extends EvalFunc<DateTime> {
          |  public DateTime exec(Tuple input) throws IOException {
          |    Object o = input.get(0);
          |    if (o == null) return null;
          |    return ((DateTime) o).plusDays(1);
          |  }
          |}
          |""".stripMargin,
      // outputSchema-declared path (fieldType): type code 65
      "BigSquare.java" ->
        """import java.io.IOException;
          |import java.math.BigInteger;
          |import org.apache.pig.EvalFunc;
          |import org.apache.pig.data.DataType;
          |import org.apache.pig.data.Tuple;
          |import org.apache.pig.impl.logicalLayer.schema.Schema;
          |public class BigSquare extends EvalFunc<Object> {
          |  public Schema outputSchema(Schema input) {
          |    return new Schema(
          |      new Schema.FieldSchema("sq", DataType.BIGINTEGER));
          |  }
          |  public Object exec(Tuple input) throws IOException {
          |    Object o = input.get(0);
          |    if (o == null) return null;
          |    BigInteger b = BigInteger.valueOf(((Number) o).longValue());
          |    return b.multiply(b);
          |  }
          |}
          |""".stripMargin,
      "DecThird.java" ->
        """import java.io.IOException;
          |import java.math.BigDecimal;
          |import java.math.RoundingMode;
          |import org.apache.pig.EvalFunc;
          |import org.apache.pig.data.Tuple;
          |public class DecThird extends EvalFunc<BigDecimal> {
          |  public BigDecimal exec(Tuple input) throws IOException {
          |    Object o = input.get(0);
          |    if (o == null) return null;
          |    return new BigDecimal(o.toString())
          |      .divide(new BigDecimal(3), 18, RoundingMode.HALF_UP);
          |  }
          |}
          |""".stripMargin))
    val runner = PigRunner(spark).run(s"""
      REGISTER '$jar';
      o = LOAD '$dir/orders.parquet';
      x = FOREACH o GENERATE o_orderkey, NextDay(o_orderdate) AS nd,
                    BigSquare(o_orderkey) AS sq, DecThird(o_totalprice) AS dt;
    """)
    val df = runner("x").df
    import org.apache.spark.sql.types._
    assert(df.schema("nd").dataType == TimestampType)
    assert(df.schema("sq").dataType == DecimalType(38, 0))
    assert(df.schema("dt").dataType == DecimalType(38, 18))
    import org.apache.spark.sql.functions.{col, expr}
    val want = spark.read.parquet(s"$dir/orders.parquet").select(
      col("o_orderkey"),
      expr("CAST(o_orderdate + INTERVAL 1 DAY AS TIMESTAMP)").as("nd"),
      expr("CAST(o_orderkey AS DECIMAL(38,0)) * o_orderkey").as("sq"),
      expr("CAST(ROUND(CAST(o_totalprice AS DECIMAL(38,18)) / 3, 18) " +
           "AS DECIMAL(38,18))").as("dt"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1), r.getDecimal(2).toPlainString,
       r.getDecimal(3).toPlainString)
    val got = df.collect().map(key).sortBy(_._1).toSeq
    val exp = want.collect().map(key).sortBy(_._1).toSeq
    assert(got.length == exp.length && got.length > 0)
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"$g vs $e")
      // decimal division rounding may differ in the last ulp between
      // BigDecimal.divide and Spark's ROUND — compare numerically
      assert((BigDecimal(g._4) - BigDecimal(e._4)).abs
        <= BigDecimal("1e-17"), s"$g vs $e")
    }
  }

  test("jar LoadFunc with a non-text InputFormat: a SequenceFile " +
       "loader drives its own format (generic newAPIHadoopRDD path)") {
    val seqDir = Files.createTempDirectory("graft_seq")
      .resolve("data.seq").toString
    val data = (1 to 500).map(i => (s"k%03d".format(i), i.toLong))
    spark.sparkContext.parallelize(data, 3).saveAsSequenceFile(seqDir)
    val jar = buildJar(Seq("SeqKvLoader.java" ->
      """import java.io.IOException;
        |import org.apache.hadoop.io.LongWritable;
        |import org.apache.hadoop.io.Text;
        |import org.apache.hadoop.mapreduce.InputFormat;
        |import org.apache.hadoop.mapreduce.Job;
        |import org.apache.hadoop.mapreduce.RecordReader;
        |import org.apache.hadoop.mapreduce.lib.input.FileInputFormat;
        |import org.apache.hadoop.mapreduce.lib.input.SequenceFileInputFormat;
        |import org.apache.pig.LoadFunc;
        |import org.apache.pig.backend.hadoop.executionengine.mapReduceLayer.PigSplit;
        |import org.apache.pig.data.Tuple;
        |import org.apache.pig.data.TupleFactory;
        |public class SeqKvLoader extends LoadFunc {
        |  @SuppressWarnings("rawtypes")
        |  private RecordReader reader;
        |  public void setLocation(String loc, Job job) throws IOException {
        |    FileInputFormat.setInputPaths(job, loc);
        |  }
        |  @SuppressWarnings("rawtypes")
        |  public InputFormat getInputFormat() {
        |    return new SequenceFileInputFormat<Text, LongWritable>();
        |  }
        |  @SuppressWarnings("rawtypes")
        |  public void prepareToRead(RecordReader r, PigSplit s) {
        |    reader = r;
        |  }
        |  public Tuple getNext() throws IOException {
        |    try {
        |      if (!reader.nextKeyValue()) return null;
        |      Text k = (Text) reader.getCurrentKey();
        |      LongWritable v = (LongWritable) reader.getCurrentValue();
        |      Tuple t = TupleFactory.getInstance().newTuple(2);
        |      t.set(0, k.toString());
        |      t.set(1, v.get() * 2);
        |      return t;
        |    } catch (InterruptedException e) { throw new IOException(e); }
        |  }
        |}
        |""".stripMargin))
    val runner = PigRunner(spark).run(s"""
      REGISTER '$jar';
      a = LOAD '$seqDir' USING SeqKvLoader() AS (k:chararray, v:long);
      b = FILTER a BY v >= 500;
      c = LOAD '$seqDir' USING SeqKvLoader();
    """)
    val got = runner("b").df.collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val want = data.filter(_._2 * 2 >= 500)
      .map { case (k, v) => (k, v * 2) }.sorted
    assert(got == want)
    // schemaless form: width probed from the format's own first record
    val c = runner("c").df
    assert(c.columns.toSeq == Seq("_c0", "_c1"))
    assert(c.count() == 500)
  }

  test("Algebraic jar UDF with a TUPLE-returning Final still fuses " +
       "to a partial aggregate (VERDICT r10 item 5)") {
    val jar = buildJar(Seq("AlgStats.java" ->
      """import java.io.IOException;
        |import org.apache.pig.Algebraic;
        |import org.apache.pig.EvalFunc;
        |import org.apache.pig.data.DataBag;
        |import org.apache.pig.data.DataType;
        |import org.apache.pig.data.Tuple;
        |import org.apache.pig.data.TupleFactory;
        |import org.apache.pig.impl.logicalLayer.schema.Schema;
        |public class AlgStats extends EvalFunc<Tuple> implements Algebraic {
        |  public Schema outputSchema(Schema input) {
        |    Schema t = new Schema();
        |    t.add(new Schema.FieldSchema("cnt", DataType.LONG));
        |    t.add(new Schema.FieldSchema("sm", DataType.LONG));
        |    return new Schema(
        |      new Schema.FieldSchema("stats", t, DataType.TUPLE));
        |  }
        |  private static Tuple pair(long c, long s) throws IOException {
        |    Tuple t = TupleFactory.getInstance().newTuple(2);
        |    try { t.set(0, c); t.set(1, s); }
        |    catch (Exception e) { throw new IOException(e); }
        |    return t;
        |  }
        |  private static Tuple combine(Tuple input) throws IOException {
        |    try {
        |      DataBag b = (DataBag) input.get(0);
        |      long c = 0, s = 0;
        |      for (Tuple t : b) {
        |        c += ((Number) t.get(0)).longValue();
        |        s += ((Number) t.get(1)).longValue();
        |      }
        |      return pair(c, s);
        |    } catch (IOException e) { throw e; }
        |      catch (Exception e) { throw new IOException(e); }
        |  }
        |  public Tuple exec(Tuple input) throws IOException { // bag path
        |    try {
        |      DataBag b = (DataBag) input.get(0);
        |      long c = 0, s = 0;
        |      for (Tuple t : b) {
        |        Object v = t.get(0);
        |        if (v != null) { c++; s += ((Number) v).longValue(); }
        |      }
        |      return pair(c, s);
        |    } catch (IOException e) { throw e; }
        |      catch (Exception e) { throw new IOException(e); }
        |  }
        |  public String getInitial() { return Init.class.getName(); }
        |  public String getIntermed() { return Comb.class.getName(); }
        |  public String getFinal() { return Comb.class.getName(); }
        |  public static class Init extends EvalFunc<Tuple> {
        |    public Tuple exec(Tuple input) throws IOException {
        |      try {
        |        DataBag b = (DataBag) input.get(0);
        |        Object v = b.iterator().next().get(0);
        |        return pair(v == null ? 0L : 1L,
        |          v == null ? 0L : ((Number) v).longValue());
        |      } catch (IOException e) { throw e; }
        |        catch (Exception e) { throw new IOException(e); }
        |    }
        |  }
        |  public static class Comb extends EvalFunc<Tuple> {
        |    public Tuple exec(Tuple input) throws IOException {
        |      return combine(input);
        |    }
        |  }
        |}
        |""".stripMargin))
    val runner = PigRunner(spark).run(s"""
      REGISTER '$jar';
      o = LOAD '$dir/orders.parquet';
      g = GROUP o BY o_custkey;
      b = FOREACH g GENERATE group AS k, AlgStats(o.o_orderkey) AS st;
    """)
    val df = runner("b").df
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"),
      "tuple-Final Algebraic must fuse — the bag materialized:\n" +
        plan.take(800))
    assert(plan.toLowerCase.contains("partial"),
      "expected a partial-aggregate stage:\n" + plan.take(800))
    import org.apache.spark.sql.types._
    assert(df.schema("st").dataType ==
      StructType(Seq(StructField("cnt", LongType),
        StructField("sm", LongType))))
    val got = df.collect().map { r =>
      val st = r.getStruct(1)
      (r.getAs[Number](0).longValue, st.getLong(0), st.getLong(1))
    }.sorted.toSeq
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.count("o_orderkey"),
        org.apache.spark.sql.functions.sum("o_orderkey"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1),
        r.getAs[Number](2).longValue)).sorted.toSeq
    assert(got == want)
  }

  test("CROSS PARTITION BY: the user partitioner routes the GFCross " +
       "digit-tuple key (VERDICT r10 item 6)") {
    val jar = buildJar(Seq("DigitSumPartitioner.java" ->
      """import org.apache.hadoop.io.Writable;
        |import org.apache.hadoop.mapreduce.Partitioner;
        |import org.apache.pig.data.Tuple;
        |import org.apache.pig.impl.io.PigNullableWritable;
        |public class DigitSumPartitioner
        |    extends Partitioner<PigNullableWritable, Writable> {
        |  @Override
        |  public int getPartition(PigNullableWritable key, Writable value,
        |                          int n) {
        |    try {
        |      Tuple t = (Tuple) key.getValueAsPigType();
        |      long s = 0;
        |      for (Object o : t.getAll()) s += ((Number) o).longValue();
        |      return (int) (s % n);
        |    } catch (Exception e) { throw new RuntimeException(e); }
        |  }
        |}
        |""".stripMargin))
    val runner = PigRunner(spark).run(s"""
      REGISTER '$jar';
      n = LOAD '$dir/nation.parquet';
      r = LOAD '$dir/region.parquet';
      c = CROSS n, r PARTITION BY DigitSumPartitioner PARALLEL 4;
    """)
    val df = runner("c").df
    assert(df.count() == 125)
    assert(df.rdd.getNumPartitions == 4)
    // contract: every row sits in getPartition(digitTuple) = sum % 4,
    // with digits d_i = pmod(xxhash64(input_i's columns), g) and
    // g = ceil(4^(1/2)) = 2 — recomputed here from the output row
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64,
      spark_partition_id}
    val nCols = spark.read.parquet(s"$dir/nation.parquet").columns.toSeq
    val rCols = spark.read.parquet(s"$dir/region.parquet").columns.toSeq
    val placed = df.select(
      pmod(xxhash64(nCols.map(col): _*), lit(2L)).cast("int").as("d0"),
      pmod(xxhash64(rCols.map(col): _*), lit(2L)).cast("int").as("d1"),
      spark_partition_id().as("pid")).collect()
    placed.foreach { r =>
      assert(r.getInt(2) == (r.getInt(0) + r.getInt(1)) % 4,
        s"digits (${r.get(0)}, ${r.get(1)}) in partition ${r.get(2)}")
    }
  }

  test("jar StoreFunc with a non-text OutputFormat: a SequenceFile " +
       "storer writes through its own format and committer") {
    val jar = buildJar(Seq("SeqKvStore.java" ->
      """import java.io.IOException;
        |import org.apache.hadoop.fs.Path;
        |import org.apache.hadoop.io.LongWritable;
        |import org.apache.hadoop.io.Text;
        |import org.apache.hadoop.mapreduce.Job;
        |import org.apache.hadoop.mapreduce.OutputFormat;
        |import org.apache.hadoop.mapreduce.RecordWriter;
        |import org.apache.hadoop.mapreduce.lib.output.FileOutputFormat;
        |import org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat;
        |import org.apache.pig.StoreFunc;
        |import org.apache.pig.data.Tuple;
        |public class SeqKvStore extends StoreFunc {
        |  @SuppressWarnings("rawtypes")
        |  private RecordWriter writer;
        |  @SuppressWarnings("rawtypes")
        |  public OutputFormat getOutputFormat() {
        |    return new SequenceFileOutputFormat<Text, LongWritable>();
        |  }
        |  @Override
        |  public void setStoreLocation(String loc, Job job)
        |      throws IOException {
        |    FileOutputFormat.setOutputPath(job, new Path(loc));
        |    job.setOutputKeyClass(Text.class);
        |    job.setOutputValueClass(LongWritable.class);
        |  }
        |  @SuppressWarnings("rawtypes")
        |  public void prepareToWrite(RecordWriter w) { writer = w; }
        |  @SuppressWarnings("unchecked")
        |  public void putNext(Tuple t) throws IOException {
        |    try {
        |      writer.write(new Text(t.get(0).toString()),
        |        new LongWritable(((Number) t.get(1)).longValue()));
        |    } catch (InterruptedException e) { throw new IOException(e); }
        |      catch (IOException e) { throw e; }
        |      catch (Exception e) { throw new IOException(e); }
        |  }
        |}
        |""".stripMargin))
    val out = Files.createTempDirectory("graft_seqstore")
      .resolve("out.seq").toString
    PigRunner(spark).run(s"""
      REGISTER '$jar';
      n = LOAD '$dir/nation.parquet';
      p = FOREACH n GENERATE n_name, n_nationkey;
      STORE p INTO '$out' USING SeqKvStore();
    """)
    // read back through hadoop's own SequenceFile reader
    val got = spark.sparkContext
      .sequenceFile(out, classOf[org.apache.hadoop.io.Text],
        classOf[org.apache.hadoop.io.LongWritable])
      .map { case (k, v) => (k.toString, v.get) }.collect().sorted.toSeq
    val want = spark.read.parquet(s"$dir/nation.parquet")
      .select("n_name", "n_nationkey").collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue))
      .sorted.toSeq
    assert(got == want && got.length == 25)
  }

  test("EvalFunc.getCacheFiles: the reference's own Udfcachetest runs " +
       "verbatim — the cache file is readable at ./link " +
       "(UdfDistributedCache e2e shape)") {
    val tmp = Files.createTempDirectory("graft_udfcache").toFile
    val lookup = new File(tmp, "votertab")
    Files.write(lookup.toPath,
      "first-line-xyz\nsecond-line\n".getBytes(StandardCharsets.UTF_8))
    val srcRef = java.nio.file.Paths.get(
      "/root/reference/test/e2e/pig/udfs/java/org/apache/pig/test/udf/" +
      "evalfunc/Udfcachetest.java")
    assume(Files.exists(srcRef), "reference Udfcachetest.java missing")
    val cls = new File(tmp, "classes"); cls.mkdirs()
    val cp = Seq(classOf[org.apache.pig.EvalFunc[_]],
        classOf[org.apache.hadoop.io.Writable],
        classOf[org.apache.hadoop.mapreduce.RecordReader[_, _]],
        classOf[org.apache.commons.logging.Log])
      .map(_.getProtectionDomain.getCodeSource.getLocation.getPath)
      .distinct.mkString(File.pathSeparator)
    assert(javax.tools.ToolProvider.getSystemJavaCompiler.run(null, null,
      null, "-cp", cp, "-d", cls.getPath, srcRef.toString) == 0,
      "reference Udfcachetest javac against the facade failed")
    val jar = new File(tmp, s"udfcache_${tmp.getName}.jar")
    val jos = new java.util.jar.JarOutputStream(
      new java.io.FileOutputStream(jar))
    def addAll(d: File, prefix: String): Unit =
      d.listFiles().foreach { f =>
        if (f.isDirectory) addAll(f, prefix + f.getName + "/")
        else {
          jos.putNextEntry(new java.util.jar.JarEntry(prefix + f.getName))
          jos.write(Files.readAllBytes(f.toPath)); jos.closeEntry()
        }
      }
    addAll(cls, ""); jos.close()
    // the UDF reads ./foodle relative to the task JVM's cwd
    val linkFile = new File("foodle").getAbsoluteFile
    try {
      val runner = PigRunner(spark).run(s"""
        REGISTER '${jar.getPath}';
        DEFINE udfdc org.apache.pig.test.udf.evalfunc.Udfcachetest('${lookup.getPath}#foodle');
        n = LOAD '$dir/nation.parquet';
        b = FOREACH n GENERATE n_nationkey, udfdc(n_name) AS cached;
      """)
      val got = runner("b").df.collect()
      assert(got.length == 25)
      got.foreach(r => assert(r.getString(1) == "first-line-xyz",
        s"expected the cache file's first line, got '${r.get(1)}'"))
    } finally {
      linkFile.delete(); ()
    }
  }

  test("HiveUDF: Hive scalar functions run through hive-exec's own " +
       "registry (UDF-bridge 'sin', GenericUDF 'upper'/'concat')") {
    val runner = PigRunner(spark).run(s"""
      DEFINE hsin HiveUDF('sin');
      DEFINE hupper HiveUDF('upper');
      DEFINE hconcat org.apache.pig.builtin.HiveUDF('concat');
      o = LOAD '$dir/orders.parquet';
      b = FOREACH o GENERATE o_orderkey, hsin(o_totalprice) AS s,
            hupper(o_orderstatus) AS u,
            hconcat(o_orderstatus, o_orderpriority) AS c;
    """)
    import org.apache.spark.sql.functions.{col, concat, sin, upper}
    val got = runner("b").df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getString(3))).sortBy(_._1).toSeq
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), sin(col("o_totalprice")),
        upper(col("o_orderstatus")),
        concat(col("o_orderstatus"), col("o_orderpriority")))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getString(3))).sortBy(_._1).toSeq
    assert(got.length == want.length && got.length > 0)
    assert(got == want) // Math.sin on both sides — bitwise equal
  }

  test("HiveUDF constant-args ctor form: 'round' demands a constant " +
       "scale (ConstantObjectInspector injection)") {
    // Hive's GenericUDFRound throws at initialize() unless the scale
    // position is a ConstantObjectInspector — the plain-OI form must
    // fail, the '(null, 2)' ctor form must match native round(x, 2)
    val plain = intercept[Exception] {
      PigRunner(spark).run(s"""
        DEFINE hround HiveUDF('round');
        o = LOAD '$dir/orders.parquet';
        b = FOREACH o GENERATE hround(o_totalprice, 2) AS r;
      """).apply("b").df.collect()
    }
    assert(plain.getMessage != null)
    val runner = PigRunner(spark).run(s"""
      DEFINE hround HiveUDF('round', '(null, 2)');
      DEFINE hpad HiveUDF('lpad', '(null, 5, "0")');
      o = LOAD '$dir/orders.parquet';
      b = FOREACH o GENERATE o_orderkey, hround(o_totalprice, 2) AS r,
            hpad(o_orderstatus, 5, '0') AS p;
    """)
    import org.apache.spark.sql.functions.{col, lpad, round}
    val got = runner("b").df.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .sortBy(_._1).toSeq
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2),
        lpad(col("o_orderstatus"), 5, "0"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got.length == want.length && got.nonEmpty)
    assert(got == want)
  }

  test("HiveUDAF/HiveUDTF: 'avg' aggregates a grouped bag; 'explode' " +
       "emits one row per bag element under FLATTEN") {
    val runner = PigRunner(spark).run(s"""
      DEFINE havg HiveUDAF('avg');
      DEFINE hexplode HiveUDTF('explode');
      o = LOAD '$dir/orders.parquet';
      g = GROUP o BY o_custkey;
      a = FOREACH g GENERATE group AS k, havg(o.o_totalprice) AS m;
      e0 = FOREACH o GENERATE TOBAG(o_orderstatus, o_orderpriority) AS b;
      e = FOREACH e0 GENERATE FLATTEN(hexplode(b));
    """)
    import org.apache.spark.sql.functions.{avg, col}
    // the HiveUDAF must fuse to true partial aggregation
    // (GenericUDAFEvaluator PARTIAL1/merge/FINAL through an Aggregator):
    // the plan carries partial+final aggregate nodes and NO bag
    // materialization (collect_list) feeding the average
    val planA = runner("a").df.queryExecution.executedPlan.toString
    assert(!planA.contains("collect_list"),
      s"HiveUDAF materialized the group bag:\n${planA.take(1500)}")
    assert(planA.contains("ObjectHashAggregate") ||
           planA.contains("SortAggregate") ||
           planA.contains("HashAggregate"),
      s"no aggregate node for HiveUDAF:\n${planA.take(1500)}")
    val gotA = runner("a").df.collect()
      .map(r => (r.getAs[Number](0).longValue,
        math.round(r.getDouble(1) * 1e6))).sorted.toSeq
    val wantA = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey").agg(avg(col("o_totalprice")))
      .collect()
      .map(r => (r.getAs[Number](0).longValue,
        math.round(r.getDouble(1) * 1e6))).sorted.toSeq
    assert(gotA == wantA && gotA.nonEmpty)
    // explode: every (status, priority) pair lands as its own row
    val eDf = runner("e").df
    val gotE = eDf.collect().map(_.getStruct(0).getString(0)).sorted.toSeq
    val wantE = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderstatus"), col("o_orderpriority")).collect()
      .flatMap(r => Seq(r.getString(0), r.getString(1))).sorted.toSeq
    assert(gotE == wantE)
  }

  test("HiveUDAF/HiveUDTF dotted-class resolution (user-jar rule applies " +
       "to all Hive UDF kinds)") {
    val runner = PigRunner(spark).run(s"""
      DEFINE havg HiveUDAF(
        'org.apache.hadoop.hive.ql.udf.generic.GenericUDAFAverage');
      DEFINE hexp HiveUDTF(
        'org.apache.hadoop.hive.ql.udf.generic.GenericUDTFExplode');
      o = LOAD '$dir/orders.parquet';
      g = GROUP o BY o_custkey;
      a = FOREACH g GENERATE group AS k, havg(o.o_totalprice) AS m;
      e0 = FOREACH o GENERATE TOBAG(o_orderstatus) AS b;
      e = FOREACH e0 GENERATE FLATTEN(hexp(b));
    """)
    import org.apache.spark.sql.functions.{avg, col}
    val got = runner("a").df.collect()
      .map(r => (r.getAs[Number](0).longValue,
        math.round(r.getDouble(1) * 1e6))).sorted.toSeq
    val want = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_custkey").agg(avg(col("o_totalprice"))).collect()
      .map(r => (r.getAs[Number](0).longValue,
        math.round(r.getDouble(1) * 1e6))).sorted.toSeq
    assert(got == want && got.nonEmpty)
    assert(runner("e").df.count() ==
      spark.read.parquet(s"$dir/orders.parquet").count())
  }

  test("unknown dotted function still fails loudly") {
    val e = intercept[Exception] {
      PigRunner(spark).run(s"""
        n = LOAD '$dir/region.parquet';
        r = FOREACH n GENERATE com.nowhere.Missing(r_name);
      """).apply("r").df.collect()
    }
    assert(e.getMessage.contains("unknown function"), e.getMessage)
  }
}
