package graft

import org.apache.spark.sql.functions._

/** Batched python-UDF evaluation ([[graft.plans.BatchPyEval]]): the
  * extraction rule + exec must engage on Project/Filter shapes and
  * produce byte-identical results to the scalar per-row path. */
class BatchPyEvalSpec extends SparkSpec {

  private def pyScript: java.nio.file.Path = {
    val py = java.nio.file.Files.createTempFile("graft_batch_udf", ".py")
    java.nio.file.Files.write(py,
      """from pig_util import outputSchema
        |
        |@outputSchema("rlang:chararray")
        |def rev(x):
        |    return None if x is None else x[::-1]
        |
        |@outputSchema("nw:long")
        |def nwords(x):
        |    return 0 if x is None else len(x.split())
        |
        |@outputSchema("ok:boolean")
        |def longish(x):
        |    return x is not None and len(x) > 40
        |""".stripMargin.getBytes("UTF-8"))
    py.toFile.deleteOnExit()
    py
  }

  test("FOREACH py-udfs extract into ONE BatchPyEvalExec (both calls " +
       "batched) and match the per-row oracle") {
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$pyScript' USING streaming_python AS f;
      d = LOAD '/root/testdata/sf0.001/documents.parquet';
      r = FOREACH d GENERATE doc_id, f.rev(lang) AS rlang,
                             f.nwords(text) AS nw;
    """).apply("r").df
    val plan = rel.queryExecution.executedPlan.toString
    assert(plan.contains("BatchPyEval"), s"batch exec did not engage:\n$plan")
    // both udfs ride the same node — one pass, two wire streams
    assert("BatchPyEval".r.findAllIn(plan).size == 1)
    // extraction must not break scan pruning: only the 3 referenced
    // columns reach the parquet reader, not the whole documents schema
    assert(!plan.contains("n_chars"), s"scan not pruned:\n$plan")
    val got = rel.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = sf("documents").select("doc_id", "lang", "text").collect()
      .map { r =>
        val lang = if (r.isNullAt(1)) null else r.getString(1).reverse
        val nw = if (r.isNullAt(2)) 0L
          else r.getString(2).split("\\s+").count(_.nonEmpty).toLong
        (r.getLong(0), lang, nw)
      }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("FILTER BY py-udf extracts and matches the driver oracle") {
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$pyScript' USING streaming_python AS f;
      d = LOAD '/root/testdata/sf0.001/documents.parquet';
      r = FILTER d BY f.longish(text);
      p = FOREACH r GENERATE doc_id;
    """).apply("p").df
    val plan = rel.queryExecution.executedPlan.toString
    assert(plan.contains("BatchPyEval"), s"batch exec did not engage:\n$plan")
    val got = rel.collect().map(_.getLong(0)).toSet
    val want = sf("documents").select("doc_id", "text").collect()
      .filter(r => !r.isNullAt(1) && r.getString(1).length > 40)
      .map(_.getLong(0)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("FLATTEN of a bag-returning py-udf batches below the Generate") {
    val py = java.nio.file.Files.createTempFile("graft_batch_bag", ".py")
    java.nio.file.Files.write(py,
      """from pig_util import outputSchema
        |@outputSchema("b:{t:(tok:chararray)}")
        |def toks(x):
        |    return [] if x is None else [(w,) for w in x.split()]
        |""".stripMargin.getBytes("UTF-8"))
    py.toFile.deleteOnExit()
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$py' USING streaming_python AS f;
      d = LOAD '/root/testdata/sf0.001/documents.parquet';
      r = FOREACH d GENERATE doc_id, FLATTEN(f.toks(text));
    """).apply("r").df
    val plan = rel.queryExecution.executedPlan.toString
    assert(plan.contains("BatchPyEval"), s"batch exec did not engage:\n$plan")
    val got = rel.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val want = sf("documents").select("doc_id", "text").collect()
      .flatMap { r =>
        if (r.isNullAt(1)) Seq.empty[(Long, String)]
        else r.getString(1).split("\\s+").filter(_.nonEmpty)
          .map(w => (r.getLong(0), w)).toSeq
      }.groupBy(identity).view.mapValues(_.length).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("GROUP BY a py-udf key batches below the Aggregate") {
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$pyScript' USING streaming_python AS f;
      d = LOAD '/root/testdata/sf0.001/documents.parquet';
      g = GROUP d BY f.rev(lang);
      r = FOREACH g GENERATE group, COUNT(d) AS n;
    """).apply("r").df
    val plan = rel.queryExecution.executedPlan.toString
    assert(plan.contains("BatchPyEval"), s"did not batch:\n$plan")
    val got = rel.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = sf("documents").select("lang").collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0).reverse)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(got == want)
    assert(got.size > 1)
  }

  test("FILTER conjunct split: a null-guard AND a py-udf — the guard " +
       "filters BELOW the batch node so the fn never sees guarded rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls2").toFile
    dir.deleteOnExit()
    Seq((1L, "alpha"), (2L, null), (3L, "g"), (4L, null))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/docs.parquet")
    val py = java.nio.file.Files.createTempFile("graft_split", ".py")
    java.nio.file.Files.write(py,
      """from pig_util import outputSchema
        |@outputSchema("ok:boolean")
        |def long2(x):
        |    return len(x) >= 2   # raises TypeError on None
        |""".stripMargin.getBytes("UTF-8"))
    py.toFile.deleteOnExit()
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$py' USING streaming_python AS f;
      d = LOAD '$dir/docs.parquet';
      r = FILTER d BY text is not null AND f.long2(text);
      p = FOREACH r GENERATE doc_id;
    """).apply("p").df
    val plan = rel.queryExecution.executedPlan.toString
    // the udf batches, and the null guard sits BELOW it (pushed into
    // the scan as a parquet filter)
    assert(plan.contains("BatchPyEval"), s"did not batch:\n$plan")
    assert(plan.contains("isnotnull(text"), s"guard not below:\n$plan")
    assert(rel.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("a bincond-guarded py-udf stays SCALAR: the guard must keep " +
       "excluded rows away from the python fn") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nulls").toFile
    dir.deleteOnExit()
    Seq((1L, "alpha"), (2L, null), (3L, "gamma"), (4L, null))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/docs.parquet")
    val py = java.nio.file.Files.createTempFile("graft_guarded", ".py")
    java.nio.file.Files.write(py,
      """from pig_util import outputSchema
        |@outputSchema("u:chararray")
        |def up(x):
        |    return x.upper()   # raises AttributeError on None
        |""".stripMargin.getBytes("UTF-8"))
    py.toFile.deleteOnExit()
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$py' USING streaming_python AS f;
      d = LOAD '$dir/docs.parquet';
      r = FOREACH d GENERATE doc_id,
            (text is not null ? f.up(text) : 'MISSING') AS u;
    """).apply("r").df
    val plan = rel.queryExecution.executedPlan.toString
    // batching would call up(None) on the guarded rows and crash —
    // the rule must leave conditional branches scalar
    assert(!plan.contains("BatchPyEval"),
      s"guarded call was extracted:\n$plan")
    val got = rel.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "ALPHA"), (2L, "MISSING"),
      (3L, "GAMMA"), (4L, "MISSING")))
  }

  test("the batch path engages inside Structured Streaming microbatches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val reg = new graft.functions.PyUdfs.Registry
    graft.functions.PyUdfs.register(reg, pyScript.toString, Some("f"))
    val rev = graft.functions.PyUdfs.columnFor(spark, reg, "f.rev",
      Seq(col("v"))).get
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    input.addData((1L, "abc"), (2L, "xyz"), (3L, "q"))
    val q = input.toDF().toDF("id", "v")
      .select(col("id"), rev.as("r"))
      .writeStream.outputMode("append").format("memory")
      .queryName("pybatch_stream").start()
    q.processAllAvailable()
    val baos = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(baos)) { q.explain() }
    q.stop()
    val got = spark.table("pybatch_stream").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "cba"), (2L, "zyx"), (3L, "q")))
    assert(baos.toString.contains("BatchPyEval"),
      s"streaming plan did not batch:\n$baos")
  }

  test("a py-udf OVER a grouping column in the output list stays scalar " +
       "and the query runs (batching it would be unbindable post-agg)") {
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$pyScript' USING streaming_python AS f;
      d = LOAD '/root/testdata/sf0.001/documents.parquet';
      g = GROUP d BY lang;
      r = FOREACH g GENERATE f.rev(group) AS rlang, COUNT(d) AS n;
    """).apply("r").df
    // the call must NOT extract: its batch attribute would be neither a
    // grouping attribute nor an aggregate result — the scalar path is
    // the only bindable one here
    val got = rel.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = sf("documents").select("lang").collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
      .groupBy(identity)
      .map { case (k, v) =>
        (if (k == null) null else k.reverse) -> v.length.toLong }
    assert(got == want)
    assert(got.size > 1)
  }

  test("SUM over a py-udf input batches below the Aggregate while a " +
       "post-agg call in the same query stays scalar") {
    // CollapseProject folds the udf projection into the Aggregate's
    // agg input — the rule must then batch it BELOW the Aggregate
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$pyScript' USING streaming_python AS f;
      d = LOAD '/root/testdata/sf0.001/documents.parquet';
      r1 = FOREACH d GENERATE lang, f.nwords(text) AS nw;
      g = GROUP r1 BY lang;
      r = FOREACH g GENERATE group, SUM(r1.nw) AS tw;
    """).apply("r").df
    val plan = rel.queryExecution.executedPlan.toString
    assert(plan.contains("BatchPyEval"), s"agg input did not batch:\n$plan")
    val got = rel.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = sf("documents").select("lang", "text").collect()
      .groupBy(r => if (r.isNullAt(0)) null else r.getString(0))
      .map { case (k, rows) =>
        k -> rows.map(r => if (r.isNullAt(1)) 0L
          else r.getString(1).split("\\s+").count(_.nonEmpty).toLong).sum }
    assert(got == want)
    assert(got.size > 1)
  }

  test("an OR-guarded py-udf stays scalar: `x IS NULL OR f(x)` must " +
       "never call the fn on the guarded rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orguard").toFile
    dir.deleteOnExit()
    Seq((1L, "alpha"), (2L, null), (3L, "g"), (4L, null))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/docs.parquet")
    val py = java.nio.file.Files.createTempFile("graft_orguard", ".py")
    java.nio.file.Files.write(py,
      """from pig_util import outputSchema
        |@outputSchema("ok:boolean")
        |def long2(x):
        |    return len(x) >= 2   # raises TypeError on None
        |""".stripMargin.getBytes("UTF-8"))
    py.toFile.deleteOnExit()
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$py' USING streaming_python AS f;
      d = LOAD '$dir/docs.parquet';
      r = FILTER d BY text is null OR f.long2(text);
      p = FOREACH r GENERATE doc_id;
    """).apply("p").df
    // batching would evaluate long2(None) on rows the IS NULL guard
    // admits without ever reaching the udf — must stay scalar AND run
    assert(rel.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
  }

  test("a nondeterministic plain conjunct stays ABOVE the batch node " +
       "(only deterministic guards push below)") {
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$pyScript' USING streaming_python AS f;
      d = LOAD '/root/testdata/sf0.001/documents.parquet';
      r = FILTER d BY f.longish(text) AND RANDOM() <= 1.0;
      p = FOREACH r GENERATE doc_id;
    """).apply("p").df
    val opt = rel.queryExecution.optimizedPlan
    val nodes = opt.collect {
      case n: graft.plans.BatchPyEvalNode => n }
    assert(nodes.nonEmpty, s"did not batch:\n$opt")
    // rand() must not have been pushed under the batch node: it would
    // evaluate over a different row set than the original single filter
    assert(!nodes.exists(_.child.exists(_.expressions.exists(
        _.exists(!_.deterministic)))),
      s"nondeterministic conjunct pushed below the batch node:\n$opt")
    // RANDOM() <= 1.0 always passes, so the result is deterministic
    val got = rel.collect().map(_.getLong(0)).toSet
    val want = sf("documents").select("doc_id", "text").collect()
      .filter(r => !r.isNullAt(1) && r.getString(1).length > 40)
      .map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("multi-MB documents close batches on the byte bound and still " +
       "produce exact results") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bigdocs").toFile
    dir.deleteOnExit()
    // 24 docs of ~1MB each: a 128-row batch would be a ~24MB request;
    // the 8MB byte bound must split it without changing any result
    val big = (1L to 24L).map { i =>
      (i, (s"w$i " * ((1 << 20) / 4)).trim) }
    big.toDF("doc_id", "text").repartition(2).write.mode("overwrite")
      .parquet(s"$dir/docs.parquet")
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$pyScript' USING streaming_python AS f;
      d = LOAD '$dir/docs.parquet';
      r = FOREACH d GENERATE doc_id, f.nwords(text) AS nw;
    """).apply("r").df
    val plan = rel.queryExecution.executedPlan.toString
    assert(plan.contains("BatchPyEval"), s"did not batch:\n$plan")
    val got = rel.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = big.map { case (i, t) =>
      (i, t.split("\\s+").count(_.nonEmpty).toLong) }.toSet
    assert(got == want)
  }

  test("python exceptions carry the traceback through the batch path") {
    val py = java.nio.file.Files.createTempFile("graft_batch_boom", ".py")
    java.nio.file.Files.write(py,
      """from pig_util import outputSchema
        |@outputSchema("x:int")
        |def boom(s):
        |    raise ValueError("kaput: %s" % s)
        |""".stripMargin.getBytes("UTF-8"))
    py.toFile.deleteOnExit()
    val rel = graft.frontend.PigRunner(spark).run(s"""
      REGISTER '$py' USING streaming_python AS f;
      d = LOAD '/root/testdata/sf0.001/documents.parquet';
      r = FOREACH d GENERATE f.boom(lang) AS x;
    """).apply("r").df
    val e = intercept[Exception] { rel.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("kaput")),
      s"traceback lost: ${messages(e)}")
  }
}
