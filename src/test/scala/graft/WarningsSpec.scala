package graft

import java.nio.file.{Files, Paths}

import graft.frontend.PigRunner

/** Ports the reference's cmdline.conf `Warning` group (lines 254-306):
  * Pig's aggregated warning counters. The reference runs these
  * cluster-only ("Warnings use counters, which don't work in local
  * mode"); our Spark-native counters are [[org.apache.spark.util
  * .LongAccumulator]]s, which DO work locally, so the same scripts are
  * pinned here at a small row count with exact expected counts.
  *
  * Warning/4 (a jar-registered UDF calling `warn()`) stays out of scope
  * with REGISTER-jar (COVERAGE.md §2.7).
  */
class WarningsSpec extends SparkSpec {

  /** studenttab-style fixture: name \t age \t gpa, one row per tuple. */
  private def studentFile(rows: Seq[String]): String = {
    val dir = Files.createTempDirectory("warn").toString
    Files.write(Paths.get(dir, "student"),
      (rows.mkString("\n") + "\n").getBytes("UTF-8"))
    s"$dir/student"
  }

  test("Warning/1: DIVIDE_BY_ZERO counted per offending row") {
    // (int)gpa == 1 makes the divisor (int)gpa - 1 zero; a null gpa
    // makes it null (no warning — Pig only warns on a literal 0 divisor)
    val in = studentFile(Seq(
      "alice\t20\t1.5",  // (int)1.5 = 1 → ÷0
      "bob\t21\t3.2",    // divisor 2
      "carol\t22\t1.0",  // ÷0
      "dan\t23\t"))      // null gpa → null divisor, no warning
    val r = PigRunner(spark)
    r.run(s"""
      a = load '$in' as (name:chararray, age:int, gpa:double);
      b = foreach a generate (int)((int)gpa/((int)gpa - 1)) as norm_gpa:int;
      c = foreach b generate (norm_gpa is null ? 0 : norm_gpa);
    """)
    // store-equivalent: full evaluation (a bare count() lets Catalyst
    // prune the projection — correctly — and no rows are cast)
    r("c").df.collect()
    assert(r.warnings.counts.get("DIVIDE_BY_ZERO") === Some(2L),
      r.warnings.counts.toString)
  }

  test("Warning/2: FIELD_DISCARDED_TYPE_CONVERSION_FAILED per failed cast") {
    // every name is non-numeric → (int)name nulls on all 4 rows; the
    // reference pins exactly "10000 time(s)" on its 10k input
    val in = studentFile(Seq(
      "alice\t20\t1.5", "bob\t21\t3.2", "carol\t22\t1.0", "dan\t23\t2.0"))
    val r = PigRunner(spark)
    r.run(s"""
      a = load '$in' as (name, age:int, gpa:double);
      b = foreach a generate (int)name;
    """)
    r("b").df.collect()
    assert(r.warnings.counts.get("FIELD_DISCARDED_TYPE_CONVERSION_FAILED")
      === Some(4L), r.warnings.counts.toString)
  }

  test("Warning/2b: a cast that succeeds does not warn") {
    val in = studentFile(Seq("7\t20\t1.5", "8\t21\t3.2"))
    val r = PigRunner(spark)
    r.run(s"""
      a = load '$in' as (name, age:int, gpa:double);
      b = foreach a generate (int)name;
    """)
    r("b").df.collect()
    assert(!r.warnings.counts.contains(
      "FIELD_DISCARDED_TYPE_CONVERSION_FAILED"), r.warnings.counts.toString)
  }

  test("Warning/3: IMPLICIT_CAST_TO_INT / _FLOAT counted once per site") {
    // bytearray `age` + int literal → one INT cast; bytearray `gpa` +
    // float literal → one FLOAT cast — compile-time counts, no job run
    val in = studentFile(Seq("alice\t20\t1.5"))
    val r = PigRunner(spark)
    r.run(s"""
      a = load '$in' as (name:chararray, age, gpa);
      b = foreach a generate age + 1, gpa + 0.1f;
    """)
    assert(r.warnings.counts.get("IMPLICIT_CAST_TO_INT") === Some(1L),
      r.warnings.counts.toString)
    assert(r.warnings.counts.get("IMPLICIT_CAST_TO_FLOAT") === Some(1L),
      r.warnings.counts.toString)
  }

  test("Warning/4: a UDF calling warn() aggregates per kind") {
    // ports TestWarningFunc.java (reference test udf jar): sums the
    // numeric args, warns UDF_WARNING_3 per non-numeric arg and
    // UDF_WARNING_1 on all-null input. Jar REGISTER stays out of scope;
    // the script-callable registry + a captured UdfWarner is the
    // engine's EvalFunc.warn surface.
    val in = studentFile(Seq(
      "alice\t20\t1.5", "bob\t21\t3.2", "carol\t22\t1.0"))
    val r = PigRunner(spark)
    val empty = r.warnings.warner("UDF_WARNING_1")
    val nonNumeric = r.warnings.warner("UDF_WARNING_3")
    r.spark.udf.register("test_warning_func",
      (name: String, age: java.lang.Integer, gpa: java.lang.Double) => {
        if (name == null && age == null && gpa == null) {
          empty.warn("Input is empty."); null
        } else {
          var out = 0.0; var any = false
          if (age != null) { out += age.doubleValue; any = true }
          if (gpa != null) { out += gpa.doubleValue; any = true }
          if (name != null) nonNumeric.warn("Found a non-numeric type.")
          if (any) (out: java.lang.Double) else null
        }
      })
    graft.functions.UdfSurface.track("test_warning_func")
    r.run(s"""
      a = load '$in' as (name, age:int, gpa:double);
      b = foreach a generate test_warning_func(name, age, gpa);
    """)
    val rows = r("b").df.collect()
    assert(rows.map(_.getDouble(0)).sorted.toSeq === Seq(21.5, 23.0, 24.2))
    assert(r.warnings.counts.get("UDF_WARNING_3") === Some(3L),
      r.warnings.counts.toString)
    assert(!r.warnings.counts.contains("UDF_WARNING_1"))
  }

  test("Warning/5: ACCESSING_NON_EXISTENT_FIELD counted per row") {
    // schemaless load + $3 on 3-column rows → null per row, one warning
    // per row (reference pins "10000 time(s)" on its 10k input)
    val in = studentFile(Seq(
      "alice\t20\t1.5", "bob\t21\t3.2", "carol\t22\t1.0"))
    val r = PigRunner(spark)
    r.run(s"""
      a = load '$in';
      b = foreach a generate $$3;
    """)
    val rows = r("b").df.collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(0)))
    assert(r.warnings.counts.get("ACCESSING_NON_EXISTENT_FIELD")
      === Some(3L), r.warnings.counts.toString)
  }

  test("report() prints the reference's aggregate line format") {
    val in = studentFile(Seq("alice\t20\t1.5"))
    val r = PigRunner(spark)
    r.run(s"""
      a = load '$in' as (name:chararray, age, gpa);
      b = foreach a generate age + 1;
    """)
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    try {
      System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
      r.warnings.report()
    } finally System.setErr(old)
    assert(buf.toString("UTF-8")
      .contains("Encountered Warning IMPLICIT_CAST_TO_INT 1 time(s)."),
      buf.toString("UTF-8"))
  }
}
