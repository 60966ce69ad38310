package graft

import graft.testkit.PigUnit

/** Ports of the reference's OWN PigUnit examples
  * (test/org/apache/pig/test/pigunit/TestPigTest.java, running
  * test/data/pigunit/top_queries.pig with its shipped input data and
  * golden outputs) — the third test entry point's migration contract. */
class PigUnitSpec extends SparkSpec {

  private val dataDir = "/root/reference/test/data/pigunit"
  private val script = s"$dataDir/top_queries.pig"
  private val input = s"$dataDir/top_queries_input_data.txt"
  private def args = Map(
    "n" -> "3", "reducers" -> "1",
    "input" -> input, "output" -> "top_3_queries")
  private val golden = Seq("(yahoo,25)", "(facebook,15)", "(twitter,7)")

  test("testNtoN: file script + params, assert a named alias") {
    PigUnit.fromFile(spark, script, args)
      .assertOutput("queries_limit", golden)
  }

  test("testImplicitNtoN: assert against the last STORE'd alias") {
    // STORE is neutralized (no job output written), but its alias is
    // what the no-alias assert reads — golden file
    // top_queries_expected_top_3.txt pins the same three rows
    val expected = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        s"$dataDir/top_queries_expected_top_3.txt")), "UTF-8")
      .linesIterator.filter(_.nonEmpty).toSeq
    PigUnit.fromFile(spark, script, args).assertOutput(expected)
  }

  test("testTextInput: mock the load alias with inline rows") {
    val mock = Seq("yahoo\t10", "twitter\t7", "facebook\t10",
      "yahoo\t15", "facebook\t5", "a\t1", "b\t2", "c\t3", "d\t4", "e\t5")
    PigUnit.fromFile(spark, script, args)
      .assertOutput("data", mock, "queries_limit", golden)
  }

  test("testDelimiter: mock rows with a custom delimiter") {
    val mock = Seq("yahoo,10", "twitter,7", "facebook,10",
      "yahoo,15", "facebook,5", "a,1", "b,2", "c,3", "d,4", "e,5")
    PigUnit.fromFile(spark, script, args)
      .assertOutput("data", mock, "queries_limit", golden, ",")
  }

  test("testOverride: replace one alias's query between asserts") {
    val t = PigUnit.fromFile(spark, script, args)
    t.overrideAlias("queries_limit",
      "queries_limit = LIMIT queries_ordered 2;")
    t.assertOutput(Seq("(yahoo,25)", "(facebook,15)"))
  }

  test("testInlinePigScript: script from inline lines, no params") {
    val t = new PigUnit(spark, Seq(
      s"data = LOAD '$input' AS (query:CHARARRAY, count:INT);",
      "queries_group = GROUP data BY query PARALLEL 1;",
      "queries_sum = FOREACH queries_group GENERATE group AS query, " +
        "SUM(data.count) AS count;",
      "queries_ordered = ORDER queries_sum BY count DESC PARALLEL 1;",
      "queries_limit = LIMIT queries_ordered 3;",
      "STORE queries_limit INTO 'top_3_queries';"))
    t.assertOutput(golden)
  }

  test("testArgFiles: params resolve from a k=v param file") {
    // the reference ships top_queries_params.txt with RELATIVE paths;
    // re-materialize it with this checkout's absolute ones
    val pf = java.nio.file.Files.createTempFile("pigunit_params", ".txt")
    java.nio.file.Files.write(pf,
      s"n=3\nreducers=1\ninput=$input\noutput=top_3_queries\n"
        .getBytes("UTF-8"))
    PigUnit.fromFile(spark, script, paramFiles = Seq(pf.toString))
      .assertOutput("queries_limit", golden)
  }

  test("testMacro: script defining and calling a macro") {
    PigUnit.fromFile(spark, s"$dataDir/top_queries_macro.pig", args)
      .assertOutput("queries_limit", golden)
  }

  test("testAnyOrderOutput: order-insensitive assert") {
    PigUnit.fromFile(spark, script, args)
      .assertOutputAnyOrder("queries_limit",
        Seq("(facebook,15)", "(twitter,7)", "(yahoo,25)"))
  }

  test("testAliasSchemaMap: every alias maps to its Pig schema") {
    val m = PigUnit.fromFile(spark, script, args).aliasToSchemaMap
    assert(m("data") == "{query: chararray,count: int}")
    assert(m("queries_sum") == "{query: chararray,count: long}")
  }

  test("mismatch raises an AssertionError naming both sides") {
    val e = intercept[AssertionError] {
      PigUnit.fromFile(spark, script, args)
        .assertOutput("queries_limit", Seq("(nope,1)"))
    }
    assert(e.getMessage.contains("(yahoo,25)") &&
      e.getMessage.contains("(nope,1)"))
  }
}
