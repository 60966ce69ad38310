package graft.testkit

import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** xUnit-style harness for user Pig Latin scripts — the reference's
  * third test entry point (P/pigunit/PigTest.java): run a script with
  * parameter substitution and per-alias overrides, read any alias's
  * rows in Pig tuple format, and assert them against golden strings.
  * The natural migration path for existing PigUnit suites.
  *
  * Faithful contracts (PigTest.java):
  *  - STORE and DUMP statements are NEUTRALIZED by default (the ctor
  *    seeds aliasOverrides with STORE→"" and DUMP→"") so tests never
  *    write job output; the last STORE's alias is remembered and is
  *    what the no-alias [[assertOutput(expected:Seq[String])*]] checks
  *  - [[overrideAlias]] replaces the statement ASSIGNING that alias
  *    with a new query (PigTest.override)
  *  - [[mockAlias]] writes the mock rows to a temp file and overrides
  *    the alias with a `LOAD ... USING PigStorage(delim) AS schema`
  *    (PigTest.mockAlias)
  *  - rows compare as Pig tuple strings — `(yahoo,25)` — exactly the
  *    reference's Tuple.toString golden format
  *
  * Example (the reference's own top_queries.pig example):
  * {{{
  * val t = new PigUnit(spark, script,
  *   params = Map("n" -> "3", "input" -> dataPath))
  * t.assertOutput("queries_limit",
  *   Seq("(yahoo,25)", "(facebook,15)", "(twitter,7)"))
  * }}}
  */
final class PigUnit(spark: SparkSession, scriptText: String,
                    params: Map[String, String] = Map.empty,
                    paramFiles: Seq[String] = Seq.empty) {

  def this(spark: SparkSession, scriptLines: Seq[String]) =
    this(spark, scriptLines.mkString("\n"))

  private val aliasOverrides = mutable.LinkedHashMap[String, String](
    "STORE" -> "", "DUMP" -> "")
  private var lastStoreAlias: Option[String] = None

  /** Replace the statement assigning `alias` with `query`
    * (PigTest.override — `override` is a Scala keyword). */
  def overrideAlias(alias: String, query: String): Unit =
    aliasOverrides(alias) = query
  def unoverride(alias: String): Unit = { aliasOverrides.remove(alias); () }

  /** Mock `alias` with inline rows: each string is one delimited line
    * (PigTest.mockAlias). `schema` is the AS-clause field list, e.g.
    * `(query:chararray, count:int)`. */
  def mockAlias(alias: String, mockData: Seq[String], schema: String,
                delimiter: String = "\t"): Unit = {
    val f = Files.createTempFile(s"pigunit_mock_$alias", ".txt")
    Files.write(f, mockData.mkString("\n").getBytes("UTF-8"))
    overrideAlias(alias,
      s"$alias = LOAD '$f' USING PigStorage('$delimiter') AS $schema;")
  }

  /** Params resolve CLI-style: explicit map wins over param files
    * (PigTest ctor args over argFiles; each file is k=v lines). */
  private def resolvedParams: Map[String, String] = {
    val fromFiles = paramFiles.flatMap { p =>
      new String(Files.readAllBytes(Path.of(p)), "UTF-8")
        .linesIterator.map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k.trim -> v.trim }
    }.toMap
    fromFiles ++ params
  }

  /** Apply alias overrides statement-wise and run (PigServer
    * .registerScript + aliasOverrides). Fresh runner per call — the
    * reference re-registers per assert, so overrides added between
    * asserts take effect. */
  private def registerScript(): graft.frontend.PigRunner = {
    val parts = graft.frontend.PigPreprocessor
      .splitStatements(scriptText).flatMap { stmt =>
        val t = stmt.trim
        val store = """(?is)^STORE\s+(\w+)\s+INTO.*""".r
        val assign = """(?is)^(\w+)\s*=.*""".r
        t match {
          case store(alias) =>
            lastStoreAlias = Some(alias)
            if (aliasOverrides.contains("STORE")) None else Some(stmt)
          case _ if t.toUpperCase.startsWith("DUMP") &&
                    aliasOverrides.contains("DUMP") => None
          case assign(alias) if aliasOverrides.contains(alias) =>
            Some(aliasOverrides(alias).stripSuffix(";"))
          case _ => Some(stmt)
        }
      }
    graft.frontend.PigRunner(spark)
      .run(parts.mkString(";\n") + ";", resolvedParams)
  }

  def runScript(): Unit = { registerScript(); () }

  /** Rows of one alias in Pig tuple format (PigTest.getAlias). */
  def getAlias(alias: String): Seq[String] = {
    val runner = registerScript()
    try runner.apply(alias).dumpLines().toSeq
    finally runner.close()
  }

  /** Rows of the last STORE'd alias (PigTest.getAlias()). */
  def getAlias(): Seq[String] = {
    val runner = registerScript()
    val alias = lastStoreAlias.getOrElse(
      throw new IllegalStateException("script has no STORE statement"))
    try runner.apply(alias).dumpLines().toSeq
    finally runner.close()
  }

  /** alias → Pig schema string for every alias in the script
    * (PigTest.getAliasToSchemaMap; Schema.stringifySchema format). */
  def aliasToSchemaMap: Map[String, String] = {
    val runner = registerScript()
    try runner.relations.map { case (a, r) =>
      a -> r.describeString().stripPrefix(s"$a: ")
    } finally runner.close()
  }

  def assertOutput(expected: Seq[String]): Unit =
    assertLines(expected, getAlias(), sort = false)
  def assertOutput(alias: String, expected: Seq[String]): Unit =
    assertLines(expected, getAlias(alias), sort = false)
  def assertOutputAnyOrder(expected: Seq[String]): Unit =
    assertLines(expected, getAlias(), sort = true)
  def assertOutputAnyOrder(alias: String, expected: Seq[String]): Unit =
    assertLines(expected, getAlias(alias), sort = true)

  /** Mock `aliasInput` with `input` rows (schema taken from the
    * script's own declaration, PigTest 4-arg assertOutput), then check
    * `alias`. */
  def assertOutput(aliasInput: String, input: Seq[String], alias: String,
                   expected: Seq[String]): Unit =
    assertOutput(aliasInput, input, alias, expected, "\t")
  def assertOutput(aliasInput: String, input: Seq[String], alias: String,
                   expected: Seq[String], delimiter: String): Unit = {
    val runner = registerScript()
    val schema =
      try runner.apply(aliasInput).describeString()
        .stripPrefix(s"$aliasInput: ").replace('{', '(').replace('}', ')')
      finally runner.close()
    mockAlias(aliasInput, input, schema, delimiter)
    assertOutput(alias, expected)
  }

  private def assertLines(expected0: Seq[String], actual0: Seq[String],
                          sort: Boolean): Unit = {
    val (e, a) =
      if (sort) (expected0.sorted, actual0.sorted) else (expected0, actual0)
    if (e != a) throw new AssertionError(
      s"""pigunit mismatch:
         |expected:
         |${e.mkString("\n")}
         |actual:
         |${a.mkString("\n")}""".stripMargin)
  }
}

object PigUnit {
  /** Script from a file (PigTest(String scriptPath [, args, argFiles])). */
  def fromFile(spark: SparkSession, scriptPath: String,
               params: Map[String, String] = Map.empty,
               paramFiles: Seq[String] = Seq.empty): PigUnit =
    new PigUnit(spark,
      new String(Files.readAllBytes(Path.of(scriptPath)), "UTF-8"),
      params, paramFiles)
}
