package graft

import java.nio.file.{Files, Paths}
import graft.tools.GruntShell

/** Grunt-shell parity against the reference's own grunt.conf command
  * sequences (test/e2e/pig/tests/grunt.conf, Grunt group) — each test
  * here is a reference test number run verbatim modulo the harness's
  * `:INPATH:`/`:OUTPATH:`/`:TMP:` substitutions, asserted against the
  * conf's `expected_out_regex`/`expected_err_regex`. */
class GruntSpec extends SparkSpec {

  private lazy val shell = new GruntShell(graft.frontend.PigRunner(spark))

  // grunt.conf fixture shape: singlefile/studenttab10k + votertab10k
  private lazy val inpath: String = {
    val base = Files.createTempDirectory("grunt_in").toString
    Files.createDirectories(Paths.get(base, "singlefile"))
    Files.write(Paths.get(base, "singlefile", "studenttab10k"),
      "alice allen\t20\t3.5\nbob brown\t30\t2.5\n".getBytes("UTF-8"))
    Files.write(Paths.get(base, "singlefile", "votertab10k"),
      "calvin carson\t25\tdemocrat\t100.5\n".getBytes("UTF-8"))
    base
  }
  private def outpath(): String =
    Files.createTempDirectory("grunt_out").toString

  /** Run a reference multi-command sequence (one command per line). */
  private def run(seq: String): String =
    seq.trim.linesIterator.map(_.trim).filter(_.nonEmpty)
      .map(shell.execute).mkString("\n")

  test("Grunt/1: sh shell escape") {
    assert(run(s"sh ls $inpath").contains("singlefile"))
  }

  test("Grunt/2+3: bare pwd and `ls .` answer from the session cwd") {
    // the reference runs these cluster-only (expected_out_regex "/user" —
    // HDFS home); the local-mode analog pins the same behaviors: pwd with
    // no cd yet prints a real absolute path, and `ls .` lists it
    val fresh = new graft.tools.GruntShell(graft.frontend.PigRunner(spark))
    val wd = fresh.execute("pwd").trim
    assert(wd.startsWith("/") &&
      Files.isDirectory(Paths.get(wd)), s"pwd not a live dir: $wd")
    val ls = fresh.execute("ls .")
    // every listed entry resolves inside the cwd
    assert(ls.nonEmpty)
    fresh.execute(s"cd $inpath")
    assert(fresh.execute("ls .").matches("(?s).*singlefile.*"))
  }

  test("Grunt/4: ls") {
    assert(run(s"ls $inpath").matches("(?s).*singlefile.*"))
  }

  test("Grunt/6: cat of a missing path errors") {
    val e = intercept[Exception](run("cat nonexist"))
    assert(e.getMessage.contains("does not exist"))
  }

  test("Grunt/7: fs -ls passthrough") {
    assert(run(s"fs -ls $inpath").matches("(?s).*singlefile.*"))
  }

  test("Grunt/8: cat a file") {
    assert(run(s"cat $inpath/singlefile/studenttab10k")
      .contains("alice allen"))
  }

  test("Grunt/9: cd then pwd") {
    assert(run(s"cd $inpath\npwd").contains(
      Paths.get(inpath).toRealPath().toString))
  }

  test("Grunt/10: mkdir + cp + ls") {
    val out = outpath()
    assert(run(s"""mkdir $out/d
                   cp $inpath/singlefile/studenttab10k $out/d
                   ls $out/d""").matches("(?s).*studenttab10k.*"))
  }

  test("Grunt/11: cp to a new name") {
    val out = outpath()
    assert(run(s"""cp $inpath/singlefile/studenttab10k $out/fred
                   ls $out""").matches("(?s).*fred.*"))
  }

  test("Grunt/12: cp + mv rename") {
    val out = outpath()
    val o = run(s"""cp $inpath/singlefile/studenttab10k $out/jim
                    mv $out/jim $out/bob
                    ls $out""")
    assert(o.matches("(?s).*bob.*") && !o.contains("jim"))
  }

  test("Grunt/13: copyToLocal + sh cat") {
    val tmp = outpath()
    assert(run(s"""copyToLocal $inpath/singlefile/studenttab10k $tmp
                   sh cat $tmp/studenttab10k""").contains("alice allen"))
  }

  test("Grunt/14: copyToLocal + copyFromLocal + cat") {
    val (tmp, out) = (outpath(), outpath())
    assert(run(s"""copyToLocal $inpath/singlefile/votertab10k $tmp
                   copyFromLocal $tmp/votertab10k $out/joe
                   cat $out/joe""").contains("calvin carson"))
  }

  test("Grunt/15: cp + rm removes") {
    val out = outpath()
    val o = run(s"""cp $inpath/singlefile/studenttab10k $out/fred
                    rm $out/fred
                    ls $out""")
    assert(!o.contains("fred"))
  }

  test("Grunt/16: rmf of a missing path is fine") {
    run(s"rmf ${outpath()}/jill") // must not throw
  }

  test("alias named like a shell command stays Pig Latin") {
    // `sh = FILTER ...` must never reach /bin/sh (ADVICE round 7)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    shell.execute(s"n = LOAD '$dir/nation.parquet';")
    shell.execute("sh = FILTER n BY n_regionkey == 0;")
    shell.execute("fs = FOREACH sh GENERATE n_name;")
    val out = outpath()
    shell.execute(s"STORE fs INTO '$out/aliased';")
    assert(Files.exists(Paths.get(out, "aliased")))
  }

  // ---- cmdline.conf Describe_cmdline group: DESCRIBE prints Pig's
  // Schema.toString format, asserted against the conf's own
  // expected_out_regex (modulo :INPATH: substitution)
  private lazy val complexFixture: String = {
    val d = Files.createTempDirectory("cmdline_in").toString
    Files.write(Paths.get(d, "studenttabcomplex10k"),
      "[name#alice]\tx1\ty1\n[name#bob]\tx2\ty2\n".getBytes("UTF-8"))
    d
  }
  private def describeOf(script: String, alias: String): String =
    graft.frontend.PigRunner(spark).run(script).apply(alias)
      .describeString()

  test("Describe_cmdline/1: undeclared AS fields print bytearray") {
    val s = s"""A = load '$inpath/singlefile/studenttab10k'
                    using PigStorage() as (name, age, gpa);"""
    assert(describeOf(s, "A") ==
      "A: {name: bytearray,age: bytearray,gpa: bytearray}")
  }

  test("Describe_cmdline/3: typed AS fields print their types") {
    val s = s"""A = load '$inpath/singlefile/studenttab10k'
        using PigStorage() as (name:chararray, age:int, gpa:double);"""
    assert(describeOf(s, "A") ==
      "A: {name: chararray,age: int,gpa: double}")
  }

  test("Describe_cmdline/5: untyped map prints map[]") {
    val s = s"""A = load '$complexFixture/studenttabcomplex10k'
                    using PigStorage() as (m:map[],x,y);"""
    assert(describeOf(s, "A") ==
      "A: {m: map[],x: bytearray,y: bytearray}")
  }

  test("Describe_cmdline/6-8: describe after a projection, any order") {
    val r = graft.frontend.PigRunner(spark).run(s"""
      A = load '$complexFixture/studenttabcomplex10k'
          using PigStorage() as (m:map[],x,y);
      B = foreach A generate m;
    """)
    assert(r.apply("A").describeString() ==
      "A: {m: map[],x: bytearray,y: bytearray}")
    assert(r.apply("B").describeString() == "B: {m: map[]}")
  }

  test("Describe_cmdline/14: boolean column") {
    val s = s"""A = load '$inpath/singlefile/studenttab10k'
        using PigStorage() as (name:chararray, age:int, gpa:double,
                               instate:boolean);"""
    assert(describeOf(s, "A") ==
      "A: {name: chararray,age: int,gpa: double,instate: boolean}")
  }

  test("Describe_cmdline/9-11: pipeline describes incl. grouped bag") {
    val r = graft.frontend.PigRunner(spark).run(s"""
      A = load '$inpath/singlefile/studenttab10k'
          as (name:chararray, age:int, gpa:float);
      B = foreach A generate name, age;
      C = filter B by age > 30;
      D = group C by name;
    """)
    assert(r.apply("A").describeString() ==
      "A: {name: chararray,age: int,gpa: float}")
    assert(r.apply("B").describeString() == "B: {name: chararray,age: int}")
    assert(r.apply("C").describeString() == "C: {name: chararray,age: int}")
    assert(r.apply("D").describeString() ==
      "D: {group: chararray,C: {(name: chararray,age: int)}}")
  }

  test("Unicode_cmdline/1: dump of non-ASCII chararray renders verbatim") {
    // reference fixture: unicode names like bobτ; expected `(bobτ)`
    val dir = Files.createTempDirectory("unicode").toString
    Files.write(Paths.get(dir, "unicode100"),
      "bobτ\nalice中文\n".getBytes("UTF-8"))
    val lines = graft.frontend.PigRunner(spark).run(s"""
      A = load '$dir/unicode100' as (name:chararray);
      B = order A by name;
    """).apply("B").dumpLines().toSeq
    assert(lines.contains("(bobτ)"), lines.mkString("|"))
    assert(lines.contains("(alice中文)"))
  }

  test("DUMP renders rows in Pig tuple syntax") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val lines = graft.frontend.PigRunner(spark).run(s"""
      r = LOAD '$dir/region.parquet';
      s = FOREACH r GENERATE r_regionkey, r_name;
      o = ORDER s BY r_regionkey;
    """).apply("o").dumpLines().toSeq
    assert(lines.head == "(0,AFRICA)") // bare values, no quotes (Pig)
    assert(lines.forall(l => l.startsWith("(") && l.endsWith(")")))
    // complex fields render as Pig literals
    val bag = graft.frontend.PigRunner(spark).run(s"""
      r = LOAD '$dir/region.parquet';
      g = GROUP r ALL;
      c = FOREACH g GENERATE group, COUNT(r) AS n;
    """).apply("c").dumpLines().toSeq
    assert(bag == Seq("(all,5)"))
  }

  test("DUMP and DESCRIBE act immediately in a session") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    shell.execute(s"r = LOAD '$dir/region.parquet';")
    shell.execute("DESCRIBE r;") // prints schema, must not throw
    shell.execute("DUMP r;")     // prints rows, must not throw
  }

  test("fs -rm refuses a non-empty directory; -rmr recurses (ADVICE r8)") {
    val out = outpath()
    run(s"""mkdir $out/d
            cp $inpath/singlefile/studenttab10k $out/d""")
    val e = intercept[Exception](run(s"fs -rm $out/d"))
    assert(e.getMessage.contains("non-empty directory"))
    assert(Files.exists(Paths.get(out, "d", "studenttab10k")))
    // -rm on a plain file and on an EMPTY directory still deletes
    run(s"fs -rm $out/d/studenttab10k")
    run(s"fs -rm $out/d")
    assert(!Files.exists(Paths.get(out, "d")))
    // -rmr deletes a tree
    run(s"""mkdir $out/e
            cp $inpath/singlefile/studenttab10k $out/e
            fs -rmr $out/e""")
    assert(!Files.exists(Paths.get(out, "e")))
  }

  test("cd with no argument returns home (processCD default, ADVICE r8)") {
    val sh2 = new GruntShell(graft.frontend.PigRunner(spark))
    sh2.execute(s"cd $inpath")
    sh2.execute("cd")
    assert(sh2.execute("pwd") ==
      new java.io.File(sys.props("user.home")).getCanonicalPath)
  }

  test("Describe_cmdline/12: undefined alias = ERROR 1003 (reference text)") {
    val r = graft.frontend.PigRunner(spark).run(s"""
      A = load '$inpath/singlefile/studenttab10k'
          as (name:chararray, age:int, gpa:float);
      B = foreach A generate name, age;
    """)
    val e = intercept[Exception](r.run("describe X;"))
    assert(e.getMessage.contains(
      "ERROR 1003: Unable to find an operator for alias X"))
    // the describes before the bad one still answer (same session)
    assert(r.describeLine("B") == "B: {name: chararray,age: int}")
  }

  test("Describe_cmdline/13: cogroup + flatten bincond keeps two-level names") {
    val voters = Files.createTempDirectory("voter").toString
    Files.write(Paths.get(voters, "voter_data"),
      "calvin carson\t25\tdemocrat\t100.5\n".getBytes("UTF-8"))
    val r = graft.frontend.PigRunner(spark).run(s"""
      A = LOAD '$inpath/singlefile/studenttab10k'
          AS (name: chararray, age: int, gpa: float);
      B = LOAD '$voters/voter_data'
          AS (name: chararray, age: int, registration: chararray,
              contributions: float);
      C = COGROUP A BY name, B BY name;
      D = FOREACH C GENERATE group,
          flatten((not IsEmpty(A) ? A
            : (bag{tuple(chararray, int, float)}){(null, null, null)})),
          flatten((not IsEmpty(B) ? B
            : (bag{tuple(chararray, int, chararray, float)})
              {(null,null,null, null)}));
    """)
    assert(r.describeLine("D") ==
      "D: {group: chararray,A::name: chararray,A::age: int," +
      "A::gpa: float,B::name: chararray,B::age: int," +
      "B::registration: chararray,B::contributions: float}")
    // the outer-join idiom the script encodes must also EXECUTE: every
    // group keeps a row, empty sides padded with nulls
    val rows = r.apply("D").df.collect()
    assert(rows.length == 3) // alice, bob (no voter), calvin (no student)
    val calvin = rows.find(_.getString(0) == "calvin carson").get
    assert(calvin.isNullAt(1) && calvin.getString(4) == "calvin carson")
    val alice = rows.find(_.getString(0) == "alice allen").get
    assert(alice.getString(1) == "alice allen" && alice.isNullAt(4))
  }

  test("NestedDescribe/1+3: describe of a nested-FOREACH inner alias") {
    val r = graft.frontend.PigRunner(spark).run(s"""
      A = load '$inpath/singlefile/studenttab10k' as (name, age, gpa);
      B = group A by name;
      C = foreach B { D = distinct A.age; generate COUNT(D), group;}
    """)
    assert(r.describeLine("C::D") == "D: {age: bytearray}")
    // NestedDescribe/3: the positional spelling addresses the same field
    val r3 = graft.frontend.PigRunner(spark).run(s"""
      A = load '$inpath/singlefile/studenttab10k' as (name, age, gpa);
      B = group A by name;
      C = foreach B { D = distinct A.$$1; generate COUNT(D), group;}
    """)
    assert(r3.describeLine("C::D") == "D: {age: bytearray}")
    assert(r3.apply("C").df.count() == 2)
  }

  test("NestedDescribe/2: unnamed COUNT prints bare type; chained inner aliases") {
    val r = graft.frontend.PigRunner(spark).run(s"""
      A = load '$inpath/singlefile/studenttab10k' as (name, age, gpa);
      B = group A by name;
      C = foreach B { D = distinct A.age; E = filter D by age > 1000;
                      generate COUNT(E), group;}
    """)
    assert(r.describeLine("C") == "C: {long,group: bytearray}")
    assert(r.describeLine("C::E") == "E: {age: bytearray}")
  }

  test("ILLUSTRATE: boxed tables for the target's ancestor chain only") {
    val r = graft.frontend.PigRunner(spark).run(s"""
      A = load '$inpath/singlefile/studenttab10k'
          as (name: chararray, age: int, gpa: float);
      B = filter A by age > 21;
      unrelated = load '$inpath/singlefile/votertab10k'
          as (name: chararray, age: int, reg: chararray, c: float);
      C = foreach B generate name, gpa;
    """)
    val out = r.illustrateText("C")
    // every ancestor gets a boxed table; non-ancestors are omitted
    assert(out.contains("| A    ") && out.contains("| B    ") &&
           out.contains("| C    "))
    assert(!out.contains("unrelated"))
    // header cells carry pig types; body carries sampled values
    assert(out.contains("name:chararray") && out.contains("age:int"))
    assert(out.contains("bob brown"))
    // reference format: dashed rule above and below each table
    assert(out.linesIterator.count(_.startsWith("----")) >= 6)
    // unknown alias → same error class as DESCRIBE
    intercept[Exception](r.illustrateText("nosuch"))
  }

  test("RunScript -check parses without executing; -dryrun substitutes") {
    val d = Files.createTempDirectory("runscript").toString
    Files.write(Paths.get(s"$d/s.pig"),
      ("a = LOAD '$in' AS (x:int);\nb = FILTER a BY x > $lim;\n" +
       "STORE b INTO '$d/out';\n").getBytes("UTF-8"))
    // -check: no out dir appears, no spark needed
    graft.tools.RunScript.main(
      Array("-check", s"$d/s.pig", "in=/nope", "lim=3", s"d=$d"))
    assert(!Files.exists(Paths.get(s"$d/out")))
    // bad syntax fails the check
    Files.write(Paths.get(s"$d/bad.pig"),
      "a = LOAD;".getBytes("UTF-8"))
    intercept[Exception] {
      graft.tools.RunScript.main(Array("-check", s"$d/bad.pig"))
    }
    // -dryrun: params substituted into the .substituted file, not run
    graft.tools.RunScript.main(
      Array("-dryrun", s"$d/s.pig", "in=/nope", "lim=3", s"d=$d"))
    val sub = new String(Files.readAllBytes(
      Paths.get(s"$d/s.pig.substituted")), "UTF-8")
    assert(sub.contains("x > 3") && sub.contains("'/nope'"))
    assert(!Files.exists(Paths.get(s"$d/out")))
  }

  test("RunScript -param_file + CLI override precedence; -version") {
    val d = Files.createTempDirectory("paramfile").toString
    Files.write(Paths.get(s"$d/p.params"),
      "# comment\nlim=7\nname=from_file\n".getBytes("UTF-8"))
    Files.write(Paths.get(s"$d/s.pig"),
      "a = LOAD '/nope' AS (x:int);\nb = FILTER a BY x > $lim;\n"
        .getBytes("UTF-8"))
    // -check only parses — enough to prove substitution resolved both
    // params (an unresolved $lim would fail the parse)
    graft.tools.RunScript.main(
      Array("-check", "-param_file", s"$d/p.params", s"$d/s.pig"))
    graft.tools.RunScript.main(
      Array("-check", "-param_file", s"$d/p.params", s"$d/s.pig",
        "lim=9"))
    graft.tools.RunScript.main(Array("-version"))
    intercept[IllegalArgumentException] {
      graft.tools.RunScript.main(Array("-bogusflag", s"$d/s.pig"))
    }
  }

  test("exec runs isolated; run shares the session (ADVICE r8)") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val runner = graft.frontend.PigRunner(spark)
    val sh2 = new GruntShell(runner)
    val scriptDir = outpath()
    Files.write(Paths.get(scriptDir, "iso.pig"),
      s"inner_x = LOAD '$dir/region.parquet';".getBytes("UTF-8"))
    sh2.execute(s"exec '$scriptDir/iso.pig'")
    // the exec'd script's aliases must NOT leak into the session
    intercept[Exception](runner.apply("inner_x"))
    // ...and session aliases must not be visible to an exec'd script
    sh2.execute(s"sess_a = LOAD '$dir/region.parquet';")
    Files.write(Paths.get(scriptDir, "leak.pig"),
      "uses = FILTER sess_a BY r_regionkey == 0;".getBytes("UTF-8"))
    intercept[Exception](sh2.execute(s"exec '$scriptDir/leak.pig'"))
    // run, by contrast, shares the session both ways
    sh2.execute(s"run '$scriptDir/iso.pig'")
    runner.apply("inner_x") // visible now
  }
}
