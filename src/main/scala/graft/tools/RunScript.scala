package graft.tools

/** CLI entry point — the `bin/pig script.pig` analog:
  *
  *   sbt "runMain graft.tools.RunScript /path/to/script.pig p1=v1 p2=v2"
  *
  * Params substitute `$p1` etc. (reference: Main.java parameter
  * substitution). STORE/DUMP statements in the script are the actions;
  * if the script has no STORE/DUMP, the last alias is dumped.
  *
  * Flags (reference Main.java options):
  *  - `-check`  (`-c`): syntax check only — preprocess + parse, print
  *    `<script> syntax OK`, execute nothing (Main.java `-c`).
  *  - `-dryrun` (`-r`): run parameter substitution + macro/DEFINE
  *    expansion and write the result to `<script>.substituted` without
  *    executing (Main.java `-r`, PreprocessorContext dry run).
  *  - `-e '<statements>'`: execute the inline string through a Grunt
  *    shell (fs commands AND Pig Latin; Main.java `-e`) — no script file.
  *  - `-param_file <f>` (`-m`): k=v lines, `#` comments (ParamLoader);
  *    CLI `name=value` args override file values (reference precedence).
  *  - `-x <exectype>`: accepted and ignored — the engine is always
  *    Spark-backed (`local[*]` here, a cluster master in production).
  *  - `-version` (`-i`): print the engine version line and exit.
  */
object RunScript {
  def main(args: Array[String]): Unit = {
    // flags with a value operand
    val valued = Set("-e", "-param_file", "-m", "-x")
    val flags = scala.collection.mutable.Map.empty[String, String]
    val rest = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (valued(a)) {
        require(i + 1 < args.length, s"$a needs an operand")
        flags(a) = args(i + 1); i += 2
      } else if (a.startsWith("-")) { flags(a) = ""; i += 1 }
      else { rest += a; i += 1 }
    }
    val known = valued ++ Set("-check", "-c", "-dryrun", "-r",
      "-version", "-i")
    flags.keys.filterNot(known).foreach(f =>
      throw new IllegalArgumentException(s"unknown flag $f"))

    if (flags.contains("-version") || flags.contains("-i")) {
      println("graft (Pig-compatible Spark engine) — Pig Latin surface " +
        "of Apache Pig 0.18, Spark " + org.apache.spark.SPARK_VERSION)
      return
    }

    val fileParams = flags.get("-param_file").orElse(flags.get("-m"))
      .map { pf =>
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(pf)), "UTF-8")
          .linesIterator.map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
          .map { l => val Array(k, v) = l.split("=", 2); (k.trim, v.trim) }
          .toMap
      }.getOrElse(Map.empty[String, String])

    flags.get("-e") match {
      case Some(inline) =>
        val spark = graft.GraftSession.local()
        val shell = new GruntShell(graft.frontend.PigRunner(spark))
        // a -e string may hold several ';'-separated statements; fs
        // commands have no ';' and run line-wise like a grunt session
        inline.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { l =>
          val o = shell.execute(l); if (o.nonEmpty) println(o)
        }
        spark.stop()
        return
      case None => ()
    }

    require(rest.nonEmpty,
      "usage: RunScript [-check|-dryrun|-e '<stmts>'|-param_file f] " +
        "<script.pig|driver.py> [name=value…] [args…]")
    val path = rest(0)
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    // `pig script.py`: an embedded python driver script (reference
    // Main.java routes by extension/shebang to the scripting engine).
    // name=value operands become -param bindings; bare operands pass
    // through as the driver's sys.argv.
    val isPyDriver = path.endsWith(".py") ||
      script.linesIterator.nextOption.exists(l =>
        l.startsWith("#!") && l.contains("python"))
    if (isPyDriver) {
      // only `name=value` shapes become params; anything else (e.g.
      // `--mode=fast`) passes through to the driver's sys.argv, matching
      // the reference (params come only from -param/-param_file there)
      val isParam = "^\\w+=.*$".r
      val (kvs, bare) = rest.drop(1)
        .partition(a => isParam.pattern.matcher(a).matches)
      val params = fileParams ++ kvs.map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toMap
      val spark = graft.GraftSession.local()
      val res = graft.frontend.EmbeddedPig.runScript(spark, script,
        cmdArgs = bare.toSeq, baseParams = params,
        cwd = new java.io.File(path).getAbsoluteFile.getParentFile)
      print(res.stdout)
      System.err.print(res.stderr)
      spark.stop()
      if (res.rc != 0) sys.exit(res.rc)
      return
    }
    val params = fileParams ++ rest.drop(1).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }.toMap
    val check = flags.contains("-check") || flags.contains("-c")
    val dryrun = flags.contains("-dryrun") || flags.contains("-r")

    if (dryrun) {
      val expanded = graft.frontend.PigPreprocessor.expand(script, params)
      val out = java.nio.file.Paths.get(path + ".substituted")
      java.nio.file.Files.write(out, expanded.getBytes("UTF-8"))
      println(s"Dry run completed. Substituted pig script is at $out")
    } else if (check) {
      graft.frontend.PigParser.parse(
        graft.frontend.PigPreprocessor.expand(script, params))
      println(s"$path syntax OK")
    } else {
      val spark = graft.GraftSession.local()
      val runner = graft.frontend.PigRunner(spark).run(script, params)
      val hasAction = script.toUpperCase.contains("STORE ") ||
                      script.toUpperCase.contains("DUMP ")
      if (!hasAction) runner.relations.lastOption.foreach(_._2.dump())
      spark.stop()
    }
  }
}
