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
  */
object RunScript {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.partition(_.startsWith("-"))
    require(rest.nonEmpty,
      "usage: RunScript [-check|-dryrun] <script.pig> [name=value…]")
    val path = rest(0)
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val params = rest.drop(1).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }.toMap
    val check = flags.exists(f => f == "-check" || f == "-c")
    val dryrun = flags.exists(f => f == "-dryrun" || f == "-r")
    flags.filterNot(f => Set("-check", "-c", "-dryrun", "-r")(f))
      .foreach(f => throw new IllegalArgumentException(s"unknown flag $f"))

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
