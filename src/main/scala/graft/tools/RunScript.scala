package graft.tools

/** CLI entry point — the `bin/pig script.pig` analog:
  *
  *   sbt "runMain graft.tools.RunScript /path/to/script.pig p1=v1 p2=v2"
  *
  * Params substitute `$p1` etc. (reference: Main.java parameter
  * substitution). STORE/DUMP statements in the script are the actions;
  * if the script has no STORE/DUMP, the last alias is dumped.
  */
object RunScript {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunScript <script.pig> [name=value…]")
    val script = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(0))), "UTF-8")
    val params = args.drop(1).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }.toMap
    val spark = graft.GraftSession.local()
    val runner = graft.frontend.PigRunner(spark).run(script, params)
    val hasAction = script.toUpperCase.contains("STORE ") ||
                    script.toUpperCase.contains("DUMP ")
    if (!hasAction) runner.relations.lastOption.foreach(_._2.dump())
    spark.stop()
  }
}
