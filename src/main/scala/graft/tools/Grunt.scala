package graft.tools

/** Interactive Grunt shell analog — reference §3.1 entry point A
  * (`bin/pig` → Main.java → grunt/GruntParser.java): statements are read
  * from stdin (continuing across lines until a terminating `;`) and
  * executed against ONE stateful [[graft.frontend.PigRunner]], so aliases
  * accumulate across statements exactly like a Grunt session; DUMP /
  * DESCRIBE / EXPLAIN / STORE act immediately. `quit;` (or EOF) exits.
  *
  *   sbt "runMain graft.tools.Grunt"
  *
  * Statement termination is detected on a line-ending `;` — a `;` inside
  * a string literal mid-line is handled by the parser, but a multi-line
  * literal containing a line-final `;` is not REPL-safe (run those from a
  * script file via RunScript).
  */
object Grunt {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val runner = graft.frontend.PigRunner(spark)
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(System.in))
    val buf = new StringBuilder
    var done = false
    print("grunt> "); Console.flush()
    while (!done) {
      val line = in.readLine()
      if (line == null) done = true
      else {
        buf.append(line).append('\n')
        val stmt = buf.toString
        val trimmed = stmt.trim.stripSuffix(";").trim
        if (stmt.trim.matches("(?i)(quit|exit)\\s*;?\\s*")) done = true
        // GruntParser shell escapes: `sh cmd`, `fs -ls path` (mapped to
        // the local fs), `run 'script.pig'` / `exec 'script.pig'`.
        // `sh`/`fs`/`run`/`exec` are NOT reserved words in Pig Latin, so
        // `sh = FILTER ...;` is a legal alias assignment — disambiguate
        // on shape: an '=' next token means Pig, and `fs` must be
        // followed by a dash-option to be a shell escape.
        else if (trimmed.split("\\s+", 3).lift(1).exists(_.startsWith("="))) {
          if (stmt.trim.endsWith(";")) {
            try runner.run(stmt)
            catch { case e: Exception => System.err.println(s"ERROR: ${e.getMessage}") }
            buf.clear(); print("grunt> "); Console.flush()
          } else { print("    > "); Console.flush() }
        }
        else if (trimmed.toLowerCase.startsWith("sh ")) {
          try println(scala.sys.process.Process(
            Seq("/bin/sh", "-c", trimmed.drop(3))).!!)
          catch { case e: Exception => System.err.println(s"ERROR: ${e.getMessage}") }
          buf.clear(); print("grunt> "); Console.flush()
        } else if (trimmed.matches("(?i)fs\\s+-.*")) {
          // fs -<cmd> args → the matching local command (the engine's
          // filesystem IS the local one)
          val parts = trimmed.split("\\s+").drop(1)
          val shellCmd = parts.headOption.map(_.stripPrefix("-")) match {
            case Some("ls")             => "ls -la"
            case Some("cat")            => "cat"
            case Some("rm" | "rmr")     => "rm -r"
            case Some("mkdir")          => "mkdir -p"
            case Some("cp")             => "cp -r"
            case Some("mv")             => "mv"
            case other => s"echo unsupported fs command: ${other.getOrElse("")} #"
          }
          try println(scala.sys.process.Process(
            Seq("/bin/sh", "-c", shellCmd + " " +
              parts.drop(1).mkString(" "))).!!)
          catch { case e: Exception => System.err.println(s"ERROR: ${e.getMessage}") }
          buf.clear(); print("grunt> "); Console.flush()
        } else if (trimmed.toLowerCase.matches("(run|exec)\\s+.*")) {
          val f = trimmed.split("\\s+", 2)(1).stripPrefix("'").stripSuffix("'")
          try runner.run(new String(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)),
            "UTF-8"))
          catch { case e: Exception => System.err.println(s"ERROR: ${e.getMessage}") }
          buf.clear(); print("grunt> "); Console.flush()
        } else if (stmt.trim.endsWith(";")) {
          try runner.run(stmt)
          catch {
            case e: Exception => System.err.println(s"ERROR: ${e.getMessage}")
          }
          buf.clear()
          print("grunt> "); Console.flush()
        } else { print("    > "); Console.flush() }
      }
    }
    runner.close()
    spark.stop()
  }
}
