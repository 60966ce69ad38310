package graft.tools

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

/** One grunt statement dispatcher — reference §3.1 entry point A
  * (`bin/pig` → Main.java → grunt/GruntParser.java). Holds the session
  * state a real Grunt session has: one stateful
  * [[graft.frontend.PigRunner]] (aliases accumulate across statements)
  * and a current working directory for the filesystem commands
  * (GruntParser.processCD — the engine's filesystem IS the local one).
  *
  * Supported command surface (GruntParser.g):
  *  - bare fs commands: `pwd cd ls cat mkdir cp mv rm rmf copyToLocal
  *    copyFromLocal` — relative paths resolve against the session cwd
  *  - `fs -<cmd> args` (FsShell passthrough, mapped to the same ops)
  *  - `sh <cmd>` shell escape
  *  - `run/exec '<script.pig>'`
  *  - anything else: a Pig Latin statement for the runner.
  *
  * `sh`/`fs`/`run`/`exec`/`ls`/… are NOT reserved words in Pig Latin, so
  * `sh = FILTER ...;` stays an alias assignment — an '=' next token
  * always means Pig.
  */
final class GruntShell(runner: graft.frontend.PigRunner) {

  private var cwd: File = new File(".").getCanonicalFile
  def currentDir: File = cwd

  private def resolve(p: String): File = {
    val f = new File(p)
    (if (f.isAbsolute) f else new File(cwd, p)).getCanonicalFile
  }
  /** `cd` must ALSO move the engine's filesystem working directory
    * (GruntParser.processCD sets it on the DataStorage) so relative
    * paths in subsequent Pig LOAD/STORE statements follow the session
    * cwd, not the JVM launch dir. */
  private def syncEngineCwd(spark: org.apache.spark.sql.SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    org.apache.hadoop.fs.FileSystem.get(conf)
      .setWorkingDirectory(new org.apache.hadoop.fs.Path(cwd.getPath))
  }
  private def arg(words: IndexedSeq[String], i: Int, cmd: String): String =
    words.lift(i).getOrElse(throw new IllegalArgumentException(
      s"$cmd: missing operand"))
  private def require_exists(f: File): File = {
    if (!f.exists())
      throw new IllegalArgumentException(s"${f.getPath} does not exist")
    f
  }
  /** cat of a directory concatenates its data files (a STOREd relation
    * is a directory of part files — GruntParser cat does the same). */
  private def catFile(f: File): String =
    if (f.isDirectory)
      f.listFiles().filter(x => x.isFile && !x.getName.startsWith(".") &&
          !x.getName.startsWith("_"))
        .sortBy(_.getName).map(catFile).mkString
    else new String(Files.readAllBytes(f.toPath), "UTF-8")

  private def copyRec(src: File, dst0: File): Unit = {
    // hadoop cp semantics: copying INTO an existing dir keeps the name
    val dst = if (dst0.isDirectory) new File(dst0, src.getName) else dst0
    if (src.isDirectory) {
      dst.mkdirs()
      src.listFiles().foreach(c => copyRec(c, new File(dst, c.getName)))
    } else {
      Option(dst.getParentFile).foreach(_.mkdirs())
      Files.copy(src.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
    }
  }
  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  /** Execute one COMPLETE grunt statement (';' optional); returns the
    * text a session would print. Errors throw — the REPL prints them. */
  def execute(stmtRaw: String): String = {
    val stmt = stmtRaw.trim
    val trimmed = stmt.stripSuffix(";").trim
    val words = trimmed.split("\\s+").toIndexedSeq
    def runPig(): String = { runner.run(stmt); "" }
    if (trimmed.isEmpty) ""
    else if (words.lift(1).exists(_.startsWith("="))) runPig()
    else words.head.toLowerCase match {
      case "sh" =>
        scala.sys.process.Process(
          Seq("/bin/sh", "-c", trimmed.drop(3)), cwd).!!
      case "fs" if words.lift(1).exists(_.startsWith("-")) =>
        words(1).stripPrefix("-").toLowerCase match {
          case "rmr" => // FsShell spells recursive delete -rmr
            execute(("rm" +: words.drop(2)).mkString(" "))
          case "rm" =>
            // FsShell -rm is NON-recursive: it refuses a directory that
            // still has children (Hadoop: "use -rmr instead"). Only the
            // bare grunt `rm` and `-rmr` recurse.
            val f = require_exists(resolve(arg(words, 2, "fs -rm")))
            if (f.isDirectory &&
                Option(f.listFiles()).exists(_.nonEmpty))
              throw new IllegalArgumentException(
                s"fs -rm: ${f.getPath} is a non-empty directory; " +
                  "use -rmr to delete recursively")
            f.delete(); ""
          case s => execute((s +: words.drop(2)).mkString(" "))
        }
      case "pwd" => cwd.getPath
      case "cd" =>
        // GruntParser.processCD: a bare `cd` returns to the home/default
        // directory rather than erroring.
        cwd = words.lift(1) match {
          case Some(p) => require_exists(resolve(p))
          case None =>
            new File(sys.props.getOrElse("user.home", ".")).getCanonicalFile
        }
        syncEngineCwd(runner.spark); ""
      case "ls" =>
        val f = require_exists(resolve(words.lift(1).getOrElse(".")))
        if (f.isDirectory)
          f.listFiles().map(_.getPath).sorted.mkString("\n")
        else f.getPath
      case "cat" => catFile(require_exists(resolve(arg(words, 1, "cat"))))
      case "mkdir" => resolve(arg(words, 1, "mkdir")).mkdirs(); ""
      case "cp" | "copytolocal" | "copyfromlocal" =>
        copyRec(require_exists(resolve(arg(words, 1, "cp"))),
          resolve(arg(words, 2, "cp"))); ""
      case "mv" =>
        val (s, d) = (require_exists(resolve(arg(words, 1, "mv"))),
          resolve(arg(words, 2, "mv")))
        Files.move(s.toPath, d.toPath, StandardCopyOption.REPLACE_EXISTING)
        ""
      case "rm"  => deleteRec(require_exists(resolve(arg(words, 1, "rm")))); ""
      case "rmf" => // rm -force: missing path is NOT an error
        val f = resolve(arg(words, 1, "rmf")); if (f.exists()) deleteRec(f); ""
      case "exec" if words.length == 1 =>
        "" // bare exec: batch barrier — a no-op in this eager engine
      case "run" | "exec" =>
        // script path resolves against the session cwd like every
        // other command
        val f = resolve(arg(words, 1, "run").stripPrefix("'")
          .stripSuffix("'"))
        val script = new String(Files.readAllBytes(f.toPath), "UTF-8")
        if (words.head.equalsIgnoreCase("exec")) {
          // GruntParser: exec runs the script in an ISOLATED batch
          // context — session aliases are neither visible to the script
          // nor overwritten by it (run, by contrast, shares the session).
          val iso = graft.frontend.PigRunner(runner.spark)
          try iso.run(script) finally iso.close()
        } else runner.run(script)
        ""
      case _ => runPig()
    }
  }
}

/** Interactive Grunt REPL: statements are read from stdin (continuing
  * across lines until a terminating `;`) and executed against one
  * [[GruntShell]]. `quit;` (or EOF) exits.
  *
  *   sbt "runMain graft.tools.Grunt"
  *
  * Statement termination is detected on a line-ending `;` — a `;` inside
  * a string literal mid-line is handled by the parser, but a multi-line
  * literal containing a line-final `;` is not REPL-safe (run those from a
  * script file via RunScript). Bare fs commands (`pwd`, `ls x`, …) are
  * line-terminated like the reference's GruntParser.
  */
object Grunt {
  private val fsCommands = Set("pwd", "cd", "ls", "cat", "mkdir", "cp",
    "mv", "rm", "rmf", "copytolocal", "copyfromlocal", "sh", "fs",
    "run", "exec")

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val runner = graft.frontend.PigRunner(spark)
    val shell = new GruntShell(runner)
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
        val words = stmt.trim.split("\\s+", 3)
        val isFs = fsCommands.contains(words.head.toLowerCase) &&
          !words.lift(1).exists(_.startsWith("="))
        if (stmt.trim.matches("(?i)(quit|exit)\\s*;?\\s*")) done = true
        else if (isFs || stmt.trim.endsWith(";")) {
          try {
            val out = shell.execute(stmt)
            if (out.nonEmpty) println(out)
          } catch {
            case e: Exception => System.err.println(s"ERROR: ${e.getMessage}")
          }
          buf.clear(); print("grunt> "); Console.flush()
        } else { print("    > "); Console.flush() }
      }
    }
    runner.close()
    spark.stop()
  }
}
