package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}

/** Per-partition external-process runner for STREAM with file-handle
  * redirection — the Spark-side analog of the reference's
  * ExecutableManager (P/impl/streaming/ExecutableManager.java) +
  * StreamingUtil.createProcess. `rdd.pipe` covers the plain
  * stdin→stdout case; this covers the rest:
  *
  *  - a scratch directory per task = the MR task cwd the reference's
  *    handles and ship list are defined against
  *  - `input('f')`: the partition is FULLY written to scratch/f before
  *    the process starts (FileInputHandler is asynchronous — the
  *    command reads the file itself; stdin is closed immediately)
  *  - `output('f')`: stdout is drained and discarded; after a clean
  *    exit, scratch/f is streamed out as the result lines
  *  - default handles: rows pump to stdin from a feeder thread while
  *    stdout streams out lazily (the 3-thread pump, minus the stderr
  *    thread — stderr inherits to the executor log)
  *
  * The scratch dir rides the task's PATH (StreamingUtil appends the
  * task cwd to $PATH so shipped executables resolve by bare name) and
  * is deleted on task completion.
  */
object StreamProcess {

  def run(shellCmd: String, rows: Iterator[String],
          inputFile: Option[String], outputFile: Option[String],
          ship: Seq[String]): Iterator[String] = {
    val dir = Files.createTempDirectory("graft-stream-")
    onTaskDone(() => deleteRec(dir.toFile))

    for (s <- ship) {
      // 'path#link' (a cache() entry, Hadoop fragment convention):
      // materialize under the link name; plain ship keeps the base name
      val (srcPath, linkName) = s.split('#') match {
        case Array(p, l) => (p, l)
        case _           => (s, new File(s).getName)
      }
      val src = new File(srcPath)
      require(src.exists(), s"ship file does not exist: $srcPath")
      val dst = dir.resolve(linkName)
      Files.copy(src.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setExecutable(true) // shipped commands run by bare name
    }

    val pb = new ProcessBuilder("/bin/sh", "-c", shellCmd)
    pb.directory(dir.toFile)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val env = pb.environment()
    env.put("PATH", env.getOrDefault("PATH", "") +
      File.pathSeparator + dir.toString)

    inputFile match {
      case Some(f) =>
        // asynchronous file input: all rows land before exec
        val w = Files.newBufferedWriter(dir.resolve(f), UTF_8)
        try rows.foreach { l => w.write(l); w.write('\n') }
        finally w.close()
        val proc = pb.start()
        proc.getOutputStream.close()
        collect(proc, dir, outputFile, feeder = None)
      case None =>
        val proc = pb.start()
        val feeder = new Thread(() => {
          val os = new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(proc.getOutputStream, UTF_8))
          try rows.foreach { l => os.write(l); os.write('\n') }
          finally os.close()
        }, "graft-stream-stdin")
        feeder.setDaemon(true)
        feeder.start()
        collect(proc, dir, outputFile, Some(feeder))
    }
  }

  /** Result lines. Primary output on stdout streams lazily (exit code
    * checked at exhaustion, like rdd.pipe); a file handle must wait for
    * process exit, then streams the file. */
  private def collect(proc: Process, dir: Path, outputFile: Option[String],
                      feeder: Option[Thread]): Iterator[String] =
    outputFile match {
      case Some(f) =>
        // stdout is not the result — drain it so the child can't block
        val drain = new Thread(() => {
          val buf = new Array[Byte](8192)
          val is = proc.getInputStream
          while (is.read(buf) >= 0) {}
        }, "graft-stream-drain")
        drain.setDaemon(true)
        drain.start()
        val code = proc.waitFor()
        feeder.foreach(_.join())
        drain.join()
        require(code == 0, s"stream command exited with code $code")
        val out = dir.resolve(f)
        require(Files.exists(out),
          s"stream command wrote no output file '$f'")
        val reader = Files.newBufferedReader(out, UTF_8)
        closingLines(reader, () => ())
      case None =>
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, UTF_8))
        closingLines(reader, { () =>
          val code = proc.waitFor()
          feeder.foreach(_.join())
          require(code == 0, s"stream command exited with code $code")
        })
    }

  private def closingLines(reader: java.io.BufferedReader,
                           onEnd: () => Unit): Iterator[String] =
    new Iterator[String] {
      private var nextLine = reader.readLine()
      private var closed = false
      def hasNext: Boolean = {
        if (nextLine == null && !closed) {
          closed = true; reader.close(); onEnd()
        }
        nextLine != null
      }
      def next(): String = {
        if (!hasNext) throw new NoSuchElementException
        val l = nextLine; nextLine = reader.readLine(); l
      }
    }

  private def onTaskDone(f: () => Unit): Unit =
    Option(org.apache.spark.TaskContext.get()) match {
      case Some(tc) => tc.addTaskCompletionListener[Unit](_ => f())
      case None => () // driver-side (tests): best-effort JVM-exit cleanup
    }

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }
}
