package graft.frontend

/** STREAM command I/O redirection — the reference's HandleSpec model
  * (P/impl/streaming/StreamingCommand.java:431 HandleSpec,
  * HandlerFactory.java: stdin/stdout ⇒ Default*Handler, a file name ⇒
  * File*Handler; P/builtin/PigStreaming.java: the serializer, whose
  * single ctor arg is the field delimiter).
  *
  * A DEFINE's clauses parse to a [[StreamIo.Spec]]; because DEFINEs are
  * expanded TEXTUALLY before parsing (PigMacro design), the spec rides
  * inside the inlined backtick command behind a control-char mark that
  * cannot occur in script text, and the interpreter decodes it back out.
  */
object StreamIo {

  /** One I/O handle: `name` is "-" for stdin/stdout or a file name
    * (resolved in the process's scratch working directory, the task cwd
    * analog); `sep` is the PigStreaming field delimiter. */
  final case class Handle(name: String, sep: String = "\t") {
    def isStd: Boolean = name == "-"
  }

  /** Full DEFINE I/O spec. `outputs`: the FIRST handle is the primary
    * output that becomes the relation (StreamingCommand.getOutputSpec
    * returns handle 0); secondary file outputs are side files the
    * reference persists next to the job output — here they are written
    * by the process into its scratch cwd and discarded. `ship`: files
    * copied into the scratch cwd before exec (FileLocalizer ship list —
    * the task-cwd contract that lets commands reference them by bare
    * name). */
  final case class Spec(input: Option[Handle] = None,
                        outputs: Seq[Handle] = Seq.empty,
                        ship: Seq[String] = Seq.empty) {
    def inputFile: Option[Handle] = input.filterNot(_.isStd)
    def primaryOut: Option[Handle] = outputs.headOption.filterNot(_.isStd)
    def inSep: String = input.map(_.sep).getOrElse("\t")
    def outSep: String = outputs.headOption.map(_.sep).getOrElse("\t")
    /** True when the plain rdd.pipe stdin/stdout path suffices. */
    def isTrivial: Boolean =
      inputFile.isEmpty && primaryOut.isEmpty && ship.isEmpty &&
        outputs.drop(1).isEmpty && inSep == "\t" && outSep == "\t"
  }

  // Control-char framing (cannot occur in real script text; precedent:
  // PigPreprocessor.CtorMark). Layout:
  //   cmd MARK in.name  in.sep  out1.name  out1.sep
  //        out2…  ship1  ship2…
  private val Mark = "\u0007graft.io\u0007"
  private val F = "\u0006" // field sep inside a handle
  private val H = "\u0004" // list element sep
  private val S = "\u0005" // section sep

  def encode(cmd: String, spec: Spec): String =
    if (spec == Spec()) cmd
    else cmd + Mark +
      spec.input.map(h => h.name + F + h.sep).getOrElse("") + S +
      spec.outputs.map(h => h.name + F + h.sep).mkString(H) + S +
      spec.ship.mkString(H)

  def decode(raw: String): (String, Spec) = raw.indexOf(Mark) match {
    case -1 => (raw, Spec())
    case i =>
      val cmd = raw.substring(0, i)
      val sections = raw.substring(i + Mark.length).split(S, -1)
      def handle(s: String): Handle = s.split(F, -1) match {
        case Array(n, sep) => Handle(n, sep)
        case Array(n) => Handle(n)
      }
      val input = Some(sections(0)).filter(_.nonEmpty).map(handle)
      val outs = sections.lift(1).getOrElse("").split(H, -1).toSeq
        .filter(_.nonEmpty).map(handle)
      val ship = sections.lift(2).getOrElse("").split(H, -1).toSeq
        .filter(_.nonEmpty)
      (cmd, Spec(input, outs, ship))
  }

  /** Parse the DEFINE's trailing clause text — `input(...) output(...)
    * ship(...) cache(...) stderr(...)` in any order (QueryParser.g
    * stream_cmd). Returns the spec; malformed clauses and custom
    * (non-PigStreaming) serializers fail loudly — a silently-dropped
    * serializer would change the wire format.
    *
    * Handle grammar (QueryParser.g input_clause/output_clause):
    *   input( handle [using serializer] [, handle …] )
    *   handle  := stdin | stdout | 'filename'
    *   serializer := PigStreaming | PigStreaming('<sep>')
    * (dotted prefixes allowed: org.apache.pig.builtin.PigStreaming). */
  def parseClauses(clauses0: String): Spec = {
    var rest = clauses0.trim
    var spec = Spec()
    val quotedList = """'[^']*'(\s*,\s*'[^']*')*"""
    val handleRe =
      ("""(?is)^(stdin|stdout|'[^']*')""" +
       """(?:\s+using\s+([\w.$]+)(?:\(\s*(?:'([^']*)')?\s*\))?)?\s*""").r
    def parseHandles(body: String, clause: String): Seq[Handle] = {
      body.split(",(?=(?:[^']*'[^']*')*[^']*$)").toIndexedSeq.map { h0 =>
        handleRe.findFirstMatchIn(h0.trim) match {
          case Some(m) if m.matched.length == h0.trim.length =>
            val name = m.group(1) match {
              case "stdin" | "stdout" => "-"
              case q => q.stripPrefix("'").stripSuffix("'")
            }
            val sep = Option(m.group(2)) match {
              case None => "\t"
              case Some(ser) if ser.split('.').last == "PigStreaming" =>
                Option(m.group(3)).getOrElse("\t")
              case Some(ser) => throw new IllegalArgumentException(
                s"custom stream serializer not supported: $ser " +
                "(only PigStreaming['<delimiter>'])")
            }
            Handle(name, sep)
          case _ => throw new IllegalArgumentException(
            s"malformed $clause handle: ${h0.take(60)}")
        }
      }
    }
    val clauseRe = """(?is)^(input|output|ship|cache|stderr)\s*\(""".r
    while (rest.nonEmpty) {
      val m = clauseRe.findFirstMatchIn(rest).getOrElse(
        throw new IllegalArgumentException(
          s"malformed DEFINE stream clause: ${rest.take(60)}"))
      val bodyStart = m.matched.length
      // matching close paren: the body may nest parens inside a
      // serializer spec — PigStreaming(',') — or a quoted path
      var i = bodyStart; var depth = 1; var inQ = false
      while (i < rest.length && depth > 0) {
        rest.charAt(i) match {
          case '\'' => inQ = !inQ
          case '(' if !inQ => depth += 1
          case ')' if !inQ => depth -= 1
          case _ => ()
        }
        i += 1
      }
      if (depth != 0) throw new IllegalArgumentException(
        s"unclosed DEFINE stream clause: ${rest.take(60)}")
      val close = i - 1
      val body = rest.substring(bodyStart, close).trim
      m.group(1).toLowerCase match {
        case "input" =>
          val hs = parseHandles(body, "input")
          if (hs.size != 1) throw new IllegalArgumentException(
            "input() takes exactly one handle")
          if (hs.head.name == "-" && body.toLowerCase.startsWith("stdout"))
            throw new IllegalArgumentException("input(stdout) is invalid")
          spec = spec.copy(input = Some(hs.head))
        case "output" =>
          spec = spec.copy(outputs = parseHandles(body, "output"))
        case "ship" =>
          if (body.nonEmpty && !body.matches(quotedList))
            throw new IllegalArgumentException(
              s"ship() takes quoted paths: ${body.take(60)}")
          val paths = body.split(",(?=(?:[^']*'[^']*')*[^']*$)")
            .map(_.trim.stripPrefix("'").stripSuffix("'"))
            .filter(_.nonEmpty).toSeq
          // compile-time existence check, like the reference
          // (FileLocalizer.validate → "Invalid ship specification")
          paths.find(p => !new java.io.File(p).exists()).foreach(p =>
            throw new IllegalArgumentException(
              s"Invalid ship specification: '$p' does not exist!"))
          spec = spec.copy(ship = spec.ship ++ paths)
        case "cache" =>
          // distributed-cache entry: 'path#symlink' lands in the task
          // cwd under the symlink name (Hadoop fragment convention;
          // StreamingCommand.CacheSpec). Locally that is exactly a ship
          // with a rename — the entries join the ship list keeping
          // their '#' so the runner can materialize the link name.
          if (body.nonEmpty && !body.matches(quotedList))
            throw new IllegalArgumentException(
              s"cache() takes quoted paths: ${body.take(60)}")
          val entries = body.split(",(?=(?:[^']*'[^']*')*[^']*$)")
            .map(_.trim.stripPrefix("'").stripSuffix("'"))
            .filter(_.nonEmpty).toSeq
          // the pre-# part must exist at compile time (reference:
          // "Invalid cache specification")
          entries.find(p => !new java.io.File(p.split('#').head).exists())
            .foreach(p => throw new IllegalArgumentException(
              s"Invalid cache specification: '$p' does not exist!"))
          spec = spec.copy(ship = spec.ship ++ entries)
        case "stderr" => // log persistence hint: validated, no-op
          if (body.nonEmpty &&
              !body.matches("""(?is)'[^']*'(\s+limit\s+\d+)?"""))
            throw new IllegalArgumentException(
              s"malformed stderr(): ${body.take(60)}")
      }
      rest = rest.substring(close + 1).trim
    }
    spec
  }
}
