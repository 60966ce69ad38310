package graft.frontend

import scala.collection.mutable

/** Textual preprocessing, mirroring the reference's design (macros expand
  * textually before parsing — P/parser/PigMacro.java; parameters via
  * P/tools/parameters/PreprocessorContext.java):
  *
  *  - `%default name value` / `%declare name value` — parameter defaults
  *  - `$name` substitution from params (positional `$0` refs survive —
  *    only `$ident` forms are substituted)
  *  - `DEFINE m(p1, p2) RETURNS r { ... };` — macro definition
  *  - `out = m(a, b);` — macro call expansion ($p1→a, $r→out)
  *  - `DEFINE alias 'command';` — command alias (used by STREAM THROUGH)
  *  - `DEFINE alias Func('ctorArgs');` — function alias (QueryParser.g:361
  *    DEFINE func_spec): `alias(x)` expands to `Func(x, 'ctorArgs')` —
  *    constructor args append after the call args, matching how the
  *    builtin catalog takes its configuration (dotted package prefixes
  *    are stripped: only the terminal name resolves).
  */
object PigPreprocessor {

  /** String-literal value marking the call-args / ctor-args boundary in
    * expanded `InvokeFor*` alias calls, so the interpreter never has to
    * infer the split from literal contents (a data literal containing a
    * dot — `F('U.S.A')` — would otherwise be mistaken for the method
    * name). Control-char framed: cannot occur in real script text. */
  val CtorMark = "\u0007graft.ctor\u0007"

  final case class Macro(params: Seq[String], returns: String, body: String)

  def expand(script: String,
             params: Map[String, String] = Map.empty): String = {
    val vars = mutable.Map[String, String]() ++= params
    var inlineN = 0
    val macros = mutable.Map[String, Macro]()
    val cmdDefines = mutable.Map[String, String]()
    // alias → (func simple name, ctorArgs, markCtorBoundary)
    val funcDefines = mutable.Map[String, (String, String, Boolean)]()
    val out = new StringBuilder

    // `set key value` is line-terminated in the reference's scripts
    // (GruntParser reads it as a shell-style command) — normalize to ';'.
    // Known limitation: a multi-line string literal whose interior line
    // starts with `set ` would also be rewritten (never seen in practice)
    var rest = script.replaceAll("(?im)^(\\s*set\\s+[^;\\r\\n]+?)\\s*$", "$1;")
    // Grunt's `exec[;]` forces the batch accumulated so far to run
    // (GruntParser processExplain/exec). This interpreter is eager —
    // every STORE runs at its statement — so the barrier is a no-op;
    // strip it so reference scripts that interleave store/exec/load of
    // intermediates run verbatim.
    rest = rest.replaceAll("(?im)^\\s*exec\\s*;?\\s*$", "")
    while (rest.nonEmpty) {
      val trimmed = rest.dropWhile(_.isWhitespace)
      val skipped = rest.length - trimmed.length
      out.append(rest.take(skipped))
      rest = trimmed
      if (rest.isEmpty) ()
      else if (rest.startsWith("--")) {
        val e = rest.indexOf('\n') match { case -1 => rest.length; case i => i }
        out.append(rest.take(e)); rest = rest.drop(e)
      } else if (rest.startsWith("%default") || rest.startsWith("%declare")) {
        // %default / %declare are LINE-terminated (preprocessor directives).
        // Precedence (PreprocessorContext): %default only fills a missing
        // value; %declare OVERRIDES anything set before it.
        val declare = rest.startsWith("%declare")
        val e = rest.indexOf('\n') match { case -1 => rest.length; case i => i }
        val parts = rest.take(e).split("\\s+", 3)
        if (parts.length == 3) {
          val raw = parts(2).stripSuffix(";").trim
          // `cmd` value: run the shell command at preprocessing time and
          // substitute its stdout (PreprocessorContext.executeShellCommand)
          val v0 =
            if (raw.length > 1 && raw.head == '`' && raw.last == '`')
              scala.sys.process.Process(
                Seq("/bin/sh", "-c", raw.substring(1, raw.length - 1)))
                .!!.trim
            else raw.stripPrefix("'").stripSuffix("'")
          // earlier params substitute into the value (%declare B $A)
          val v = substitute(v0, vars.toMap)
          if (declare) vars(parts(1)) = v
          else vars.getOrElseUpdate(parts(1), v)
        }
        rest = rest.drop(math.min(e + 1, rest.length))
      } else if (rest.toUpperCase.startsWith("REGISTER ")) {
        // REGISTER 'x.jar' / REGISTER 'udfs.py' USING streaming_python
        // AS ns — normalize to the canonical quoted statement form and
        // pass through to the parser (the runner loads jar EvalFuncs via
        // JarUdfs, scripting files via PyUdfs). A MISSING file errors
        // like the reference (QueryParserDriver ERROR 101, negative.conf
        // NoSuchFile/2) — a typo'd path must not be silently dropped.
        // a REGISTER line without its semicolon ends at the LINE break
        // (reference e2e scripts carry this sloppiness — UDFContext/1's
        // `register :FUNCPATH:/testudf.jar` — and the reference's
        // GruntParser accepts it); a semicolon before the newline keeps
        // the normal statement scan
        val semiEnd = statementEnd(rest)
        val nl = rest.indexOf('\n')
        // the statement may CONTINUE past the line break: when the next
        // line starts with USING/AS, when this line ends mid-clause
        // (bare REGISTER, trailing USING/AS), or when the path itself
        // wrapped — then keep scanning to the ';'
        val firstLine = rest.take(if (nl < 0) rest.length else nl)
          .trim.toUpperCase
        val lineIsComplete = firstLine != "REGISTER" &&
          !firstLine.endsWith(" USING") && !firstLine.endsWith(" AS")
        val e = if (nl >= 0 && nl < semiEnd && lineIsComplete &&
                    !rest.drop(nl).trim.toUpperCase
                      .matches("(?s)(USING|AS)\\b.*")) nl
                else semiEnd
        val stmt = rest.take(e).trim.stripSuffix(";").trim
        // the path may be a QUOTED literal containing spaces — take the
        // quoted run whole; only an unquoted path splits on whitespace
        val afterKw = stmt.drop("REGISTER".length).trim
        val (path, tail) =
          if (afterKw.startsWith("'")) {
            val close = afterKw.indexOf('\'', 1)
            require(close > 0, s"unterminated REGISTER path: $stmt")
            (afterKw.substring(1, close), afterKw.drop(close + 1).trim)
          } else afterKw.split("\\s+", 2) match {
            case Array(p)    => (p, "")
            case Array(p, t) => (p, t)
          }
        if (path.nonEmpty && !new java.io.File(path).exists())
          throw new IllegalArgumentException(
            s"ERROR 101: file '$path' does not exist.")
        out.append(s"REGISTER '$path' $tail;\n")
        rest = rest.drop(math.min(e + 1, rest.length))
      } else if (rest.toUpperCase.startsWith("IMPORT ")) {
        // IMPORT 'macros.pig'; — inline the file (reference: QueryParser.g
        // IMPORT → macro file inlining)
        val e = statementEnd(rest)
        val path = rest.take(e).split("\\s+", 2)(1).trim
          .stripPrefix("'").stripSuffix("'")
        val imported = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        rest = imported + "\n" + rest.drop(math.min(e + 1, rest.length))
      } else if (rest.toUpperCase.startsWith("DEFINE ")) {
        val e = defineEnd(rest)
        parseDefine(rest.take(e)) match {
          case MacroDef(name, m)      => macros(name) = m
          case CmdDef(name, c)        => cmdDefines(name) = c
          case FuncDef(name, f, args) =>
            // a DOTTED class outside the reference's own BUILTIN
            // namespaces is a REGISTER'd user-jar EvalFunc: its ctor
            // args need the explicit CtorMark boundary (builtins/
            // piggybank instead consume plainly-appended ctor literals
            // positionally). Matching the whole org.apache.pig prefix
            // here would misroute user classes that happen to live in
            // that package (the reference's own test jars do).
            val builtinNs = Seq("org.apache.pig.builtin.",
              "org.apache.pig.impl.builtin.", "org.apache.pig.piggybank.")
            funcDefines(name) = (f.split('.').last, args,
              f.contains(".") && !builtinNs.exists(f.startsWith))
        }
        // with a trailing ';' e points AT it (skip it); a brace-
        // terminated DEFINE's e is already one past '}' — drop exactly
        // e so the next statement's first character survives
        rest = rest.drop(
          if (e < rest.length && rest.charAt(e) == ';') e + 1 else e)
      } else {
        val e = statementEnd(rest)
        val stmt = rest.take(e)
        rest = rest.drop(e + 1)
        out.append(rewriteInlineForeach(
          expandStatement(stmt, macros.toMap, cmdDefines.toMap,
            funcDefines.toMap, vars.toMap),
          () => { inlineN += 1; inlineN }))
        out.append(";\n")
      }
    }
    out.toString
  }

  /** `b = FOREACH (GROUP a ALL) GENERATE …` — the inline-relation sugar
    * (QueryParser.g nested_op_clause): the parenthesized operator is
    * lifted into its own synthetic-alias statement, exactly the
    * two-statement desugaring the reference's parser performs. String
    * literals are masked so a LOAD path containing "foreach (" can't
    * trigger the rewrite. */
  private def rewriteInlineForeach(stmt0: String, nextId: () => Int): String =
    mapMaskingQuotes(stmt0) { s0 =>
      val re = "(?i)\\bforeach\\s*\\(".r
      val pre = new StringBuilder
      var cur = s0
      var guard = 0
      var m = re.findFirstMatchIn(cur)
      while (m.isDefined && guard < 8) {
        val mm = m.get
        val open = mm.end - 1
        var depth = 0; var j = open
        while (j < cur.length && (depth != 0 || j == open)) {
          val c = cur.charAt(j)
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          j += 1
        }
        val inner = cur.substring(open + 1, j - 1).trim
        val alias = s"__inl_${nextId()}"
        pre.append(s"$alias = $inner;\n")
        cur = cur.substring(0, mm.start) + s"foreach $alias " +
          cur.substring(j)
        guard += 1
        m = re.findFirstMatchIn(cur)
      }
      pre.toString + cur
    }

  /** Split a script into top-level statements (quote/backtick/brace
    * aware; `--` line comments stripped) WITHOUT expanding anything —
    * the pigunit override surface rewrites statement-wise on raw text
    * (PigServer.registerScript + aliasOverrides). */
  def splitStatements(script: String): Seq[String] = {
    val noComments = stripBlockComments(
      script.linesIterator.map(stripLineComment).mkString("\n"))
    var rest = noComments
    val out = mutable.ArrayBuffer.empty[String]
    while (rest.trim.nonEmpty) {
      val e = statementEnd(rest)
      val stmt = rest.take(e).trim
      if (stmt.nonEmpty) out += stmt
      rest = rest.drop(e + 1)
    }
    out.toSeq
  }
  /** Remove `/* … */` block comments outside string literals (the
    * reference grammar allows them anywhere, e.g. license headers in
    * its own pigunit example scripts). */
  private def stripBlockComments(s: String): String = {
    val out = new StringBuilder
    var i = 0; var inQ = false; var depth = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (depth > 0) {
        if (c == '*' && i + 1 < s.length && s.charAt(i + 1) == '/') {
          depth -= 1; i += 1
        }
      } else {
        if (c == '\'') inQ = !inQ
        if (!inQ && c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
          depth += 1; i += 1
        } else out.append(c)
      }
      i += 1
    }
    out.toString
  }

  private def stripLineComment(l: String): String = {
    var i = 0; var inQ = false
    while (i < l.length) {
      val c = l.charAt(i)
      if (c == '\'') inQ = !inQ
      else if (!inQ && c == '-' && i + 1 < l.length && l.charAt(i + 1) == '-')
        return l.take(i)
      i += 1
    }
    l
  }

  /** end index (exclusive of ';') of a simple statement, brace-aware;
    * backtick commands may contain ';'/braces/quotes and are opaque */
  private def statementEnd(s: String): Int = {
    var depth = 0; var i = 0; var inStr = false; var inBt = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inBt) { if (c == '`') inBt = false }
      else if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inBt = true
        case '{' => depth += 1
        case '}' => depth -= 1
        case ';' if depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    s.length
  }
  /** A macro DEFINE ends at its matching close brace — the trailing ';'
    * is OPTIONAL in the reference's own scripts; non-macro DEFINEs end
    * at the first top-level ';'. */
  private def defineEnd(s: String): Int = {
    var depth = 0; var i = 0; var inStr = false; var sawBrace = false
    var inBt = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inBt) { if (c == '`') inBt = false }
      else if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '`' => inBt = true
        case '{' => depth += 1; sawBrace = true
        case '}' =>
          depth -= 1
          if (sawBrace && depth == 0) {
            var j = i + 1
            while (j < s.length && s.charAt(j).isWhitespace) j += 1
            return if (j < s.length && s.charAt(j) == ';') j else i + 1
          }
        case ';' if depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    s.length
  }

  private sealed trait Define
  private case class MacroDef(name: String, m: Macro) extends Define
  private case class CmdDef(name: String, cmd: String) extends Define
  private case class FuncDef(name: String, func: String,
                             ctorArgs: String) extends Define

  /** DEFINE m(p…) RETURNS r { body } | DEFINE alias 'cmd'
    * | DEFINE alias Func('ctor') */
  private def parseDefine(stmt: String): Define = {
    val m = """(?is)DEFINE\s+(\w+)\s*\(([^)]*)\)\s*RETURNS\s+(\w+)\s*\{(.*)\}\s*""".r
    val c = """(?is)DEFINE\s+(\w+)\s+'([^']*)'\s*""".r
    // EXECCOMMAND backtick form; trailing INPUT/OUTPUT/SHIP clauses
    // parse to a StreamIo.Spec that rides inside the inlined command
    // string (see StreamIo.encode); CACHE/STDERR are validated no-ops
    // (no distributed cache in the embedded engine). Custom serializers
    // other than PigStreaming('<sep>') fail loudly rather than silently
    // changing the stream wire format.
    val cb = """(?is)DEFINE\s+(\w+)\s+`([^`]*)`\s*(.*?)\s*""".r
    // ctor args: quoted literals may themselves hold parens/commas —
    // HiveUDF('round', '(null, 2)') — so match quote-aware, not [^)]*
    val f = """(?is)DEFINE\s+(\w+)\s+([\w.$]+)\s*(?:\(((?:'[^']*'|[^()'])*)\))?\s*""".r
    stmt match {
      case m(name, ps, ret, body) =>
        val params = ps.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        MacroDef(name, Macro(params, ret, body))
      case c(name, cmd) => CmdDef(name, cmd)
      case cb(name, cmd, clauses) =>
        CmdDef(name, StreamIo.encode(cmd, StreamIo.parseClauses(clauses)))
      case f(name, func, ctorArgs) =>
        // full dotted name passes through; the expansion site strips to
        // the terminal name (the builtin catalog is flat) and uses the
        // package to tell user-jar classes from the reference's own
        FuncDef(name, func, Option(ctorArgs).getOrElse(""))
      case other => throw new IllegalArgumentException(
        s"unsupported DEFINE form: ${other.take(60)}")
    }
  }

  private def expandStatement(stmt: String, macros: Map[String, Macro],
                              cmds: Map[String, String],
                              funcs: Map[String, (String, String, Boolean)],
                              vars: Map[String, String],
                              depth: Int = 0): String = {
    require(depth < 50, "macro expansion exceeds depth 50 — recursive " +
      "macro? (the reference rejects recursion too)")
    val call = """(?s)\s*(\w+)\s*=\s*(\w+)\s*\(([^)]*)\)\s*""".r
    // statement-form call of a `RETURNS void` macro: `m(args);` with no
    // assignment (QueryParser: macro inline without alias)
    val voidCall = """(?s)\s*(\w+)\s*\(([^)]*)\)\s*""".r
    val substituted = substitute(stmt, vars)
    substituted match {
      case voidCall(name, argStr) if macros.contains(name) &&
          macros(name).returns.equalsIgnoreCase("void") =>
        expandStatement(s"__void_$depth = $name($argStr)", macros, cmds,
          funcs, vars, depth)
      case call(ret, name, argStr) if macros.contains(name) =>
        val mac = macros(name)
        // quoted macro arguments substitute WITHOUT their quotes
        // (reference macro expansion: test('name') → $param = name)
        val args = argStr.split(",").map(_.trim).filter(_.nonEmpty)
          .map { a =>
            if (a.length >= 2 && a.head == '\'' && a.last == '\'')
              a.substring(1, a.length - 1)
            else a
          }.toSeq
        require(args.length == mac.params.length,
          s"macro $name expects ${mac.params.length} args, got ${args.length}")
        val bindings = mac.params.zip(args).toMap + (mac.returns -> ret)
        // expand the macro body (may itself contain multiple statements)
        val body = substitute(mac.body, bindings).trim.stripSuffix(";")
        // the spliced body may itself contain macro calls (macro
        // composition) — re-expand each statement recursively
        val parts = scala.collection.mutable.ArrayBuffer.empty[String]
        var restB = body
        while (restB.nonEmpty) {
          val e = statementEnd(restB)
          val st = restB.take(e).trim
          if (st.nonEmpty)
            parts += expandStatement(st, macros, cmds, funcs, vars,
              depth + 1)
          restB = restB.drop(math.min(e + 1, restB.length))
        }
        parts.mkString(";\n")
      case _ => mapMaskingQuotes(substituted) { masked =>
        // STREAM … THROUGH cmdAlias → inline the command as a BACKTICK
        // literal — commands routinely contain single quotes
        // (`perl -ne 'print $_;'`), which a '…' wrapping would truncate
        val withCmds = cmds.foldLeft(masked) { case (s, (name, cmd)) =>
          s.replaceAll(s"(?i)THROUGH\\s+$name\\b",
            java.util.regex.Matcher.quoteReplacement(s"THROUGH `$cmd`"))
        }
        // function aliases: alias(args) → Func(args, ctorArgs). The
        // pattern allows ONE paren level inside the args; running the
        // whole alias fold to a fixpoint then covers arbitrary nesting
        // (each round peels one level: I(U(x)) expands U on one round,
        // I on another). Self-named aliases (name == func) expand in a
        // single round so appended ctor args can't stack. String
        // literal args are masked here, so they can't split the match.
        var cur = withCmds; var prev = ""; var round = 0
        while (cur != prev && round < 8) {
          prev = cur
          cur = funcs.foldLeft(cur) { case (s, (name, (func, ctor, mk))) =>
            if (round > 0 && name.equalsIgnoreCase(func)) s
            else {
              // InvokeFor* and user-jar EvalFuncs get an explicit
              // boundary marker between call args and ctor literals (see
              // CtorMark) — the engine's other DEFINE'd functions keep
              // the plain appended-args contract
              val marked =
                if ((mk || func.toUpperCase.startsWith("INVOKEFOR") ||
                     Set("BUILDBLOOM", "BLOOM", "HIVEUDF",
                         "HIVEUDAF", "HIVEUDTF")(func.toUpperCase)) &&
                    ctor.trim.nonEmpty)
                  s"'$CtorMark', ${ctor.trim}"
                else ctor.trim
              s"""\\b$name\\s*\\(((?:[^()]|\\([^()]*\\))*)\\)""".r
                .replaceAllIn(s, mm => {
                  // NOT String.trim: the masked-literal placeholders are
                  // framed by control chars < U+0020 and trim would strip
                  // them off the ends
                  val callArgs = mm.group(1)
                    .replaceAll("^[ \\t\\r\\n]+|[ \\t\\r\\n]+$", "")
                  val all = Seq(callArgs, marked).filter(_.nonEmpty)
                    .mkString(", ")
                  java.util.regex.Matcher.quoteReplacement(s"$func($all)")
                })
            }
          }
          round += 1
        }
        cur
      }
    }
  }

  /** Apply `f` to `s` with every single-quoted string literal replaced by an
    * opaque placeholder (restored afterwards), so alias/command expansion
    * can't rewrite text inside a quoted literal (a LOAD path or regex that
    * happens to contain `alias(...)`) — while an alias CALL whose arguments
    * include a string literal (`ex(line, '\\d+')`) still matches as one
    * contiguous region. Escaped quotes (\') inside a literal don't
    * terminate it. */
  private def mapMaskingQuotes(s: String)(f: String => String): String = {
    val literals = mutable.ArrayBuffer[String]()
    val maskedSb = new StringBuilder
    var i = 0; var start = 0; var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr && c == '\\' && i + 1 < s.length) i += 1 // skip escaped char
      else if (!inStr && c == '\'') {
        maskedSb.append(s.substring(start, i)); start = i; inStr = true
      } else if (inStr && c == '\'') {
        literals += s.substring(start, i + 1)
        maskedSb.append('\u0001').append(literals.length - 1).append('\u0002')
        start = i + 1; inStr = false
      }
      i += 1
    }
    if (inStr) maskedSb.append(s.substring(start)) // unterminated: verbatim
    else maskedSb.append(s.substring(start))
    val mapped = f(maskedSb.toString)
    "\u0001(\\d+)\u0002".r.replaceAllIn(mapped, mm =>
      java.util.regex.Matcher.quoteReplacement(literals(mm.group(1).toInt)))
  }

  /** Replace $name for each binding (leaves positional $0… alone). */
  private def substitute(s: String, vars: Map[String, String]): String =
    vars.foldLeft(s) { case (acc, (k, v)) =>
      acc.replaceAll("\\$" + java.util.regex.Pattern.quote(k) + "\\b",
        java.util.regex.Matcher.quoteReplacement(v))
    }
}
