package graft.indexer

import graft.model._
import scala.collection.mutable
import scala.util.matching.Regex

/** Shallow structural indexer for Python source — the Scala restatement of
  * the reference's syntax-only default mode (reference
  * graph_database_index/shallow_indexer.py; kinds/edges mapping
  * myClient.py:107-322). Pure function: one file in, event stream out —
  * the Spark side runs it inside a flatMap (a UDTF morally), see
  * [[IndexPipeline]].
  *
  * Fidelity target is the reference's shallow mode (its own default): kinds
  * come from syntactic context, references resolve only against names
  * visible syntactically (same file, `self.`, imports); everything else is
  * unsolved and — like the reference (myClient.py:356-381, Neo4j path
  * commented out) — dropped from the graph.
  *
  * Covered per SURVEY.md §2.C:
  *  - C4 block structure: indentation scopes, headers, comments, strings
  *  - C5 classdef → CLASS symbol + signature/scope locations
  *  - C6 funcdef → FUNCTION, re-kinded METHOD inside a class
  *    (myClient.py:181-183); `self` field promotion
  *  - C7 inheritance capture from the base list (INHERITS)
  *  - C8 imports (tracked for resolution; not materialized as edges,
  *    matching myClient.py:283-289)
  *  - C9 reference classification: call vs use by next-token `(`
  *    (index_utils.py:147-152), qualifier detection, `self.x` member refs
  *  - C10 name hierarchy: dotted module path, `__init__` collapse,
  *    `Class.__init__.self.x` → `Class.x` (indexer_visitor.py:693-717)
  *  - C12 multiline strings → ATOMIC_RANGE locations
  *  - C13/C14 event mapping incl. `<CODE>{"S":…,"E":…,"F":…}</CODE>`
  *    pointers (myClient.py:46-48) hydratable by [[graft.hydrate.Hydrate]]
  */
object PyIndexer {

  /** Cross-file import fact (module, binding, absolute target, kind ∈
    * {name, module, wildcard}) — input to the D1/D2 enrichment joins. */
  final case class ImportFact(module: String, alias: String, target: String,
      kind: String)

  final case class FileEvents(
      symbols: Seq[SymbolEvent],
      edges: Seq[EdgeEvent],
      locations: Seq[LocationRow],
      imports: Seq[ImportFact] = Seq.empty)

  // no trailing-':' requirement: a multi-line header (`class Foo(\n
  // Base,\n):`) keeps its ':' on a continuation line, same as defHeader
  private val classHeader: Regex =
    """^(\s*)class\s+([A-Za-z_]\w*)(.*)$""".r
  private val defHeader: Regex =
    """^(\s*)(?:async\s+)?def\s+([A-Za-z_]\w*)\s*\(.*$""".r
  private val importStmt: Regex =
    """^\s*import\s+(.+)$""".r
  private val fromImport: Regex =
    """^\s*from\s+(\.*[\w.]*)\s+import\s+(.+)$""".r
  private val assignStmt: Regex =
    """^(\s*)([A-Za-z_]\w*)\s*(?::[^=]+)?=(?!=).*$""".r
  private val forStmt: Regex =
    """^(\s*)for\s+([A-Za-z_]\w*)\s+in\b.*$""".r
  private val selfAssign: Regex =
    """self\.([A-Za-z_]\w*)\s*(?::[^=]+)?=(?!=)""".r
  private val callSite: Regex =
    """(?<![\w.])([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""".r
  /** `xs[0].m(` / `d["k"].m(…)` — a member call through ONE subscript
    * on a bare name (C3 slice 31: jedi resolves the subscript to the
    * container's element / mapping's value type and the member through
    * it; [[callSite]] can't carry the bracket trailer). */
  private val subscriptCallSite: Regex =
    ("""(?<![\w.])([A-Za-z_]\w*)\s*\[[^\[\]]*\]\s*\.\s*""" +
      """([A-Za-z_]\w*(?:\s*\.\s*[A-Za-z_]\w*)*)\s*\(""").r
  private val superCall: Regex =
    """super\(\)\s*\.\s*([A-Za-z_]\w*)\s*\(""".r
  private val nameRef: Regex =
    """(?<![\w.])([A-Za-z_]\w*)(?![\w(])""".r
  private val selfRef: Regex =
    """self\.([A-Za-z_]\w*)(?!\w)""".r

  private val keywords = Set(
    "and", "as", "assert", "async", "await", "break", "class", "continue",
    "def", "del", "elif", "else", "except", "finally", "for", "from",
    "global", "if", "import", "in", "is", "lambda", "nonlocal", "not",
    "or", "pass", "raise", "return", "self", "try", "while", "with",
    "yield", "True", "False", "None", "print", "len", "range", "super",
    "isinstance", "str", "int", "float", "list", "dict", "set", "tuple")

  /** C3 slice 45 — TYPESHED-LITE: return types of high-frequency stdlib
    * callables. jedi resolves stdlib symbols through its bundled
    * typeshed stubs (reference indexer_visitor.py:561-577 maps stub
    * file paths back to `re`/`os.path`-style module hierarchies); this
    * table pins the most-called subset so a stdlib-constructed local
    * types — and its member calls resolve — like any locally-defined
    * class. Keys are ABSOLUTE dotted names (after import resolution);
    * values are stdlib class names. Lowercase stdlib classes
    * (`datetime.datetime`) ride here because [[PyIndexer]]'s
    * upper-initial `classishType` heuristic skips them. */
  private val typeshedReturns: Map[String, String] = Map(
    "re.compile" -> "re.Pattern",
    "re.match" -> "re.Match", "re.search" -> "re.Match",
    "re.fullmatch" -> "re.Match",
    "datetime.datetime" -> "datetime.datetime",
    "datetime.datetime.now" -> "datetime.datetime",
    "datetime.datetime.utcnow" -> "datetime.datetime",
    "datetime.datetime.fromisoformat" -> "datetime.datetime",
    "datetime.datetime.fromtimestamp" -> "datetime.datetime",
    "datetime.date" -> "datetime.date",
    "datetime.date.today" -> "datetime.date",
    "datetime.timedelta" -> "datetime.timedelta",
    "uuid.uuid1" -> "uuid.UUID", "uuid.uuid4" -> "uuid.UUID",
    "uuid.uuid5" -> "uuid.UUID",
    "pathlib.Path.cwd" -> "pathlib.Path",
    "pathlib.Path.home" -> "pathlib.Path",
    "urllib.parse.urlparse" -> "urllib.parse.ParseResult",
    "urllib.parse.urlsplit" -> "urllib.parse.SplitResult",
    "tempfile.TemporaryDirectory" -> "tempfile.TemporaryDirectory",
    "logging.getLogger" -> "logging.Logger",
    "subprocess.run" -> "subprocess.CompletedProcess",
    "subprocess.Popen" -> "subprocess.Popen",
    "sqlite3.connect" -> "sqlite3.Connection",
    // r16 tier (verdict task #5), grounded by a corpus scan — the
    // reference repo alone constructs Path() 9 times: the pathlib
    // constructor, the collections containers, strptime (the most
    // common datetime classmethod the r15 table missed), in-memory io,
    // and the threading/decimal constructors
    "pathlib.Path" -> "pathlib.Path",
    "pathlib.PurePath" -> "pathlib.PurePath",
    "datetime.datetime.strptime" -> "datetime.datetime",
    "datetime.datetime.combine" -> "datetime.datetime",
    "collections.Counter" -> "collections.Counter",
    "collections.defaultdict" -> "collections.defaultdict",
    "collections.OrderedDict" -> "collections.OrderedDict",
    "collections.deque" -> "collections.deque",
    "configparser.ConfigParser" -> "configparser.ConfigParser",
    "io.StringIO" -> "io.StringIO",
    "io.BytesIO" -> "io.BytesIO",
    "json.JSONDecoder" -> "json.JSONDecoder",
    "argparse.ArgumentParser" -> "argparse.ArgumentParser",
    "threading.Thread" -> "threading.Thread",
    "threading.Lock" -> "threading.Lock",
    "threading.Event" -> "threading.Event",
    "decimal.Decimal" -> "decimal.Decimal",
    "fractions.Fraction" -> "fractions.Fraction",
    "random.Random" -> "random.Random",
    "socket.socket" -> "socket.socket")

  /** Method returns on the slice-45 stdlib classes — what typeshed's
    * class stubs declare for the members a member-call chain folds
    * through ([[PyIndexer]]'s `methodReturn` consults this arm when the
    * MRO's defining class is not module-local). */
  private val typeshedMethodReturns: Map[String, Map[String, String]] = Map(
    "re.Pattern" -> Map("match" -> "re.Match", "search" -> "re.Match",
      "fullmatch" -> "re.Match"),
    "pathlib.Path" -> Map("resolve" -> "pathlib.Path",
      "absolute" -> "pathlib.Path", "expanduser" -> "pathlib.Path",
      "with_suffix" -> "pathlib.Path", "with_name" -> "pathlib.Path",
      "with_stem" -> "pathlib.Path", "relative_to" -> "pathlib.Path",
      "joinpath" -> "pathlib.Path", "rename" -> "pathlib.Path",
      "readlink" -> "pathlib.Path"),
    "datetime.datetime" -> Map("replace" -> "datetime.datetime",
      "astimezone" -> "datetime.datetime", "date" -> "datetime.date",
      "strptime" -> "datetime.datetime"),
    "datetime.date" -> Map("replace" -> "datetime.date"),
    // r16 tier: the copy() family preserves the container class;
    // executemany mirrors execute's cursor-chaining
    "collections.Counter" -> Map("copy" -> "collections.Counter"),
    "collections.defaultdict" ->
      Map("copy" -> "collections.defaultdict"),
    "collections.OrderedDict" ->
      Map("copy" -> "collections.OrderedDict"),
    "collections.deque" -> Map("copy" -> "collections.deque"),
    "argparse.ArgumentParser" -> Map(
      "parse_args" -> "argparse.Namespace"),
    "sqlite3.Connection" -> Map("cursor" -> "sqlite3.Cursor",
      "execute" -> "sqlite3.Cursor",
      "executemany" -> "sqlite3.Cursor"),
    "sqlite3.Cursor" -> Map("execute" -> "sqlite3.Cursor",
      "executemany" -> "sqlite3.Cursor"),
    "logging.Logger" -> Map("getChild" -> "logging.Logger"))

  /** Builtins with class-valued returns (`open` has no import to
    * resolve through — it binds only when nothing local shadows it,
    * checked at the use site). */
  private val typeshedBuiltins: Map[String, String] = Map(
    "open" -> "io.TextIOWrapper")

  /** r17 tier 3 — ATTRIBUTE (non-call) returns on stdlib classes:
    * typeshed declares these as properties/attributes, so a chain like
    * `cfg_path.parent.joinpath('x')` folds through them exactly as
    * jedi's descriptor resolution does. Keyed class fqn → attr →
    * class fqn; consulted by the MRO field lookups for non-local
    * receivers. */
  private val typeshedAttrReturns: Map[String, Map[String, String]] = Map(
    "pathlib.Path" -> Map("parent" -> "pathlib.Path"),
    "pathlib.PurePath" -> Map("parent" -> "pathlib.PurePath"),
    "re.Match" -> Map("re" -> "re.Pattern"),
    "sqlite3.Cursor" -> Map("connection" -> "sqlite3.Connection"),
    "logging.Logger" -> Map("parent" -> "logging.Logger"))

  /** r17 tier 3 — ELEMENT types of stdlib iterator-returning callables
    * (typeshed's `Iterator[T]` stubs): `for p in base.glob('*.py')`
    * types p as pathlib.Path. Keyed by the RESOLVED callee fqn the
    * element-target lookup produces (`<class>.<method>` for member
    * calls, the dotted module function otherwise). */
  private val typeshedElemReturns: Map[String, String] = Map(
    "pathlib.Path.iterdir" -> "pathlib.Path",
    "pathlib.Path.glob" -> "pathlib.Path",
    "pathlib.Path.rglob" -> "pathlib.Path",
    "re.Pattern.finditer" -> "re.Match",
    "re.finditer" -> "re.Match")

  /** C10 — dotted module name from a repo-relative path: strip `.py`,
    * `/`→`.`, collapse `__init__` to the package
    * (reference ast_utils.py:64-95, indexer_visitor.py:551-577). */
  def moduleName(relPath: String): String = {
    val noExt = relPath.stripSuffix(".py").stripSuffix("/__init__")
    noExt.replace('/', '.')
  }

  /** Strip comments and blank out string contents, preserving line length
    * where cheap; returns (processed lines, multiline-string ranges). */
  private[indexer] def preprocess(lines: Array[String]): (Array[String], Seq[(Int, Int)]) = {
    val out = new Array[String](lines.length)
    val atomics = mutable.ArrayBuffer.empty[(Int, Int)]
    var inTriple = false
    var tripleQuote = "\"\"\""
    var tripleStart = 0
    // {} depth OUTSIDE strings — carried ACROSS lines (like inTriple):
    // in a multi-line dict literal the value string after a `:` sits at
    // line-local depth 0 but real depth ≥ 1, and must NOT be read as a
    // PEP 484 forward-reference annotation (r13, advisor finding — a
    // registry dict mapping names to "ClassName" / "mod.func(...)"
    // strings would otherwise fabricate phantom refs and Call edges).
    var curly = 0
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val sb = new StringBuilder
      var j = 0
      var inStr = false
      var strQuote = ' '
      // C3 slice 33: f-string interpolations are CODE, not text — jedi
      // resolves names and calls inside `f"{…}"` (parso parses fstring
      // expression nodes), so the blanking pass PRESERVES the chars of
      // each top-level `{expr}` group (rewriting the braces to parens —
      // a parenthesized expression downstream regexes already accept)
      // while still blanking the literal text, `{{`/`}}` escapes, and
      // everything after a format-spec `:` or `!r`-style conversion.
      var fStr = false       // current single-line string is f-prefixed
      var braceDepth = 0     // inside {expr} of an f-string
      var inSpec = false     // past the expression's format-spec colon
      var innerBr = 0        // [ ] nesting inside the expression
      // r12 slice 58: a string in ANNOTATION POSITION (immediately after
      // `:` or `->` at zero curly depth — dict-literal colons live
      // inside `{}` and stay blanked) is a PEP 484 forward reference:
      // its CONTENT is a type expression, preserved like f-string code
      var annoStr = false
      def isFPrefix(at: Int): Boolean = {
        var k = at - 1
        var seen = List.empty[Char]
        while (k >= 0 && seen.length < 3 && line.charAt(k).isLetter) {
          seen = line.charAt(k) :: seen; k -= 1
        }
        val okBoundary = k < 0 || { val p = line.charAt(k)
          !p.isLetterOrDigit && p != '_' }
        okBoundary && seen.nonEmpty &&
          seen.forall(c => "rRbBuUfF".contains(c)) &&
          seen.exists(c => c == 'f' || c == 'F')
      }
      if (inTriple) {
        val end = line.indexOf(tripleQuote)
        if (end >= 0) {
          inTriple = false
          atomics += ((tripleStart, i + 1))
          j = end + 3
          sb.append(" " * j)
        } else { j = line.length }
      }
      while (j < line.length) {
        val c = line.charAt(j)
        if (inStr) {
          if (c == strQuote && !(fStr && braceDepth > 0)) {
            sb.append(if (annoStr) ' ' else c)
            inStr = false; fStr = false; annoStr = false
          } else if (annoStr) {
            // forward-reference content is a type expression: preserve
            sb.append(c)
          } else if (fStr && braceDepth == 0) {
            if (c == '{') {
              if (j + 1 < line.length && line.charAt(j + 1) == '{') {
                sb.append("  "); j += 1         // literal {{ stays text
              } else { braceDepth = 1; innerBr = 0; inSpec = false
                sb.append('(') }
            } else if (c == '\\') { sb.append("  "); j += 1 }
            else sb.append(' ')
          } else if (fStr) {                     // inside {expr}
            if (c == '{') { braceDepth += 1
              sb.append(if (inSpec) ' ' else '{') }
            else if (c == '}') {
              braceDepth -= 1
              if (braceDepth == 0) { inSpec = false; sb.append(')') }
              else sb.append(if (inSpec) ' ' else '}')
            } else if (inSpec) sb.append(' ')
            else if (c == '[' || c == '(') { innerBr += 1; sb.append(c) }
            else if (c == ']' || c == ')') {
              innerBr = math.max(0, innerBr - 1); sb.append(c)
            } else if (c == ':' && braceDepth == 1 && innerBr == 0) {
              inSpec = true; sb.append(' ')
            } else if (c == '!' && braceDepth == 1 && innerBr == 0 &&
                j + 1 < line.length && "rsa".contains(line.charAt(j + 1)) &&
                (j + 2 >= line.length || line.charAt(j + 2) == '}' ||
                  line.charAt(j + 2) == ':')) {
              inSpec = true; sb.append(' ')
            } else sb.append(c)
          } else if (c == '\\') { sb.append("  "); j += 1 }
          else sb.append(' ')
        } else if (c == '"' || c == '\'') {
          val q3 = line.substring(j).startsWith(c.toString * 3)
          if (q3) {
            val rest = line.substring(j + 3)
            val end = rest.indexOf(c.toString * 3)
            if (end >= 0) { sb.append(" " * (end + 6)); j += end + 5 }
            else { inTriple = true; tripleQuote = c.toString * 3; tripleStart = i + 1
              j = line.length }
          } else { inStr = true; strQuote = c; fStr = isFPrefix(j)
            braceDepth = 0; inSpec = false; innerBr = 0
            val tail = sb.toString.reverse.dropWhile(_ == ' ').reverse
            // r14 slice 71: a string just inside a typing generic's
            // bracket that itself follows `:`/`->` (`-> Optional["C"]`)
            // is ALSO a forward reference; a data subscript (`d["k"]`)
            // never matches — no `:`/`->` abuts the opening name
            annoStr = !fStr && curly == 0 &&
              (tail.endsWith(":") || tail.endsWith("->") ||
                annoGenericTail.findFirstIn(tail).isDefined)
            // the quotes of a forward-ref annotation blank along with
            // nothing else: `c: "Conn"` reads as `c:  Conn ` downstream
            sb.append(if (annoStr) ' ' else c) }
        } else if (c == '#') { j = line.length }
        else {
          if (c == '{') curly += 1
          else if (c == '}') curly = math.max(0, curly - 1)
          sb.append(c)
        }
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    (out, atomics.toSeq)
  }

  private def indentOf(s: String): Int = s.takeWhile(_ == ' ').length

  /** Text inside the first balanced paren group of `s`, or "" — the base
    * list of a (possibly multi-line, joined) class header. The parens
    * must belong to the HEADER (open before the first ':'), not to an
    * inline body (`class Config: x = f(Y)` has no base list). */
  private def parenSpan(s: String): String = {
    val o = s.indexOf('(')
    val colon = s.indexOf(':')
    if (o < 0 || (colon >= 0 && colon < o)) return ""
    var depth = 0
    var j = o
    while (j < s.length) {
      val ch = s.charAt(j)
      if (ch == '(') depth += 1
      else if (ch == ')') { depth -= 1; if (depth == 0) return s.substring(o + 1, j) }
      j += 1
    }
    s.substring(o + 1) // unclosed paren (truncated source): best-effort
  }

  /** Depth-0 comma split of a parameter list — commas inside nested
    * brackets (`dict[str, int]` annotations, tuple defaults) stay within
    * their piece. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var depth = 0
    val sb = new StringBuilder
    s.foreach {
      case c @ ('(' | '[' | '{') => depth += 1; sb.append(c)
      case c @ (')' | ']' | '}') => depth -= 1; sb.append(c)
      case ',' if depth == 0 => out += sb.toString(); sb.clear()
      case c => sb.append(c)
    }
    if (sb.nonEmpty) out += sb.toString()
    out.toSeq
  }

  /** Leading name of one parameter piece (`*args`/`**kw` stripped to the
    * bare name; annotation/default tails ignored). */
  private val paramName: Regex = """^\*{0,2}([A-Za-z_]\w*)""".r

  /** 0-based column of the first bare-word occurrence of `w` in `s` at or
    * after `from` — not preceded by a `.` or word char (attribute members
    * never count, per shallow_indexer.py:488-489), not part of a longer
    * word. -1 when absent. */
  private def isWordCh(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  /** Matching `)` for the `(` at `open` (paren depth only — runs over
    * preprocess-blanked lines, so quotes are already spaces); -1 when
    * unterminated. */
  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  private def wordPos(s: String, w: String, from: Int = 0): Int = {
    val re = ("""(?<![\w.])""" + java.util.regex.Pattern.quote(w) + """(?!\w)""").r
    re.findAllMatchIn(s).find(_.start >= from).map(_.start).getOrElse(-1)
  }

  /** End line (1-based, inclusive) of the scope whose header is at
    * `header` (0-based) with indent `ind`: last non-blank line before the
    * first NON-CONTINUATION line at indent <= ind (a multi-line header's
    * closing `):` at header indent must not end the scope). */
  private def scopeEnd(lines: Array[String], cont: Array[Boolean],
      header: Int, ind: Int): Int = {
    var last = header
    var i = header + 1
    while (i < lines.length &&
        (lines(i).trim.isEmpty || cont(i) || indentOf(lines(i)) > ind)) {
      if (lines(i).trim.nonEmpty) last = i
      i += 1
    }
    last + 1
  }

  /** Physical-line continuation map: line i is a continuation when an
    * earlier bracket is still open at its start (bracket counts taken from
    * the PREPROCESSED lines, so brackets inside strings/comments don't
    * count) or the previous line ended with a backslash. Continuation
    * lines carry no structural meaning: they never open/close an
    * indentation scope and never match a header — that is exactly how
    * multi-line `def f(\n  a,\n):` headers stay inside their scope. */
  private def continuations(lines: Array[String]): Array[Boolean] = {
    val cont = new Array[Boolean](lines.length)
    var bal = 0
    var backslash = false
    var i = 0
    while (i < lines.length) {
      cont(i) = bal > 0 || backslash
      val l = lines(i)
      bal += l.count(c => "([{".contains(c)) - l.count(c => ")]}".contains(c))
      if (bal < 0) bal = 0
      backslash = l.endsWith("\\")
      i += 1
    }
    cont
  }

  private def codePtr(s: Int, e: Int, f: String): String =
    s"""<CODE>{"S":$s,"E":$e,"F":"$f"}</CODE>"""

  private final case class Scope(kind: String, fullName: String, indent: Int,
      locals: mutable.Map[String, String] = mutable.Map.empty,
      // slice 9: container-typed names → their ELEMENT type (xs:
      // list[Helper] binds "xs" -> Helper here, and iteration/subscript
      // targets over xs land in `locals`)
      elemLocals: mutable.Map[String, String] = mutable.Map.empty,
      // slice 29: method-REFERENCE aliases (`f = db.query`) — name →
      // resolved method full name; a later bare `f(...)` emits the
      // Call edge to it (jedi's bound-method reference)
      methodRefs: mutable.Map[String, String] = mutable.Map.empty,
      // slice 32: CLASS-object aliases (`mk = Helper`) — name → resolved
      // class full name; `mk()` then constructs Helper (call edge to the
      // class, constructor-typed binding), jedi's class-reference
      // resolution
      classAliases: mutable.Map[String, String] = mutable.Map.empty,
      // slice 28: mapping-typed names → their VALUE type (d: dict[str,
      // Conn] binds "d" -> Conn here; subscripting, `.values()`
      // iteration and `.get()` reads surface it — but NOT plain `for k
      // in d:`, which iterates KEYS, the reason this is a separate map)
      valueLocals: mutable.Map[String, String] = mutable.Map.empty,
      // the reference's ContextInfo.localSymbolNames (shallow_indexer.py:
      // 130, seeded with params at :363-374): names whose bare usages
      // record LOCAL location rows
      localNames: mutable.Set[String] = mutable.Set.empty,
      // slice 46: names bound to an EMPTY container literal (`xs = []`,
      // `d = {}`, `list()`/`set()`/`dict()`) — a later `.append(Ctor())`
      // / `.add(...)` / `d[k] = Ctor()` infers the content type, jedi's
      // container-content tracking for the build-up idiom
      emptyContainers: mutable.Set[String] = mutable.Set.empty,
      // r14 slice 75: names declared `global` in this callable — a
      // constructor assignment to one ALSO types the module singleton
      // (the in-function initializer idiom `global db; db = Database()`)
      globalDecls: mutable.Set[String] = mutable.Set.empty,
      // r17 slice 94: BRANCH-SCOPED isinstance narrows — (restore
      // threshold, name, previous binding); the main walk restores an
      // entry when it reaches a line at indent ≤ the threshold, so an
      // if/elif/while guard's narrow dies with its branch (jedi's
      // scoping; the whole-scope binding fabricated member edges after
      // the block). An `assert` narrow holds for the rest of its suite
      // (threshold = its indent − 1).
      narrowRestores: mutable.Stack[(Int, String, Option[String])] =
        mutable.Stack.empty)

  /** Bare-name occurrence for the LOCAL usage scan — unlike [[nameRef]] a
    * following `(` or `.` does NOT disqualify: the reference records local
    * usage for calls of a local and for the base of an attribute chain
    * (`self` in `self.x`); only names AFTER a dot are skipped
    * (shallow_indexer.py:486-494). */
  private val localUse: Regex = """(?<![\w.])([A-Za-z_]\w*)""".r

  /** `x = Callee(...)` — the head of a potential instance binding. */
  private val instanceAssign: Regex =
    """^\s*([A-Za-z_]\w*)\s*(?::[^=]+)?=\s*(?:await\s+)?([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""".r

  /** `(x := callee(...))` — PEP 572 namedexpr (r14 slice 72): the
    * target binds in the enclosing function scope like `x = callee()`.
    * The leading `(` is the grammar's own requirement in if/while/
    * comprehension positions, so a plain `:`-annotated assignment
    * never matches. */
  private val walrusAssign: Regex =
    """\(\s*([A-Za-z_]\w*)\s*:=\s*(?:await\s+)?([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""".r

  /** `self.f = Callee(...)` — a typed-field binding. */
  private val selfInstanceAssign: Regex =
    """self\.([A-Za-z_]\w*)\s*(?::[^=]+)?=\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""".r

  /** `self.f = x or Ctor(...)` — the OR-DEFAULT field binding (r14
    * slice 78, the `__init__(self, c=None): self.c = c or Conn()`
    * idiom): jedi types the union of both arms; the constructed
    * default is the optimistic take (slice 61's `.get`-default
    * convention). */
  private val selfOrDefaultAssign: Regex =
    ("""self\.([A-Za-z_]\w*)\s*=\s*[A-Za-z_]\w*\s+or\s+""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""").r

  /** `self.f = name` — a BARE-name field binding (the constructor-
    * injection pattern); the name's local/param type flows to the field. */
  private val selfNameAssign: Regex =
    """self\.([A-Za-z_]\w*)\s*(?::[^=]+)?=\s*([A-Za-z_]\w*)\s*$""".r

  /** `self.f: T = …` — an ANNOTATED field binding: the declared type is
    * authoritative regardless of the RHS (jedi honors annassign types),
    * so it applies LAST and overwrites any RHS-derived binding. */
  private val selfAnnoAssign: Regex =
    """self\.([A-Za-z_]\w*)\s*:\s*([^=]+?)\s*=(?!=)""".r

  /** `with Callee(...) as x:` — context-manager binding; the standard
    * acquisition idiom for DB handles/sessions, so binding x to the
    * constructed class resolves `x.method()` inside the block (the
    * `__enter__`-returns-self convention jedi assumes for plain
    * constructor context managers). [[withManager]] matches EACH manager
    * clause separately (`with A() as x, B() as y:` binds both); its
    * `[^()]*` arg span keeps one clause's parens from swallowing the
    * next, at the cost of skipping managers with nested call args —
    * a silent miss, never a wrong binding. */
  // r14 slice 81: `async with` binds its as-targets exactly like `with`
  private val withStmt: Regex =
    """^\s*(?:async\s+)?with\s+.*:\s*$""".r
  private val withManager: Regex =
    """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\([^()]*\)\s*as\s+([A-Za-z_]\w*)""".r

  /** `(x := Ctor(...))` — a walrus binding (C3 slice 15): the named
    * expression types its target exactly like an assignment would (jedi
    * treats `:=` as a definition); flow-insensitively safe — the binding
    * survives the enclosing if/while, which is also Python's own scoping
    * for walrus targets (they leak into the surrounding scope). */
  private val walrusBind: Regex =
    """\(\s*([A-Za-z_]\w*)\s*:=\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""".r

  /** `c = x.attr[.attr…]` — a pure attribute READ (no trailing call):
    * when every step of the chain is a typed field, `c` binds the final
    * field's type (jedi's attribute-propagation, the read analog of the
    * constructor slice). */
  private val attrReadAssign: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*((?:[A-Za-z_]\w*\.)+[A-Za-z_]\w*)\s*$""".r

  /** `name: Type` inside a def header's parameter list — PEP 484
    * annotations are pure syntax, so binding them is still shallow
    * indexing. `(?!\s*[\[])` skips generics (`Optional[X]`, `dict[...]`)
    * whose outer name is not the instance type. */
  private val paramAnno: Regex =
    // `(?!\w|\s*\[)`: the \w alternative stops backtracking from matching
    // a generic's name minus its last char (`Callbacks[int]` must not
    // match as `Callback`)
    """([A-Za-z_]\w*)\s*:\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)(?!\w|\s*\[)""".r

  /** Bare class-body annotation `h: Helper` (dataclass style, no `=`) —
    * an annassign definition in parso, so the reference records a FIELD
    * for it; the type also feeds `self.h.method()` resolution. */
  private val classAnnoBare: Regex =
    """^(\s*)([A-Za-z_]\w*)\s*:\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*$""".r

  /** `-> Type` return annotation in a (joined) def header; generics'
    * outer name is not the instance type, so `-> Optional[X]` is skipped
    * (same guard as [[paramAnno]]). */
  private val returnArrow: Regex =
    """->\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)(?!\w|\s*\[)""".r

  /** C3 slice 21 — nullable annotations: `x: Optional[Conn]` and the
    * PEP 604 unions `x: Conn | None` / `x: None | Conn` type the name
    * as the INNER class (jedi resolves members through the non-None
    * arm). Two spellings, one capture each. */
  private val optionalAnno: Regex =
    ("""([A-Za-z_]\w*)\s*:\s*(?:typing\.)?Optional\[\s*""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\]""").r
  private val unionNoneAnno: Regex =
    ("""([A-Za-z_]\w*)\s*:\s*(?:None\s*\|\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)""" +
      """|([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\|\s*None)(?!\w|\s*[\[|])""").r

  /** `xs: list[Helper]` (or List/Sequence/tuple/set/Iterable/… with an
    * optional `typing.` prefix) — a container annotation whose FIRST type
    * argument is the element type (slice 9: jedi's container-element
    * inference for the annotated cases, indexer_visitor.py:561-577's
    * typeshed-backed names). Nested generics (`list[dict[str, int]]`)
    * deliberately don't match — their element is not an instance type. */
  private val containerAnno: Regex =
    ("""([A-Za-z_]\w*)\s*:\s*(?:typing\s*\.\s*)?""" +
      """(?:list|List|Sequence|MutableSequence|tuple|Tuple|set|Set|""" +
      """frozenset|FrozenSet|Iterable|Iterator|Collection)""" +
      """\s*\[\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*[\],]""").r

  /** `for y in xs:` over a simple name — the iteration binding slice 9
    * feeds from [[containerAnno]] element types. */
  private val forIn: Regex =
    """^\s*for\s+([A-Za-z_]\w*)\s+in\s+([A-Za-z_]\w*)\s*:\s*$""".r

  /** r12 slice 57, the SELF-FIELD container family: build-up writes
    * (`self.f.append(Ctor())` / `.add(…)` — the class-field twin of
    * slice 46's local build-up, captured in the slice-23 pre-pass so a
    * consumer method EARLIER in the file still resolves), iteration
    * (`for c in self.f:`) and subscript reads/calls. */
  private val selfContainerWrite: Regex =
    ("""self\.([A-Za-z_]\w*)\s*\.\s*(?:append|add)\s*\(\s*""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""").r
  private val forInSelf: Regex =
    """^\s*for\s+([A-Za-z_]\w*)\s+in\s+self\.([A-Za-z_]\w*)\s*:\s*$""".r
  private val selfSubscriptRead: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*self\.([A-Za-z_]\w*)\s*\[[^\]]*\]\s*$""".r
  private val selfSubscriptCallSite: Regex =
    ("""self\.([A-Za-z_]\w*)\s*\[[^\[\]]*\]\s*\.\s*""" +
      """([A-Za-z_]\w*(?:\s*\.\s*[A-Za-z_]\w*)*)\s*\(""").r

  /** `d: dict[str, Conn]` (or Dict/Mapping/MutableMapping/OrderedDict/
    * defaultdict, optional `typing.` prefix) — a MAPPING annotation
    * whose SECOND type argument is the value type (C3 slice 28: jedi
    * surfaces it through subscripting, `.values()` iteration and
    * `.get()`; plain `for k in d:` iterates KEYS and must bind
    * nothing). A nested generic in the value position stays out, the
    * [[containerAnno]] rule. */
  private val mappingAnno: Regex =
    ("""([A-Za-z_]\w*)\s*:\s*(?:typing\s*\.\s*)?""" +
      """(?:dict|Dict|Mapping|MutableMapping|OrderedDict|defaultdict)""" +
      """\s*\[\s*[^\[\],]+,\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\]""").r

  /** `for v in d.values():` — the value-side iteration of slice 28. */
  private val forInValues: Regex =
    """^\s*for\s+([A-Za-z_]\w*)\s+in\s+([A-Za-z_]\w*)\s*\.\s*values\s*\(\s*\)\s*:\s*$""".r

  /** `v = d.get(...)` — jedi resolves members through Optional's
    * non-None arm (the slice-21 rule), so a mapping's `.get` read binds
    * the value type too. */
  private val mapGetRead: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*\.\s*get\s*\(""".r

  /** `y = xs[...]` — a subscript read; with xs container-typed, y binds
    * the element type. */
  private val subscriptRead: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*\[[^\]]*\]\s*$""".r

  /** `xs = [Helper(), Helper()]` — a homogeneous constructor-list
    * literal binds xs's ELEMENT type (C3 slice 12: jedi infers the
    * list's value type from its items); mixed-type or non-call items
    * leave xs unbound. */
  private val listLitAssign: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*\[(.+)\]\s*$""".r
  private val ctorItem: Regex =
    """^\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(\s*[^()]*\)\s*$""".r

  /** `d = {"k": Ctor(), …}` / `s = {Ctor(), …}` — a homogeneous
    * constructor BRACE literal (C3 slice 56, the dict/set twin of
    * slice 12): colon entries bind the target's VALUE type (keys stay
    * out of model, slice 28's rule), colon-free items are a SET and
    * bind the ELEMENT type; mixed or non-call items bind nothing. */
  private val braceLitAssign: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*\{(.+)\}\s*$""".r

  /** `xs = [Ctor(…) for … in …]` (or a set comprehension) — a
    * comprehension whose ELEMENT is a constructor call binds the
    * target's element type (C3 slice 26: jedi infers the comp element
    * from its expression), feeding the same elemLocals machinery as
    * container annotations. */
  private val compCtorAssign: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*(?::[^=]+)?=\s*[\[{]\s*""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(.*\sfor\s+.*[\]}]\s*$""").r

  /** `a, b = X(), y` — parallel tuple unpacking (C3 slice 14): when the
    * RHS arity matches, each target binds INDEPENDENTLY from its own
    * position (jedi types tuple elements one by one) — constructor items
    * and already-typed bare names resolve, anything else leaves that one
    * target unbound. Starred targets and nested tuples stay out. */
  private val tupleTargetsAssign: Regex =
    """^\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)+)\s*=(?!=)\s*(.+?)\s*$""".r

  /** `del x[, y]` — unbinds the names (r17 slice 95: a read after the
    * del must not resolve through the dead binding). */
  private val delStmt: Regex =
    """^\s*del\s+(.+?)\s*$""".r

  /** `a = b = Ctor()` — chained assignment: every target binds the one
    * RHS type (also slice 14; jedi resolves both names to the same
    * instance). */
  private val chainedAssign: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*=(?!=)\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""".r

  /** Split on top-level commas (outside brackets/parens/quotes) — list
    * items' constructor args may themselves contain commas. */
  private def splitTopComma(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var depth = 0
    var quote: Char = 0
    for (c <- s) {
      if (quote != 0) { sb.append(c); if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c; sb.append(c)
        case '(' | '[' | '{' => depth += 1; sb.append(c)
        case ')' | ']' | '}' => depth = math.max(0, depth - 1); sb.append(c)
        case ',' if depth == 0 => out += sb.toString; sb.clear()
        case other => sb.append(other)
      }
    }
    out += sb.toString
    out.toSeq
  }

  /** `xs = []` / `d = {}` / `list()`/`set()`/`dict()` — an EMPTY
    * container binding (C3 slice 46): the content type is inferred from
    * later writes ([[appendCall]], [[subscriptPut]]), jedi's
    * container-content tracking for the build-up idiom. */
  private val emptyContainerAssign: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*(?::[^=]+)?=\s*""" +
      """(?:\[\s*\]|\{\s*\}|list\(\s*\)|set\(\s*\)|dict\(\s*\))\s*$""").r

  /** `xs.append(Helper())` / `xs.add(h)` — a content write into a
    * slice-46 empty container; the FIRST resolvable write binds the
    * element type (an explicit annotation always wins). */
  private val appendCall: Regex =
    """^\s*([A-Za-z_]\w*)\s*\.\s*(?:append|add)\s*\(\s*(.+?)\s*\)\s*$""".r

  /** `d[k] = Helper()` — the mapping-side slice-46 write: binds the
    * VALUE type of an empty-dict local. */
  private val subscriptPut: Regex =
    """^\s*([A-Za-z_]\w*)\s*\[[^\]]*\]\s*=(?!=)\s*(.+?)\s*$""".r

  /** `for k, v in d.items():` — the items() iteration of a mapping-typed
    * local (C3 slice 47): the key target stays unbound (keys are out of
    * model, the slice-28 rule), the VALUE target binds. */
  private val forInItems: Regex =
    ("""^\s*for\s+([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)\s+in\s+""" +
      """([A-Za-z_]\w*)\s*\.\s*items\s*\(\s*\)\s*:\s*$""").r

  /** `f = lambda …: Cls(...)` — a lambda FACTORY (C3 slice 48): jedi
    * infers the lambda's return from its body expression, so calling f
    * constructs (and types) Cls — the slice-40 partial pattern without
    * the functools import. Only constructor-call bodies bind. */
  private val lambdaCtorAssign: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*=\s*lambda[^:]*:\s*""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""").r

  /** `y = next(iter(xs))` / `y = next(iter(xs), default)` — the
    * first-element read of a container (C3 slice 49): jedi resolves it
    * to the element type, like `xs[0]`. */
  private val nextIterRead: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*=\s*next\s*\(\s*iter\s*\(\s*""" +
      """([A-Za-z_]\w*)\s*\)\s*[,)]""").r

  /** `x = name or Ctor(...)` — the OR-DEFAULT idiom (C3 slice 50):
    * jedi infers the union of both arms; the constructor arm is the
    * resolvable one here (and when `name` is a typed local of the same
    * class the union collapses exactly), so the target binds the
    * constructed type. Only bare-name left arms match — a call arm is
    * slice 10's territory. */
  private val orDefaultAssign: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s+or\s+""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""").r

  /** `assert isinstance(x, Cls)` — the assert-guard narrowing (C3
    * slice 51): jedi narrows x to Cls for the rest of the scope, the
    * assert-spelled twin of slice 38's if-guard. */
  private val assertIsinstance: Regex =
    ("""^\s*assert\s+isinstance\s*\(\s*([A-Za-z_]\w*)\s*,\s*""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\)""").r

  /** `y = d.setdefault(k, default)` — the get-or-insert idiom (C3 slice
    * 53): on an empty-dict build-up the default infers the VALUE type,
    * and the target reads it (typeshed's `setdefault(…) -> _VT`). */
  private val setdefaultCall: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*\.\s*setdefault\s*""" +
      """\(\s*[^,()]+,\s*(.+)\)\s*$""").r

  /** `y = d.get(k, default)` — the read-with-fallback idiom (C3 slice
    * 61): jedi infers the union of the mapping's value type and the
    * DEFAULT arm; when the receiver's value type is unknown, the
    * resolvable default is the binding. */
  private val getDefaultCall: Regex =
    // r14 slice 80 widens `.get` to `.setdefault` — same union, same
    // optimistic default arm (setdefault additionally INSERTS, but the
    // read type is identical)
    ("""^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*\.\s*(?:get|setdefault)\s*""" +
      """\(\s*[^,()]+,\s*(.+)\)\s*$""").r

  /** `y = max(xs)` / `y = min(xs)` — builtin element reads (C3 slice
    * 52): typeshed's Iterable[T] → T signatures, so the target binds
    * the container's element type. Bare-name args only (a keyed
    * `max(xs, key=…)` still reads an element — the trailing args are
    * irrelevant, so they're allowed after the name). */
  private val builtinElemRead: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*=\s*(?:max|min)\s*\(\s*""" +
      """([A-Za-z_]\w*)\s*[,)]""").r

  /** `y = xs.pop()` / `y = d.pop(k)` — the pop read (also slice 52):
    * a list's pop returns its element, a mapping's its VALUE. */
  private val popRead: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*\.\s*pop\s*\(""".r

  /** `except SomeError as e:` — the handler target binds the exception
    * class (C3 slice 11: jedi types the as-name from the except clause;
    * the tuple form `except (A, B) as e` is ambiguous and deliberately
    * unmatched). */
  private val exceptAs: Regex =
    """^\s*except\s+([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s+as\s+([A-Za-z_]\w*)\s*:\s*$""".r

  /** `return Callee(...)` — a constructor (or call) return, the head of
    * slice 8's un-annotated return-type inference. `await` unwraps (C3
    * slice 34: a coroutine's awaited value IS its return). */
  private val returnCtor: Regex =
    """^\s*return\s+(?:await\s+)?([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""".r

  /** `case Cls(...) as x:` — a class-pattern capture (C3 slice 35: jedi
    * narrows the as-name to the matched class; bare `case Cls():`
    * without a capture binds nothing). */
  private val matchCaseAs: Regex =
    """^\s*case\s+([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(.*\)\s+as\s+([A-Za-z_]\w*)\s*:\s*$""".r

  /** `*args: T` / `**kw: T` — starred-parameter annotations (C3 slice
    * 36): `*args: T` is a TUPLE of T (element binding), `**kw: T` a
    * str→T mapping (value binding) — PEP 484's reading. */
  private val starParamAnno: Regex =
    """(?<!\*)\*([A-Za-z_]\w*)\s*:\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)""".r
  private val dstarParamAnno: Regex =
    """\*\*([A-Za-z_]\w*)\s*:\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)""".r

  /** `def f(h=Ctor()):` — a constructor DEFAULT types the parameter (C3
    * slice 37: jedi infers an unannotated param from its default). */
  private val paramCtorDefault: Regex =
    """([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""".r

  /** `isinstance(x, Cls)` inside an `if`/`elif`/`while`/`assert` line —
    * jedi NARROWS x to Cls in the guarded region (C3 slice 38; the
    * line-scoped model binds for the rest of the callable, the usual
    * over-approximation of these slices). */
  private val isinstanceNarrow: Regex =
    """isinstance\(\s*([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\)""".r

  /** `isinstance(x, (A, B, …))` — the TUPLE form (r14 slice 77): jedi
    * narrows to the union; the optimistic take is the first arm that
    * resolves to a class (member calls on it resolve, the chaseFields
    * convention for the rest). */
  private val isinstanceTupleNarrow: Regex =
    ("""isinstance\(\s*([A-Za-z_]\w*)\s*,\s*\(\s*""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*""" +
      """(?:\s*,\s*[A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)*)\s*,?\s*\)\s*\)""").r

  /** `c = copy.copy(x)` / `c = (copy.)deepcopy(x)` — the stdlib copy
    * functions preserve their argument's type (C3 slice 39: jedi's
    * typeshed overloads return T for copy[T]). */
  private val copyAssign: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*((?:copy\s*\.\s*)?(?:deepcopy|copy))\s*\(\s*([A-Za-z_]\w*)\s*\)\s*$""".r

  /** `f = (functools.)partial(Cls, ...)` — calling the partial
    * constructs Cls (C3 slice 40: jedi resolves partial's return to the
    * bound callable), so f joins the slice-32 class-alias namespace. */
  private val partialAssign: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*((?:functools\s*\.\s*)?partial)\s*\(\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*[,)]""".r

  /** `y = x if … else None` — a self-conditional on a typed name binds
    * the non-None arm's type (C3 slice 41, the bare-name analogue of
    * slice 21's Optional reading). */
  private val ternaryNameAssign: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s+if\s+.+\s+else\s+None\s*$""".r

  /** `for i, h in enumerate(xs):` — the SECOND target iterates xs's
    * elements (C3 slice 42; the index stays unbound). */
  private val forInEnumerate: Regex =
    // r14 slice 80: an optional empty-call source (`enumerate(f())`)
    // and trailing args (`enumerate(xs, start=1)`) both parse
    ("""^\s*for\s+([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)\s+in\s+enumerate\(\s*""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*(\(\s*\))?\s*(?:,[^()]*)?\)\s*:\s*$""").r

  /** `for a, b in zip(xs, ys):` — each target takes its own side's
    * element type (slice 42). */
  private val forInZip: Regex =
    """^\s*for\s+([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)\s+in\s+zip\(\s*([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)\s*\)\s*:\s*$""".r

  /** `for h in sorted(xs):` (reversed/list/tuple/set) — order/container
    * wrappers pass the element type through (slice 42: typeshed's
    * Iterable[T] → T signatures). */
  private val forInPassthrough: Regex =
    """^\s*for\s+([A-Za-z_]\w*)\s+in\s+(?:sorted|reversed|list|tuple|set)\(\s*([A-Za-z_]\w*)\s*\)\s*:\s*$""".r

  /** `hs = [h for h in src]` / `[h for h in gen()]` — an IDENTITY
    * comprehension carries the source's element (or a generator's
    * yield) type onto the target's element binding (C3 slice 43). */
  private val compIdentAssign: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*=\s*\[\s*([A-Za-z_]\w*)\s+for\s+([A-Za-z_]\w*)""" +
      """\s+in\s+([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*(\([^()]*\))?\s*\]\s*$""").r

  /** r14 slice 74 — `d = {k_expr: v for v in src}`: an IDENTITY-VALUE
    * dict comprehension carries the source's element type onto the
    * target's VALUE binding (the mapping twin of [[compIdentAssign]];
    * keys stay out of model, slice 28's rule). */
  private val dictCompIdentAssign: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*=\s*\{[^{}:]*:\s*([A-Za-z_]\w*)\s+for\s+""" +
      """([A-Za-z_]\w*)\s+in\s+([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)""" +
      """\s*(\([^()]*\))?\s*\}\s*$""").r

  /** r14 slice 74 — `ys = sorted(xs)` / list/tuple/set/reversed: the
    * assignment spelling of [[forInPassthrough]]'s order wrappers —
    * the target's ELEMENT binding carries the inner source's (a typed
    * container local, a declared container return, or a yield type).
    * typeshed: these wrappers are Iterable[T] → Sequence[T]. */
  private val wrapAssign: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*=\s*(?:sorted|reversed|list|tuple|set)\(\s*""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*(\([^()]*\))?\s*\)\s*$""").r

  /** `return name` — a bare-name return (a typed local, or `self`). */
  private val returnName: Regex =
    """^\s*return\s+([A-Za-z_]\w*)\s*$""".r

  /** `yield Ctor(...)` / `yield name` — the generator twins of
    * [[returnCtor]]/[[returnName]] (C3 slice 30: jedi infers the
    * ITERATION type of a generator from its yield expressions, so
    * `for x in gen():` types x). */
  /** Annotation position INSIDE a typing generic's first bracket —
    * the blanking pass preserves string content there (r14 slice 71:
    * `-> Optional["Conn"]`); anchored so `:`/`->` must abut the
    * generic's own name, which a data subscript never satisfies. */
  private val annoGenericTail: Regex =
    ("""(?::|->)\s*(?:typing\s*\.\s*)?""" +
      """(?:Optional|Union|List|Dict|Set|Tuple|FrozenSet|Sequence|""" +
      """MutableSequence|Iterable|Iterator|Collection|Final|ClassVar|""" +
      """Annotated|list|dict|set|tuple|frozenset)\s*\[\s*$""").r

  private val yieldCtor: Regex =
    """^\s*yield\s+([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""".r
  private val yieldName: Regex =
    """^\s*yield\s+([A-Za-z_]\w*)\s*$""".r
  /** `return [Ctor() for … ]` — a constructor list/set comprehension
    * return (r14 slice 82): the def returns a container whose ELEMENT
    * is the constructed class, feeding the slice-70 element machinery
    * (`for x in f():`, `xs = f()` + iteration). */
  private val returnCompCtor: Regex =
    ("""^\s*return\s+[\[{]\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)""" +
      """\s*\([^()]*\)\s+for\s""").r

  /** `return self.field` — the getter idiom (r14 slice 79): the
    * method's return type is the field's, resolved at consumption
    * through the class's MRO'd field types. */
  private val returnSelfField: Regex =
    """^\s*return\s+self\.([A-Za-z_]\w*)\s*$""".r

  /** `yield from callee(...)` — generator delegation (r14 slice 76):
    * the enclosing generator iterates the callee's element type. */
  private val yieldFromDeleg: Regex =
    """^\s*yield\s+from\s+([A-Za-z_]\w*)\s*\(""".r

  /** `-> list[Elem]` (and the [[containerAnno]] family) as a RETURN
    * annotation — [[returnArrow]]'s no-bracket guard excludes these, so
    * the container-arrow form matches the header directly; the first
    * type argument is the element (r14 slice 70). */
  private val arrowContainer: Regex =
    ("""->\s*(?:typing\s*\.\s*)?""" +
      """(?:list|List|Sequence|MutableSequence|tuple|Tuple|set|Set|""" +
      """frozenset|FrozenSet|Iterable|Iterator|Collection)""" +
      """\s*\[\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*[\],]""").r

  /** `-> Optional[User]` / `-> None | User` return annotations — the
    * RETURN analog of slice 21's nullable params/locals (r14 slice 71):
    * jedi resolves `x = f()` members through the Union's non-None arm,
    * so the inner class is the optimistic take. The `User | None` order
    * already lands in [[returnArrow]] (its lookahead stops at `[`, not
    * `|`) — these two cover the spellings it can't see. Stored as the
    * INNER name so every downstream consumer (same-module binding,
    * cross-module fold) is unchanged. */
  private val arrowOptional: Regex =
    ("""->\s*(?:typing\s*\.\s*)?Optional\[\s*["']?""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)["']?\s*\]""").r
  private val arrowUnionNone: Regex =
    """->\s*None\s*\|\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)(?!\w|\s*[\[|])""".r

  /** `for x in f():` over a bare call — feeds from the callee's yield
    * type (slice 30). */
  private val forInCall: Regex =
    """^\s*for\s+([A-Za-z_]\w*)\s+in\s+([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\([^()]*\)\s*:\s*$""".r

  /** `global a[, b …]` (r14 slice 75) — declared names route their
    * in-function constructor assignments to the module singleton map. */
  private val globalDecl: Regex =
    """^\s*global\s+([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*$""".r

  /** `a = b = Ctor()` — multi-target assignment (r14 slice 75): BOTH
    * targets bind the RHS instance type (jedi types each target). */
  private val multiTargetAssign: Regex =
    ("""^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*=\s*(?:await\s+)?""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*\(""").r

  /** `x: Final[User]` / ClassVar / Annotated (r14 slice 75) — the
    * wrapper annotations whose FIRST argument is the instance type
    * (PEP 591/526/593; Annotated's metadata tail is ignored). */
  private val wrapperAnno: Regex =
    ("""([A-Za-z_]\w*)\s*:\s*(?:typing\s*\.\s*)?""" +
      """(?:Final|ClassVar|Annotated)\[\s*["']?""" +
      """([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)["']?\s*[\],]""").r

  /** Comprehension `for <var> in <src>[(]` (r14 slice 73) — matched
    * anywhere in a non-statement-`for` line; group 3 present means the
    * source is a CALL (yield / declared-container-return typing),
    * absent means a bare name (typed-container elemLocals). */
  private val compForIn: Regex =
    """\bfor\s+([A-Za-z_]\w*)\s+in\s+([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*(\()?""".r

  /** `x = Name` — a bare-name RHS assignment: a CLASS RHS makes x a
    * class alias (slice 32), an already-typed local RHS aliases the
    * instance (`y = h` types y as h's type, jedi's name-to-name
    * flow). Dotted RHS stays with [[attrReadAssign]]/slice 29. */
  private val bareNameAssign: Regex =
    """^\s*([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*$""".r

  /** Annotated local `x: Helper [= …]` inside a callable — an annassign,
    * which types x for `x.method()` resolution (PEP 526 syntax, no
    * inference needed). */
  private val localAnno: Regex =
    """^\s*([A-Za-z_]\w*)\s*:\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)(?!\w|\s*\[)\s*(?:=(?!=).*)?$""".r

  /** Decorator heads whose wrappers are RETURN-TRANSPARENT (or whose
    * modules are): a def behind one keeps its declared annotations;
    * anything else must resolve to a bound or imported name or the
    * def's return keys poison (slice 59/62 in the deep pass, slice 88
    * in the corpus scan). */
  private val knownDecoHeads = Set("staticmethod", "classmethod",
    "property", "cached_property", "abstractmethod", "functools",
    "dataclass", "dataclasses", "abc", "typing", "override", "wraps",
    "lru_cache", "cache")

  /** Slice 84: one annotated parameter `name: Anno` inside a def
    * header's paren span (the scan's shallow take — default-value
    * expressions could in principle false-match, but a `name: Dotted`
    * pair inside a default is vanishingly rare and the fact is
    * positive-only). */
  private val ctorParamAnno: Regex =
    """([A-Za-z_]\w*)\s*:\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)""".r

  /** Slice 84: `self.f = p` — a whole-line constructor-injection
    * assignment of a bare parameter name. */
  private val selfParamAssign: Regex =
    """^\s*self\.([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\s*$""".r

  /** Cross-module resolution context for deep slices (r14, slices
    * 62-63): `modules` = corpus modules whose top-level binding set is
    * CLOSED (no `import *`, no module-level `__getattr__` — PEP 562
    * dynamic attrs reopen it, the dynamic-class exemption's module
    * analog); `bound` = every full name bound at a closed module's top
    * level (defs, classes, assignments, import aliases, for/with
    * targets); `returns` = declared `-> Class` annotations of
    * top-level defs and first-level methods, resolved against the
    * DEFINING module's own classes (def fqn → class fqn — slices
    * 63-64's cross-module factory/method typing; positive facts, so
    * collected from open modules too); `fields` = class-body ANNOTATED
    * fields and `@property` reads (attr fqn → class fqn — slice 65's
    * cross-module attribute chases); `vars` = module-level SINGLETONS
    * (`db = Database()` constructor or annotated assignments — var fqn
    * → class fqn, slice 67's imported-singleton typing). `returns` and
    * `fields` are FLATTENED through the transitive cross-module MRO at
    * the fold (slice 83): a fact declared on `b.Base` surfaces keyed
    * `a.Mid.m` too when `a.Mid(b.Base)`, nearest MRO declaration
    * winning — so a local subclass of an imported class sees two-hop
    * inherited members without chasing ancestors itself. */
  final case class CorpusContext(modules: Set[String], bound: Set[String],
      returns: Map[String, String], fields: Map[String, String],
      vars: Map[String, String],
      returnElems: Map[String, String] = Map.empty,
      // slice 91 (r16): per closed module, the STAR-EXPORT name set —
      // the parsed literal __all__ when one exists, else the
      // non-underscore top-level names (transitive star names included)
      exports: Map[String, Set[String]] = Map.empty,
      // slice 95 (r18): per PEP 562 module with a PINNED __getattr__
      // type, the resolved class fqn — attribute reads through the
      // open module type as it when the name is NOT a real top-level
      // binding (`getattrNames` holds those, per such module);
      // un-pinned __getattr__ modules keep blanket optimism
      getattrs: Map[String, String] = Map.empty,
      getattrNames: Map[String, Set[String]] = Map.empty)

  /** One module's pre-scan facts, RAW (slice 68): annotation values are
    * the simple names as written; resolution — against the module's own
    * classes first, then through its from-import bindings into other
    * scanned modules' class sets — happens once, in [[corpusContext]],
    * where every module's classes are visible. `imports` maps each
    * from-imported local binding to its qualified source
    * (`User -> "models.User"`, aliases included). */
  final case class ModuleScan(mod: String, names: Set[String],
      open: Boolean, classes: Set[String], returns: Map[String, String],
      fields: Map[String, String], vars: Map[String, String],
      imports: Map[String, String], modImports: Map[String, String],
      bases: Map[String, Seq[String]] = Map.empty,
      returnElems: Map[String, String] = Map.empty,
      // slice 89 (r16): ABSOLUTE sources of `from X import *` — the
      // corpus fold resolves them (a star of a CLOSED indexed module
      // binds exactly that module's exported top-level names; a star
      // of an open/out-of-corpus module opens this module, jedi's
      // resolution of import * — indexer_visitor.py:270-306)
      starImports: Seq[String] = Seq.empty,
      // slice 91 (r16): the module's LITERAL `__all__` list when one
      // parses — the star-export allow-list Python itself honours; a
      // dynamic __all__ (+=, extend, comprehension) stays None and the
      // export set falls back to the optimistic superset
      allList: Option[Seq[String]] = None,
      // slice 95 (r18): the RAW pinned type of a module-level PEP 562
      // `__getattr__` — its declared `-> Cls` annotation, or (when
      // unannotated) the single constructor its body's returns all
      // agree on. Resolution to a class fqn happens at the corpus
      // fold; None keeps the pre-slice-95 blanket optimism.
      getattrAnno: Option[String] = None)

  /** Index one file. `relPath` is repo-relative (A7 strips roots earlier).
    * `corpus`, when present, enables the cross-module slices (62). */
  def indexFile(taskId: String, relPath: String, content: String,
      corpus: Option[CorpusContext] = None): FileEvents = {
    val rawLines = content.split("\n", -1)
    val (lines, atomicRanges) = preprocess(rawLines)
    val cont = continuations(lines)
    val mod = moduleName(relPath)

    // the logical header at line `h`: the physical line plus its bracket/
    // backslash continuation lines, joined — shared by the return-anno
    // pre-pass, class base lists, and def param annotations
    def joinedHeader(h: Int): String =
      (lines(h) +: (h + 1 until lines.length)
        .iterator.takeWhile(cont(_)).map(lines(_)).toSeq).mkString(" ")

    val symbols = mutable.ArrayBuffer.empty[SymbolEvent]
    val edges = mutable.ArrayBuffer.empty[EdgeEvent]
    val locs = mutable.ArrayBuffer.empty[LocationRow]
    var seq = 0L
    def nextSeq(): Long = { seq += 1; seq }

    // (line, startCol) of every LOCAL definition row already emitted —
    // the usage scan skips these so a definition's own name node never
    // double-records (the reference visits each name node exactly once)
    val localDefPos = mutable.Set.empty[(Int, Int)]
    // LOCAL definition row for `name` bound in callable `fn` at 0-based
    // line `lineNo` — spelling `fn<name>` per getLocalSymbolName
    // (shallow_indexer.py:545-546)
    def recordLocalDef(fn: Scope, name: String, lineNo: Int): Unit = {
      val cpos = wordPos(rawLines(lineNo), name)
      if (cpos >= 0) {
        locs += LocationRow(s"${fn.fullName}<$name>", relPath, "LOCAL",
          lineNo + 1, cpos + 1, lineNo + 1, cpos + name.length)
        localDefPos += ((lineNo + 1, cpos + 1))
      }
      fn.localNames += name
    }

    // ---- pre-pass: module-level defs/classes/globals + imports (C8, D2 input)
    val topClasses = mutable.Set.empty[String]
    val topDefs = mutable.Set.empty[String]
    val topGlobals = mutable.Set.empty[String]
    val importedName = mutable.Map.empty[String, String] // alias -> full target
    val importedModule = mutable.Map.empty[String, String] // binding -> module
    val importFacts = mutable.ArrayBuffer.empty[ImportFact]
    val isPackage = relPath.endsWith("/__init__.py") || relPath == "__init__.py"
    // C10 — resolve a from-import module spec, handling relative levels:
    // '.'=current package, '..'=parent (ast_utils.py:64-95 level handling)
    def resolveFromModule(spec: String): Option[String] = {
      val level = spec.takeWhile(_ == '.').length
      val rest = spec.drop(level)
      if (level == 0) Some(rest)
      else {
        val pkg =
          if (isPackage) mod.split("\\.").toSeq
          else mod.split("\\.").toSeq.dropRight(1)
        if (level - 1 > pkg.length) None
        else {
          val base = pkg.dropRight(level - 1)
          Some((base ++ (if (rest.nonEmpty) Seq(rest) else Nil)).mkString("."))
        }
      }
    }
    // logical-line join for parenthesized import lists:
    //   from m import (a, b as c,\n d)
    val logical = {
      val buf = mutable.ArrayBuffer.empty[String]
      var pending: String = null
      lines.foreach { l =>
        if (pending != null) {
          pending += " " + l.trim
          if (l.contains(")")) { buf += pending.replaceAll("[()]", " "); pending = null }
        } else if (l.trim.startsWith("from") && l.contains("(") && !l.contains(")"))
          pending = l
        else buf += l
      }
      buf.toSeq
    }
    lines.indices.foreach { li =>
      if (!cont(li)) lines(li) match {
        case classHeader(ind, name, _) if ind.isEmpty => topClasses += name
        case defHeader(ind, name) if ind.isEmpty => topDefs += name
        case assignStmt(ind, name) if ind.isEmpty => topGlobals += name
        // module-level for-targets are definitions at module scope →
        // GLOBAL_VARIABLE in the reference's shallow mode
        // (shallow_indexer.py:480-487: is_definition, no funcdef parent)
        case forStmt(ind, name) if ind.isEmpty && !keywords.contains(name) =>
          topGlobals += name
        case _ => ()
      }
    }
    logical.foreach {
      case importStmt(spec) =>
        spec.split(",").map(_.trim).filter(_.nonEmpty).foreach { part =>
          part.split("\\s+as\\s+") match {
            case Array(t, a) =>
              importedModule(a.trim) = t.trim
              importFacts += ImportFact(mod, a.trim, t.trim, "module")
            // plain `import a.b.c` binds the dotted path itself; dotted
            // callees resolve by longest-prefix match below
            case _ =>
              importedModule(part.trim) = part.trim
              importFacts += ImportFact(mod, part.trim, part.trim, "module")
          }
        }
      case fromImport(m, names) =>
        resolveFromModule(m.trim).foreach { srcMod =>
          names.replaceAll("[()]", " ").split(",").map(_.trim)
            .filter(_.nonEmpty).foreach { part =>
              if (part == "*") {
                importFacts += ImportFact(mod, "*", srcMod, "wildcard")
                // slice 89 (r16): a star of a CLOSED corpus module
                // binds exactly its exported top-level names
                // (underscore names stay home unless __all__ is
                // declared — Python's default export set), and the
                // visitor then resolves them like explicit
                // from-imports. An open or out-of-corpus source keeps
                // the blanket optimism. File order holds: an explicit
                // binding BEFORE the star wins (no overwrite), one
                // after it overwrites.
                corpus.filter(_.modules.contains(srcMod)).foreach { c =>
                  // slice 91: the fold's per-module export set applies
                  // Python's __all__ rule (parsed literal allow-list,
                  // else non-underscore names)
                  c.exports.getOrElse(srcMod, Set.empty).foreach { n =>
                    if (!importedName.contains(n))
                      importedName(n) = s"$srcMod.$n"
                  }
                }
              } else {
                val (target, alias) = part.split("\\s+as\\s+") match {
                  case Array(t, a) => (t.trim, a.trim)
                  case _ => (part.trim, part.trim)
                }
                if (srcMod.nonEmpty) {
                  importedName(alias) = s"$srcMod.$target"
                  importFacts += ImportFact(mod, alias, s"$srcMod.$target", "name")
                }
              }
            }
        }
      case _ => ()
    }

    // r16 slice 90: CALL-SITE PARAM INFERENCE — jedi's dynamic params
    // (jedi searches a function's usages and executes the found
    // arguments when a param lacks an annotation). FILE-LOCAL, like
    // jedi's own bounded dynamic search: for each TOP-LEVEL def, every
    // bare-name call site's argument spelled as a CONSTRUCTOR call of a
    // classish head proposes its class for the reached param
    // (positional or keyword); a param types only when it carries no
    // annotation and EVERY proposing call site agrees on ONE head —
    // disagreement keeps jedi's union out of the model, the module's
    // optimistic-or-nothing posture.
    val dynParams: Map[String, Map[String, String]] = locally {
      val headerOf = mutable.Map.empty[String, Seq[String]]
      // slice 92 (r16): CLASS-ADDRESSED methods too — `Cls.m(Conn())`
      // names its receiver statically, so the same dynamic-params
      // search applies, keyed "Cls.m"; a leading self/cls piece shifts
      // the positional mapping by one (the naming convention jedi
      // leans on as well). Instance-receiver calls (`x.m(...)`) stay
      // out: the pre-pass has no type for x.
      var curCls92: Option[String] = None
      lines.indices.foreach { li =>
        if (!cont(li)) lines(li) match {
          case classHeader(ind, c, _) if ind.isEmpty =>
            curCls92 = Some(c)
          case defHeader(ind, d) if ind.isEmpty =>
            curCls92 = None
            headerOf(d) =
              splitTopLevel(parenSpan(joinedHeader(li))).map(_.trim)
          case defHeader(ind, d) if ind.nonEmpty && curCls92.isDefined =>
            headerOf(s"${curCls92.get}.$d") =
              splitTopLevel(parenSpan(joinedHeader(li))).map(_.trim)
          case ln92 if ln92.nonEmpty && !ln92.head.isWhitespace =>
            curCls92 = None
          case _ => ()
        }
      }
      val proposals =
        mutable.Map.empty[(String, String), mutable.Set[String]]
      if (headerOf.nonEmpty) {
        val callRe = """(?<![\w.])([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)?)\s*\(""".r
        val ctorArg = """^([A-Za-z_]\w*)\s*\(""".r
        val kwArg = """^([A-Za-z_]\w*)\s*=(?!=)\s*(.+)$""".r
        def classish(h: String): Boolean = !keywords.contains(h) &&
          (topClasses.contains(h) || h.headOption.exists(_.isUpper))
        def paramName(piece: String): Option[String] = {
          // plain un-annotated, default-less positional params only —
          // an annotation or default already types (and wins); starred
          // pieces never map positionally
          val nm = piece.takeWhile(isWordCh)
          if (nm.nonEmpty && !piece.contains(":") && !piece.contains("=") &&
              !piece.startsWith("*")) Some(nm) else None
        }
        lines.indices.foreach { li =>
          val t = lines(li).trim
          if (!cont(li) && !t.startsWith("def ") &&
              !t.startsWith("async def")) {
            val logical = joinedHeader(li)
            callRe.findAllMatchIn(logical).foreach { m =>
              val f = m.group(1)
              if (headerOf.contains(f)) {
                val open = logical.indexOf('(', m.start)
                val close = matchingParen(logical, open)
                if (close > open) {
                  val args = splitTopLevel(
                    logical.substring(open + 1, close)).map(_.trim)
                  val pieces = headerOf(f)
                  // slice 92: a class-addressed method's leading
                  // self/cls piece shifts the positional mapping
                  val off = if (f.contains(".") && pieces.headOption
                      .exists(p => { val n = p.takeWhile(isWordCh)
                        n == "self" || n == "cls" })) 1 else 0
                  args.zipWithIndex.foreach { case (a, k) =>
                    val (pn, expr) = a match {
                      case kwArg(nm, e)
                        if pieces.exists(_.takeWhile(isWordCh) == nm) =>
                        (pieces.find(_.takeWhile(isWordCh) == nm)
                          .flatMap(paramName), e)
                      case _ =>
                        (pieces.lift(k + off).flatMap(paramName), a)
                    }
                    pn.foreach { p =>
                      ctorArg.findFirstMatchIn(expr)
                        .map(_.group(1)).filter(classish).foreach { h =>
                          proposals.getOrElseUpdate((f, p),
                            mutable.Set.empty) += h
                        }
                    }
                  }
                }
              }
            }
          }
        }
      }
      proposals.iterator.collect {
        case ((f, p), hs) if hs.size == 1 => (f, p, hs.head)
      }.toSeq.groupBy(_._1)
        .map { case (f, xs) => f -> xs.map(t => t._2 -> t._3).toMap }
    }

    // module symbol (C13: FILE+MODULE recorded in the visitor ctor)
    symbols += SymbolEvent(nextSeq(), taskId, Kind.Module, mod, mod.split("\\.").last,
      Some(relPath), None, None,
      Some(codePtr(1, rawLines.length, relPath)), Map.empty)
    locs += LocationRow(mod, relPath, "SCOPE", 1, 1, rawLines.length, 1)

    // fields discovered per class (for USES resolution)
    val classFields = mutable.Map.empty[String, mutable.Set[String]]
    val classMethods = mutable.Map.empty[String, mutable.Set[String]]
    // C3 (partial): constructor-typed self-fields per class —
    // `self.h = Helper()` lets `self.h.run()` resolve from ANY later
    // method of the class
    val classFieldTypes = mutable.Map.empty[String, mutable.Map[String, String]]
    // r12 slice 57: ELEMENT types of container self-fields
    // (`self.conns.append(Conn())` → conns: list-of-Conn), first
    // resolvable write wins (slice 46's rule), pre-pass-collected so
    // method order in the file never matters
    val classFieldElemTypes =
      mutable.Map.empty[String, mutable.Map[String, String]]

    // C3 (partial): `-> Type` return annotations per callable, collected
    // in a pre-pass so `x = f()` binds x's type even when f is defined
    // LATER in the file (the declared-return slice of jedi's return-type
    // inference, indexer_visitor.py:53-140; cross-file returns stay out
    // of scope). Keys are module-relative ("Class.m" / "f"); returns of
    // defs nested inside defs are not keyed.
    val returnAnnoRaw = mutable.Map.empty[String, String]
    // r14 slice 70: raw ELEMENT annotation of defs declared to return a
    // container (`-> list[User]` keys "User") — consumed by iteration,
    // subscript reads, and `xs = f()` element bindings; the container
    // itself is not an instance type, so returnAnnoRaw never sees it
    val returnElemRaw = mutable.Map.empty[String, String]
    // C3 slice 8: INFERRED return types for defs with NO `->` annotation
    // (indexer_visitor.py:183-241 is the behavior target — jedi follows
    // the return expression): a body `return ClassName(...)`, `return
    // <local already typed by a constructor or annotation earlier in the
    // same def>`, or `return self` (the enclosing class — the builder/
    // fluent pattern). First such return wins (control-flow merging of
    // divergent branch types stays out of scope); a declared annotation
    // always takes priority at the use site. Raw names resolve through
    // the same classish/import path as declared annotations.
    val returnInferredRaw = mutable.Map.empty[String, String]
    // C3 slice 30: INFERRED yield types — `yield ClassName(...)` or
    // `yield <typed local>` keys the generator's ITERATION type the same
    // way returnInferredRaw keys its return type; `for x in gen():`
    // consumes it. First yield wins, same merge rule as returns.
    val yieldInferredRaw = mutable.Map.empty[String, String]
    // r14 slice 76: `yield from callee()` DELEGATION — the generator's
    // iteration type is the delegated callee's (its own yield type, or
    // a declared container return's element); chains resolve at
    // consumption, bounded and cycle-safe
    val yieldFromRaw = mutable.Map.empty[String, String]
    // r14 slice 79: `return self.field` getters — field name per key,
    // resolved at consumption via the class's MRO'd field types
    val returnSelfFieldRaw = mutable.Map.empty[String, String]
    // C3 slice 19: "C.m" keys of defs decorated `@property` /
    // `@(functools.)cached_property` — an attribute READ of one chases
    // the method's declared/inferred return type (jedi's descriptor
    // resolution: `db.conn` IS a Conn, not a bound method)
    val propertyDefsRaw = mutable.Set.empty[String]
    val propertyDecos = Set("property", "cached_property",
      "functools.cached_property")
    // r13 slice 59: DECORATOR-TRANSPARENT returns — jedi resolves a
    // decorated def's call result through the decorator (functools.wraps
    // / identity wrappers preserve the signature), so a decorated
    // `-> T` / inferred return KEEPS its key as long as every decorator
    // RESOLVES: a known signature-preserving builtin, a module-local
    // def/class (bound before the decorated def, as Python requires),
    // or an imported name (the chaseFields optimism — nothing to
    // disprove). A bare decorator name jedi itself could not resolve
    // (no def, no import) makes the call result unknown → the def's
    // return keys DROP and `x = f()` binds nothing.
    val decoPoisoned = mutable.Set.empty[String]
    locally {
      // (indent, name, isDef): a def's return key is valid only when
      // every enclosing level is a class (same rule returnAnnoRaw used)
      val ctx = mutable.Stack.empty[(Int, String, Boolean)]
      val bodyLocals = mutable.Map.empty[String, mutable.Map[String, String]]
      // armed by a @property-family decorator line, consumed by the next
      // def header; stacked decorators keep it armed
      var pendingProp = false
      // armed by an UNRESOLVABLE decorator line (slice 59); consumed by
      // the next def header, which poisons that def's return keys
      var pendingBadDeco = false
      // names a decorator could legally be bound to at this point
      val boundNames = mutable.Set.empty[String]
      def ownerDefKey: Option[Seq[String]] = {
        val chain = ctx.toSeq.reverse // bottom-first
        if (chain.nonEmpty && chain.last._3 && chain.init.forall(!_._3))
          Some(chain.map(_._2))
        else None
      }
      lines.indices.foreach { li =>
        val ln = lines(li)
        if (!cont(li) && ln.trim.nonEmpty) {
          val ind = indentOf(ln)
          while (ctx.nonEmpty && ind <= ctx.top._1) ctx.pop()
          val isDecorator = ln.trim.startsWith("@")
          if (isDecorator) {
            val dotted = ln.trim.stripPrefix("@")
              .takeWhile(c => c.isLetterOrDigit || c == '_' || c == '.')
            if (propertyDecos.contains(dotted)) pendingProp = true
            val head = dotted.split("\\.").headOption.getOrElse("")
            val tail = dotted.split("\\.").toSeq.drop(1)
            // r14 slice 62: an IMPORTED decorator is no longer trusted
            // blindly — when the import's TARGET module is indexed and
            // CLOSED (CorpusContext) and the name is not bound at its
            // top level, the corpus has disproved the decorator (jedi
            // resolves it to nothing) → poison, exactly like a bare
            // unresolvable name. Targets outside the corpus, open
            // modules, and attribute chains deeper than one keep the
            // optimism (nothing to disprove).
            def disproved(fqn: String): Boolean = {
              val i = fqn.lastIndexOf('.')
              i > 0 && corpus.exists(c =>
                c.modules.contains(fqn.substring(0, i)) && !c.bound(fqn))
            }
            if (head.nonEmpty && !knownDecoHeads.contains(head) &&
                !boundNames.contains(head)) {
              if (!importedName.contains(head) &&
                  !importedModule.contains(head))
                pendingBadDeco = true
              else if (tail.isEmpty && importedName.contains(head) &&
                  disproved(importedName(head)))
                pendingBadDeco = true
              else if (tail.size == 1 && !importedName.contains(head) &&
                  importedModule.contains(head) &&
                  disproved(importedModule(head) + "." + tail.head))
                pendingBadDeco = true
            }
          }
          ln match {
            case classHeader(_, cname, _) =>
              pendingProp = false
              pendingBadDeco = false
              boundNames += cname
              ctx.push((ind, cname, false))
            case defHeader(_, dname) =>
              val headerText = joinedHeader(li)
              val keyValid = ctx.toSeq.forall(!_._3)
              val key = (ctx.toSeq.reverse.map(_._2) :+ dname).mkString(".")
              boundNames += dname
              if (pendingBadDeco) decoPoisoned += key
              pendingBadDeco = false
              returnArrow.findFirstMatchIn(headerText).foreach { m =>
                if (keyValid && !decoPoisoned.contains(key)) {
                  // r13 slice 60: PEP 673 `-> Self` (and the explicit
                  // `typing.Self`) is the ENCLOSING class — the modern
                  // fluent-builder annotation jedi resolves natively;
                  // outside a class it annotates nothing
                  val raw = m.group(1).replaceAll("[\"']", "").trim
                  if (raw == "Self" || raw == "typing.Self") {
                    val classes = ctx.toSeq.reverse.map(_._2)
                    if (classes.nonEmpty)
                      returnAnnoRaw(key) = classes.mkString(".")
                  } else returnAnnoRaw(key) = m.group(1)
                }
              }
              // r14 slice 70: container arrows (`-> list[User]`) are
              // excluded from returnArrow by its no-bracket guard —
              // they key the ELEMENT type instead
              arrowContainer.findFirstMatchIn(headerText).foreach { cm =>
                if (keyValid && !decoPoisoned.contains(key))
                  returnElemRaw(key) = cm.group(1)
              }
              // r14 slice 71: `-> Optional[User]` / `-> None | User`
              // bind the non-None arm (overwriting returnArrow's
              // useless "None" capture in the union-first spelling)
              (arrowOptional.findFirstMatchIn(headerText) orElse
                  arrowUnionNone.findFirstMatchIn(headerText)).foreach { om =>
                if (keyValid && !decoPoisoned.contains(key))
                  returnAnnoRaw(key) = om.group(1)
              }
              // a property on anything but a directly-class-nested def
              // is out of the key space, same rule as the return maps
              if (pendingProp && keyValid && ctx.toSeq.nonEmpty)
                propertyDefsRaw += key
              pendingProp = false
              ctx.push((ind, dname, true))
            case _ =>
              if (!isDecorator) { pendingProp = false; pendingBadDeco = false }
              ownerDefKey.foreach { names =>
                val key = names.mkString(".")
                instanceAssign.findFirstMatchIn(ln).foreach(m =>
                  bodyLocals.getOrElseUpdate(key,
                    mutable.Map.empty)(m.group(1)) = m.group(2))
                localAnno.findFirstMatchIn(ln).foreach(m =>
                  bodyLocals.getOrElseUpdate(key,
                    mutable.Map.empty)(m.group(1)) = m.group(2))
                if (!returnInferredRaw.contains(key) &&
                    !decoPoisoned.contains(key)) {
                  returnCtor.findFirstMatchIn(ln).foreach { m =>
                    if (m.group(1) == "cls") {
                      // slice 18: classmethod factory `return cls()` —
                      // jedi binds cls to the enclosing class, so
                      // `x = X.make()` types x as X
                      val classes = names.dropRight(1)
                      if (classes.nonEmpty)
                        returnInferredRaw(key) = classes.mkString(".")
                    } else returnInferredRaw(key) = m.group(1)
                  }
                  returnName.findFirstMatchIn(ln).foreach { m =>
                    val n = m.group(1)
                    if (n == "self" || n == "cls") {
                      val classes = names.dropRight(1)
                      if (classes.nonEmpty)
                        returnInferredRaw(key) = classes.mkString(".")
                    } else bodyLocals.get(key).flatMap(_.get(n))
                      .foreach(t => returnInferredRaw(key) = t)
                  }
                  // r14 slice 79: `return self.field` — the getter
                  // idiom; resolved at consumption through the class's
                  // MRO'd field types (the field may be typed by a
                  // LATER-scanned method or a parent __init__)
                  if (!returnSelfFieldRaw.contains(key))
                    returnSelfField.findFirstMatchIn(ln).foreach(m =>
                      returnSelfFieldRaw(key) = m.group(1))
                  // r14 slice 82: ctor comprehension returns key the
                  // def's ELEMENT type (slice 70's map)
                  if (!returnElemRaw.contains(key))
                    returnCompCtor.findFirstMatchIn(ln).foreach(m =>
                      returnElemRaw(key) = m.group(1))
                }
                if (!yieldInferredRaw.contains(key) &&
                    !decoPoisoned.contains(key)) {
                  yieldCtor.findFirstMatchIn(ln).foreach(m =>
                    yieldInferredRaw(key) = m.group(1))
                  yieldName.findFirstMatchIn(ln).foreach(m =>
                    bodyLocals.get(key).flatMap(_.get(m.group(1)))
                      .foreach(t => yieldInferredRaw(key) = t))
                  // r14 slice 76: `yield from gen()` delegates
                  if (!yieldFromRaw.contains(key))
                    yieldFromDeleg.findFirstMatchIn(ln).foreach(m =>
                      yieldFromRaw(key) = m.group(1))
                }
              }
          }
        }
      }
    }

    // ---- main pass with context stack (C4)
    val stack = mutable.Stack.empty[Scope]
    def curClass: Option[Scope] = stack.find(_.kind == Kind.Class)
    def curCallable: Option[Scope] =
      stack.find(s => s.kind == Kind.Function || s.kind == Kind.Method)
    // reference drops module-level calls (myClient.py:291-297): source must
    // be CLASS/FUNCTION/METHOD
    def refSource: Option[Scope] =
      stack.headOption.filter(_.kind != Kind.Module)

    // C3 (partial): module-level instance globals — `db = Database()` at
    // module scope types `db` for `db.query()` calls in any callable
    // below (the singleton pattern jedi resolves in deep mode). Populated
    // just before the main pass, once imports are known.
    val moduleVarTypes = mutable.Map.empty[String, String]

    // C3 (partial): fold a dotted tail through typed-field bindings —
    // `x.conn.execute` with x: Database and Database.conn: Conn resolves
    // to Conn.execute (jedi's chained attribute access). ALL-or-nothing:
    // an untyped intermediate step yields None rather than a fabricated
    // half-resolved name like Database.conn.execute (which would merge
    // into a ghost stub node). The last segment (the member being
    // referenced) is never chased.
    // ---- C3 slice 23: same-file class MRO for inherited-member typing.
    // `classBases` (full class name → ordered, resolved base names) and
    // `classMethodsRaw` (full class name → def names) fill in a pre-pass
    // below (before the main pass), so a field typed in a BASE class's
    // __init__ — even a base defined LATER in the file — resolves
    // through a subclass instance, what jedi resolves via the class
    // hierarchy. The linearization is the same C3 merge the enrich-side
    // override detection uses ([[graft.enrich.Closure.c3Merge]]);
    // classes outside this file linearize as leaves.
    val classBases = mutable.Map.empty[String, Seq[String]]
    val classMethodsRaw = mutable.Map.empty[String, mutable.Set[String]]
    val mroMemo = mutable.Map.empty[String, Seq[String]]
    def mroOf(cls: String): Seq[String] = mroMemo.get(cls) match {
      case Some(m) => m
      case None =>
        mroMemo(cls) = Seq(cls) // cycle guard (illegal Python anyway)
        val bases = classBases.getOrElse(cls, Seq.empty)
        val res =
          if (bases.isEmpty) Seq(cls)
          else graft.enrich.Closure.c3Merge(cls,
            bases.map(b => mroOf(b).toList) :+ bases.toList)
        mroMemo(cls) = res
        res
    }
    /** First typed field OR @property named `field` along `cls`'s MRO —
      * the subclass's own binding shadows a base's (MRO order). */
    // r14 slices 65-66: a CROSS-MODULE class's annotated fields and
    // @property reads resolve through the corpus scan's field facts —
    // consulted PER MRO CLASS (slice 66: a local subclass of an
    // imported base inherits the base's declared fields; bases resolve
    // to fqns at the class header, so the local MRO carries them), with
    // local bindings shadowing in MRO order
    def corpusFieldOf(cls: String, field: String): Option[String] =
      if (cls.startsWith(mod + ".")) None
      else corpus.flatMap(_.fields.get(s"$cls.$field"))
        // r17 tier 3: stdlib receivers read typeshed's declared
        // attributes (Path.parent IS a Path)
        .orElse(typeshedAttrReturns.get(cls).flatMap(_.get(field)))
    def fieldTypeViaMro(cls: String, field: String): Option[String] =
      mroOf(cls).iterator
        .map(c => classFieldTypes.get(c).flatMap(_.get(field))
          .orElse(propertyTypeOf(c, field))
          .orElse(corpusFieldOf(c, field)))
        .collectFirst { case Some(t) => t }
    /** [[fieldTypeViaMro]] without the @property arm — for the chain
      * links that deliberately read plain typed fields only. */
    def fieldOnlyViaMro(cls: String, field: String): Option[String] =
      mroOf(cls).iterator
        .map(c => classFieldTypes.get(c).flatMap(_.get(field))
          .orElse(corpusFieldOf(c, field)))
        .collectFirst { case Some(t) => t }

    /** r12 slice 57: ELEMENT type of a container self-field along the
      * MRO — a base's build-up types a subclass's iteration. */
    def fieldElemViaMro(cls: String, field: String): Option[String] =
      mroOf(cls).iterator
        .map(c => classFieldElemTypes.get(c).flatMap(_.get(field)))
        .collectFirst { case Some(t) => t }

    def chaseFields(t0: String, rest: Seq[String]): Option[String] = {
      var t = t0
      var idx = 0
      while (idx < rest.length - 1) {
        fieldTypeViaMro(t, rest(idx)) match {
          case Some(n) => t = n; idx += 1
          case None => return None
        }
      }
      Some((t +: rest.drop(idx)).mkString("."))
    }

    def resolveCallee(dotted: String): Option[String] = {
      val parts = dotted.split("\\.")
      if ((dotted.startsWith("self.") || dotted.startsWith("cls.")) &&
          parts.length == 2)
        // `cls.m()` inside a classmethod binds like `self.m()` — the
        // enclosing class (r12 slice 58's classmethod arm)
        curClass.map(c => s"${c.fullName}.${parts(1)}")
      else if (parts.length >= 2 &&
          stack.exists(sc => (sc.kind == Kind.Function ||
            sc.kind == Kind.Method) && sc.locals.contains(parts(0))))
        // C3 (partial deep mode): `x.method()` where x was bound by a
        // constructor call in this callable — resolves as jedi inference
        // would for the direct-instantiation case. r14 slice 81: the
        // lookup walks OUT through enclosing callables (innermost
        // first, so shadowing wins) — a nested def reads its closure's
        // typed locals, jedi's lexical-scope resolution
        stack.find(sc => (sc.kind == Kind.Function ||
            sc.kind == Kind.Method) && sc.locals.contains(parts(0)))
          .flatMap(sc => chaseFields(sc.locals(parts(0)), parts.tail.toSeq))
      else if (parts.length >= 3 &&
          (parts(0) == "self" || parts(0) == "cls"))
        // C3 (partial): `self.field[.field…].method()` through
        // constructor-typed field bindings (or an @property descriptor,
        // slice 19) — looked up along the class's MRO (slice 23: a
        // field the PARENT's __init__ typed resolves through the
        // subclass instance)
        curClass.flatMap(c => fieldTypeViaMro(c.fullName, parts(1)))
          .flatMap(t => chaseFields(t, parts.drop(2).toSeq))
      else if (parts.length >= 2 && moduleVarTypes.contains(parts(0)))
        // C3 (partial): module-level instance global (`db = Database()`
        // singleton) — callable-locals above shadow it; an UNTYPED
        // rebinding in the callable does not (syntactic limit)
        chaseFields(moduleVarTypes(parts(0)), parts.tail.toSeq)
      else if (parts.length >= 2 && topClasses.contains(parts(0)))
        // slice 17: classmethod-style access on a local class —
        // `Cls.m()` is the class's member; `Cls.attr.m()` chases the
        // typed class attribute like a self-field
        chaseFields(s"$mod.${parts(0)}", parts.tail.toSeq)
      else if (parts.length == 1) {
        val n = parts(0)
        if (topDefs.contains(n)) Some(s"$mod.$n")
        else if (topClasses.contains(n)) Some(s"$mod.$n")
        else importedName.get(n)
      } else {
        // r14 slice 67: an imported MODULE SINGLETON's attribute chain
        // chases through the corpus scan's var type (`from mod_a import
        // db; db.conn.execute()` resolves Database.conn.execute instead
        // of fabricating mod_a.db.conn.execute) — the blind take stays
        // the fallback when the corpus typed nothing
        def viaVars(fqn: String, rest: Seq[String]): Option[String] =
          corpus.flatMap(_.vars.get(fqn)) match {
            case Some(cls) if rest.nonEmpty => chaseFields(cls, rest)
            case _ =>
              // slice 95 (r18): PEP 562 — the target module is open
              // via a module-level __getattr__ with a PINNED type and
              // the attribute is NOT a real top-level binding, so the
              // dynamic attribute types as the pinned class (jedi's
              // module-attribute resolution through the annotated
              // fallback); un-pinned modules keep the blind take
              val i = fqn.lastIndexOf('.')
              val ga =
                if (i <= 0) None
                else {
                  val (m, nm) = (fqn.substring(0, i), fqn.substring(i + 1))
                  corpus.flatMap(c => c.getattrs.get(m).filterNot(_ =>
                    c.getattrNames.getOrElse(m, Set.empty)(nm)))
                }
              ga match {
                case Some(cls) if rest.nonEmpty => chaseFields(cls, rest)
                case _ => Some((fqn +: rest).mkString("."))
              }
          }
        // longest-prefix match against imported module bindings, so both
        // `import a.b.c` (binds a.b.c) and `import a.b as x` (binds x)
        // resolve dotted call chains
        (parts.length - 1 to 1 by -1).iterator
          .map(i => (parts.take(i).mkString("."), parts.drop(i)))
          .collectFirst { case (prefix, rest) if importedModule.contains(prefix) =>
            viaVars(s"${importedModule(prefix)}.${rest.head}", rest.tail.toSeq)
          }.flatten
          .orElse {
            // `from m import X` + `X.method(...)`
            importedName.get(parts(0))
              .flatMap(t => viaVars(t, parts.tail.toSeq))
          }
      }
    }

    def classishType(anno0: String): Option[String] = {
      // r12 slice 58: PEP 484 QUOTED forward references (`c: "Conn"`) —
      // preprocess preserves annotation-position string contents; the
      // quotes strip here (a type expression never contains them)
      val anno = anno0.replaceAll("[\"']", "").trim
      val classish = topClasses.contains(anno) ||
        anno.split("\\.").last.headOption.exists(_.isUpper)
      if (anno.nonEmpty && !keywords.contains(anno) && classish)
        resolveCallee(anno)
      else None
    }

    /** The class name inside an annotation text: unwraps `Optional[X]`
      * and the PEP 604 `X | None` / `None | X` spellings (slice 21's
      * non-None-arm reading), then routes through [[classishType]]. */
    def annoCoreType(anno0: String): Option[String] = {
      val a = anno0.replaceAll("[\"']", "").trim // slice 58: forward refs
      val opt = """^(?i)Optional\[\s*([\w.]+)\s*\]$""".r
      val core = a match {
        case opt(x) => x
        case _ =>
          val parts = a.split("\\|").map(_.trim).filter(_ != "None")
          if (parts.length == 1) parts(0) else a
      }
      if (core.matches("""[A-Za-z_][\w.]*""")) classishType(core) else None
    }

    /** C3 slice 24 — `typing.cast`: `x = cast(Helper, y)` (also the
      * quoted forward-reference `cast("Helper", y)`, any import alias,
      * and `typing.cast(…)`) types the target as the cast's FIRST
      * argument — jedi honors the declared type over inference. Reads
      * the RAW line because [[preprocess]] blanks string contents (the
      * quoted form would otherwise be invisible); offsets agree, the
      * blanking is 1:1. Only the imported typing function binds. */
    def castTarget(rawLine: String, callee: String,
        afterOpen: Int): Option[String] = {
      val isCast = importedName.get(callee).contains("typing.cast") ||
        (callee == "typing.cast" && importedModule.contains("typing"))
      if (!isCast) None
      else {
        var j = afterOpen
        var depth = 0
        var end = -1
        while (j < rawLine.length && end < 0) {
          val c = rawLine.charAt(j)
          if (c == '(') depth += 1
          else if (c == ')') { if (depth == 0) end = j else depth -= 1 }
          else if (c == ',' && depth == 0) end = j
          j += 1
        }
        if (end < 0) None
        else {
          val raw = rawLine.substring(afterOpen, end).trim
          val nm = if (raw.length >= 2 &&
              ((raw.head == '"' && raw.last == '"') ||
                (raw.head == '\'' && raw.last == '\'')))
            raw.substring(1, raw.length - 1).trim else raw
          if (nm.matches("""[A-Za-z_][\w.]*""")) classishType(nm) else None
        }
      }
    }

    // C3 slice 19: attribute READ through an @property method of a
    // same-module class — the descriptor's declared (or slice-8
    // inferred) return type IS the attribute's type
    def propertyTypeOf(owner: String, attr: String): Option[String] =
      if (!owner.startsWith(mod + ".")) None
      else {
        val k = owner.stripPrefix(mod + ".") + "." + attr
        if (!propertyDefsRaw.contains(k)) None
        else returnAnnoRaw.get(k).orElse(returnInferredRaw.get(k))
          .flatMap(classishType)
          // r14 slice 82: a property whose body is `return self._f`
          // (the canonical descriptor-over-private-field idiom) carries
          // the backing field's type; the lookup deliberately consults
          // PLAIN fields only (never another property) so a
          // self-referential descriptor can't recurse
          .orElse(returnSelfFieldRaw.get(k).flatMap { f =>
            mroOf(owner).iterator
              .flatMap(c => classFieldTypes.get(c).flatMap(_.get(f)))
              .nextOption()
          })
      }

    // declared `-> Type` of a called same-module function/method:
    // `x = make()` with `def make() -> Helper:` binds x to Helper;
    // with no annotation, the INFERRED return (slice 8: the def's
    // `return Ctor()` / typed-name / self body) fills in. r14 slice 63:
    // an IMPORTED top-level factory resolves through the corpus scan's
    // declared-return facts (`from db import open_conn` then
    // `c = open_conn()` types c db.Conn when open_conn's `-> Conn`
    // resolves to a class of ITS OWN module) — the fqn is already
    // module-qualified, member calls then flow the chaseFields path
    // under the slice-54 enrich verification
    def returnTypeTarget(callee: String): Option[String] =
      if (keywords.contains(callee)) None
      else resolveCallee(callee).flatMap { cf =>
        if (cf.startsWith(mod + ".")) {
          val k = cf.stripPrefix(mod + ".")
          // slice 85b: the corpus fold resolved the SAME declared arrow
          // with every module's class set visible (facade re-exports
          // chased to the defining module — `from pkg import User`
          // where pkg/__init__.py re-exports core.User types core.User,
          // not the pkg.User stub the local optimism would bind), so a
          // fold fact for an own TOP-LEVEL def wins — top-level defs
          // cannot be overridden, so the fold fact is always the same
          // arrow. METHOD keys stay local-first: the MRO-flattened fold
          // could carry an ancestor's fact past an un-annotated local
          // override (shadowing must win). Keys the scan doesn't cover
          // (nested defs, inferred returns, getters) keep the local
          // chain either way.
          val fold = corpus.flatMap(_.returns.get(cf))
          val local = returnAnnoRaw.get(k).orElse(returnInferredRaw.get(k))
            .flatMap(classishType)
          (if (k.contains(".")) local.orElse(fold)
           else fold.orElse(local))
            // r14 slice 79: `return self.field` getters
            .orElse(returnSelfFieldRaw.get(k).flatMap { f =>
              val cls = k.split("\\.").dropRight(1)
              if (cls.isEmpty) None
              else fieldTypeViaMro(mod + "." + cls.mkString("."), f)
            })
        } else corpus.flatMap(_.returns.get(cf))
      }

    /** C3 slice 45 — stdlib factory returns through the typeshed-lite
      * table: `p = re.compile(r)` types p as re.Pattern when `re` (or
      * an alias / `from` import of it) resolves the callee; builtins
      * like `open` bind only when no local def/class/import shadows
      * the name — jedi's own shadowing rule. */
    def typeshedReturnTarget(callee: String): Option[String] =
      if (keywords.contains(callee)) None
      else resolveCallee(callee).flatMap(typeshedReturns.get)
        .orElse {
          if (!callee.contains(".") && !topDefs.contains(callee) &&
              !topClasses.contains(callee) && !importedName.contains(callee))
            typeshedBuiltins.get(callee)
          else None
        }

    /** C3 slice 30 — the yield (iteration) type of a same-module
      * generator, resolving method callees (`self.gen` / `obj.gen`)
      * through the same key space as [[returnTypeTarget]]. */
    def yieldTypeTarget(callee: String): Option[String] =
      if (keywords.contains(callee)) None
      else resolveCallee(callee)
        .filter(_.startsWith(mod + "."))
        .flatMap { cf =>
          // r14 slice 76: follow `yield from` delegation (≤3 hops,
          // cycle-safe) to the first own yield type; a delegation
          // landing on a declared-container def yields its element
          var key = cf.stripPrefix(mod + ".")
          val seen = mutable.Set.empty[String]
          var out = yieldInferredRaw.get(key)
          var hops = 0
          while (out.isEmpty && hops < 3 && seen.add(key) &&
              yieldFromRaw.contains(key)) {
            val next = yieldFromRaw(key)
            if (topDefs.contains(next)) {
              key = next
              out = yieldInferredRaw.get(key)
                .orElse(returnElemRaw.get(key))
            } else hops = 3
            hops += 1
          }
          out
        }
        .flatMap(classishType)

    /** r14 slice 70 — the ELEMENT type of a callee declared to return
      * a container (`def all() -> list[User]`): iterating or
      * subscripting the call result yields User (jedi's generic-alias
      * element inference for the declared case). r15 slice 87: a
      * CROSS-MODULE callee resolves through the corpus scan's
      * container-return facts (element already a resolved fqn). */
    def returnElemTarget(callee: String): Option[String] =
      if (keywords.contains(callee)) None
      else resolveCallee(callee).flatMap { cf =>
        if (cf.startsWith(mod + ".")) {
          // the returnTypeTarget slice-85b rule: fold-first for
          // top-level defs, local-first for method keys (shadowing)
          val k = cf.stripPrefix(mod + ".")
          val fold = corpus.flatMap(_.returnElems.get(cf))
          val local = returnElemRaw.get(k).flatMap(classishType)
          if (k.contains(".")) local.orElse(fold) else fold.orElse(local)
        } else corpus.flatMap(_.returnElems.get(cf))
          // r17 tier 3: stdlib iterator factories (Path.glob and kin)
          // yield what their typeshed stubs declare
          .orElse(typeshedElemReturns.get(cf))
      }

    // C3 slice 10: the return type of `<T>.method()` — same-module
    // receiver classes only (cross-file returns stay out of scope, the
    // declared-annotation slice's rule), declared `->` beating the
    // inferred body type like every other use site. Slice 23: the
    // return comes from the class that DEFINES the method first along
    // the receiver's MRO — a subclass def shadows a base's even when
    // un-annotated (Python's override semantics), a base-only def
    // resolves through the subclass receiver.
    def methodReturn(recv: String, method: String): Option[String] = {
      // slice 66: a CROSS-MODULE MRO class defines the method when the
      // corpus scan keyed its declared return — a local subclass of an
      // imported base resolves the base's `-> Class` methods
      // own-module classes qualify through their LOCAL defs only: the
      // slice-83 flatten keys inherited facts under local subclasses
      // too, and letting those nominate an own-module definer would
      // route into the local arm below, which (correctly) never reads
      // corpus facts for classes this file defines
      val definer = mroOf(recv)
        .find(c => classMethodsRaw.get(c).exists(_.contains(method)) ||
          (!c.startsWith(mod + ".") &&
            corpus.exists(_.returns.contains(s"$c.$method"))))
        .getOrElse(recv)
      if (!definer.startsWith(mod + "."))
        // slice 45: a stdlib receiver's member returns what its
        // typeshed stub declares (re.Pattern.match → re.Match);
        // r14 slice 64: a CORPUS receiver's method returns its scanned
        // declared `-> Class` (resolved in the defining module), so
        // `c = db_client.cursor()` types through a cross-module class
        typeshedMethodReturns.get(definer).flatMap(_.get(method))
          .orElse(corpus.flatMap(_.returns.get(s"$definer.$method")))
      else {
        val k = definer.stripPrefix(mod + ".") + "." + method
        returnAnnoRaw.get(k).orElse(returnInferredRaw.get(k))
          .flatMap(classishType)
          // r14 slice 79: `return self.field` getters
          .orElse(returnSelfFieldRaw.get(k)
            .flatMap(f => fieldTypeViaMro(definer, f)))
      }
    }

    /** C3 slices 10+13, the one-line chain: given a binding whose RHS
      * head call starts at `afterOpen` (index just past the head's `(`),
      * fold trailing links through the current chain type —
      * `.method()` via [[methodReturn]] (slice 10) and plain `.attr`
      * via the class's typed FIELDS (slice 13: `x = a.b().c`, jedi's
      * chained resolution over attributes, indexer_visitor.py:183-241).
      * No chain → the head's own type stands; an unresolvable link or a
      * subscript trailer (`[0]`) → None — all-or-nothing, a mis-typed
      * `x = Service().connect()` (or an UNTYPED middle attribute) must
      * not stay bound partway. An unbalanced head call (physical-line
      * continuation) keeps the pre-slice-10 behavior: the head type
      * binds, the invisible tail is a silent miss. */
    def chainReturnType(line: String, afterOpen: Int,
        base: Option[String]): Option[String] = {
      def closeOf(from: Int): Int = {
        var j = from
        var depth = 1
        while (j < line.length && depth > 0) {
          val c = line.charAt(j)
          if (c == '(') depth += 1 else if (c == ')') depth -= 1
          j += 1
        }
        if (depth == 0) j else -1
      }
      val headEnd = closeOf(afterOpen)
      if (headEnd < 0) return base
      val linkCall = """^\s*\.\s*([A-Za-z_]\w*)\s*\(""".r
      val linkAttr = """^\s*\.\s*([A-Za-z_]\w*)""".r
      var t = base
      var pos = headEnd
      while (pos < line.length && !line.substring(pos).trim.isEmpty) {
        val rest = line.substring(pos)
        linkCall.findFirstMatchIn(rest) match {
          case Some(mm) =>
            t = t.flatMap(methodReturn(_, mm.group(1)))
            if (t.isEmpty) return None
            pos = closeOf(pos + mm.end)
            if (pos < 0) return None
          case None => linkAttr.findFirstMatchIn(rest) match {
            case Some(mm) =>
              // slice 13: a non-call `.attr` link reads a typed field of
              // the chain's current class (through its MRO, slice 23);
              // untyped field → refuse
              t = t.flatMap(fieldOnlyViaMro(_, mm.group(1)))
              if (t.isEmpty) return None
              pos = pos + mm.end
            case None =>
              // `[0]` trailers: the bound value is NOT the chain result —
              // refuse rather than mis-type. Any other trailer (`;`, a
              // ternary, …) keeps the current binding, the pre-slice-10
              // behavior for those shapes.
              return if (rest.trim.head == '[') None else t
          }
        }
      }
      t
    }

    /** C3 slice 13, the head: `x = recv.path.m()` — a method call whose
      * RECEIVER is a typed local / `self` / typed-field path rather than
      * a constructor or bare callee (`self.f.m()`, `db.session().q()`'s
      * head `db.session`). Every intermediate step must be a typed field
      * and the final link a resolvable same-module method return —
      * all-or-nothing, like every other slice. `baseOf` supplies the
      * first segment's type from the enclosing scope. */
    def attrCallHead(callee: String,
        baseOf: String => Option[String]): Option[String] = {
      val parts = callee.split("\\.").toSeq
      if (parts.length < 2) None
      else baseOf(parts.head)
        .flatMap(b => parts.tail.dropRight(1).foldLeft(Option(b)) { (acc, p) =>
          acc.flatMap(fieldOnlyViaMro(_, p))
        })
        .flatMap(recv => methodReturn(recv, parts.last))
    }

    lines.indices.foreach { li =>
      if (!cont(li) && lines(li).trim.nonEmpty && indentOf(lines(li)) == 0)
        instanceAssign.findFirstMatchIn(lines(li)).foreach { m =>
          val callee = m.group(2)
          // module-level globals keep the ctor-only rule (no function
          // return chasing at module scope), but a trailing method chain
          // folds — or voids — the binding exactly as in a callable
          chainReturnType(lines(li), m.end, classishType(callee))
            .foreach(t => moduleVarTypes(m.group(1)) = t)
        }
    }

    // ---- C3 slice 23 pre-pass: class base lists, per-class def names,
    // and constructor-typed self-fields for EVERY class — BEFORE the
    // main pass, so MRO lookups see a base defined anywhere in the
    // file. Scope chain mirrors the main pass exactly (full names
    // through the enclosing scope's full name, defs included), so the
    // keys here are the same names the main pass emits. Resolution is
    // context-free at this point (the scope stack is empty): imports,
    // top-level classes and the return-annotation maps are all
    // populated, and locals-dependent shapes (`self.f = param`) stay a
    // main-pass-only refinement.
    locally {
      val ctx = mutable.Stack.empty[(Int, String, Boolean)] // ind, full, isClass
      lines.indices.foreach { li =>
        val ln = lines(li)
        if (!cont(li) && ln.trim.nonEmpty) {
          val ind = indentOf(ln)
          while (ctx.nonEmpty && ind <= ctx.top._1) ctx.pop()
          def parentFull = ctx.headOption.map(_._2).getOrElse(mod)
          ln match {
            case classHeader(_, name, _) =>
              val full = s"$parentFull.$name"
              val bases = parenSpan(joinedHeader(li)).split(",").map(_.trim)
                .filter(b => b.nonEmpty && b != "object" && !b.contains("="))
                .map(b => resolveCallee(b).getOrElse(
                  if (b.contains(".")) b else s"$mod.$b")).toSeq
              if (bases.nonEmpty) classBases(full) = bases
              ctx.push((ind, full, true))
            case defHeader(_, name) =>
              if (ctx.headOption.exists(_._3))
                classMethodsRaw.getOrElseUpdate(parentFull,
                  mutable.Set.empty) += name
              ctx.push((ind, s"$parentFull.$name", false))
            case _ =>
              val inMethod = ctx.toSeq.exists(_._3) &&
                ctx.headOption.exists(!_._3)
              if (inMethod) ctx.find(_._3).map(_._2).foreach { cls =>
                selfInstanceAssign.findAllMatchIn(ln).foreach { m =>
                  chainReturnType(ln, m.end,
                      classishType(m.group(2))
                        .orElse(returnTypeTarget(m.group(2)))
                    .orElse(typeshedReturnTarget(m.group(2))))
                    .foreach(t => classFieldTypes.getOrElseUpdate(cls,
                      mutable.Map.empty)(m.group(1)) = t)
                }
                // r14 slice 78: or-default fields take the constructed arm
                selfOrDefaultAssign.findAllMatchIn(ln).foreach { m =>
                  classishType(m.group(2)).foreach(t =>
                    classFieldTypes.getOrElseUpdate(cls,
                      mutable.Map.empty)(m.group(1)) = t)
                }
                // annotated fields join the pre-pass too, so a base's
                // `self.f: T = …` resolves through subclasses (slice 23)
                selfAnnoAssign.findAllMatchIn(ln).foreach { m =>
                  annoCoreType(m.group(2)).foreach(t =>
                    classFieldTypes.getOrElseUpdate(cls,
                      mutable.Map.empty)(m.group(1)) = t)
                }
                // r12 slice 57: container self-field build-up writes —
                // first resolvable write wins (slice 46's rule)
                selfContainerWrite.findAllMatchIn(ln).foreach { m =>
                  classishType(m.group(2)).foreach { t =>
                    val fm = classFieldElemTypes.getOrElseUpdate(cls,
                      mutable.Map.empty)
                    if (!fm.contains(m.group(1))) fm(m.group(1)) = t
                  }
                }
              }
          }
        }
      }
      // chain resolution above may have consulted MROs while classBases
      // was still filling — drop any prematurely-memoized linearization
      mroMemo.clear()
    }

    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (line.trim.nonEmpty) {
        val ind = indentOf(line)
        // continuation lines (open bracket / trailing backslash) have no
        // structural meaning: no scope pops, no header/assign matching
        if (!cont(i)) {
        while (stack.nonEmpty && ind <= stack.top.indent) stack.pop()
        // r17 slice 94: expire branch-scoped isinstance narrows — a
        // line at or above a guard's indent is outside its branch, so
        // the tested name reverts to its pre-guard binding
        stack.foreach { sc =>
          while (sc.narrowRestores.nonEmpty &&
              ind <= sc.narrowRestores.top._1) {
            val (_, n, prev) = sc.narrowRestores.pop()
            prev match {
              case Some(t) => sc.locals(n) = t
              case None => sc.locals.remove(n)
            }
          }
        }

        line match {
          case classHeader(_, name, _) =>
            val parent = stack.headOption.map(_.fullName).getOrElse(mod)
            val full = s"$parent.$name"
            val end = scopeEnd(lines, cont, i, ind)
            val sig = rawLines(i).trim
            symbols += SymbolEvent(nextSeq(), taskId, Kind.Class, full, name,
              Some(relPath), Some(sig), None, Some(codePtr(i + 1, end, relPath)), Map.empty)
            locs += LocationRow(full, relPath, "SYMBOL", i + 1,
              rawLines(i).indexOf(name) + 1, i + 1, rawLines(i).indexOf(name) + name.length)
            locs += LocationRow(full, relPath, "SIGNATURE", i + 1, 1, i + 1, rawLines(i).length)
            locs += LocationRow(full, relPath, "SCOPE", i + 1, 1, end, 1)
            if (stack.isEmpty)
              edges += EdgeEvent(nextSeq(), taskId, mod, Rel.Contains, full,
                Map("association_type" -> Kind.Class))
            // C7 — INHERITS per base (simple or dotted, import-resolved;
            // unresolved stays as written -> stub node, like
            // ast_manage.py:190-195 appending unresolved bases). The base
            // list comes from the JOINED logical header, so multi-line
            // `class Foo(\n  Base,\n):` headers inherit too (ADVICE r4).
            val headerText = joinedHeader(i)
            parenSpan(headerText).split(",").map(_.trim)
              .filter(b => b.nonEmpty && b != "object" && !b.contains("="))
              .zipWithIndex
              .foreach { case (b, bi) =>
                val resolved = resolveCallee(b).getOrElse(
                  if (b.contains(".")) b else s"$mod.$b")
                // base POSITION rides on the edge: Python's MRO (C3
                // linearization) consults base order, so override
                // resolution downstream (Closure.overrides) needs it
                edges += EdgeEvent(nextSeq(), taskId, full, Rel.Inherits,
                  resolved, Map("ord" -> bi.toString))
              }
            stack.push(Scope(Kind.Class, full, ind))

          case defHeader(_, name) =>
            val inClass = stack.headOption.exists(_.kind == Kind.Class)
            val kind = if (inClass) Kind.Method else Kind.Function
            val parent = stack.headOption.map(_.fullName).getOrElse(mod)
            val full = s"$parent.$name"
            val end = scopeEnd(lines, cont, i, ind)
            val sig = rawLines(i).trim
            val clazz = if (inClass) Some(parent) else None
            symbols += SymbolEvent(nextSeq(), taskId, kind, full, name,
              Some(relPath), Some(sig), clazz, Some(codePtr(i + 1, end, relPath)), Map.empty)
            locs += LocationRow(full, relPath, "SYMBOL", i + 1,
              rawLines(i).indexOf(name) + 1, i + 1, rawLines(i).indexOf(name) + name.length)
            locs += LocationRow(full, relPath, "SIGNATURE", i + 1, 1, i + 1, rawLines(i).length)
            locs += LocationRow(full, relPath, "SCOPE", i + 1, 1, end, 1)
            if (inClass) {
              edges += EdgeEvent(nextSeq(), taskId, parent, Rel.HasMethod, full, Map.empty)
              classMethods.getOrElseUpdate(parent, mutable.Set.empty) += name
            } else if (stack.isEmpty)
              edges += EdgeEvent(nextSeq(), taskId, mod, Rel.Contains, full,
                Map("association_type" -> kind))
            val fnScope = Scope(kind, full, ind)
            // C3 (partial deep mode): PEP 484 parameter annotations bind
            // param types for the body — `def f(h: Helper)` makes
            // `h.run()` resolve to Helper.run. The logical header spans
            // this line plus its bracket-continuation lines.
            val headerText = joinedHeader(i)
            paramAnno.findAllMatchIn(headerText).foreach { m =>
              val anno = m.group(2)
              val classish = topClasses.contains(anno) ||
                anno.split("\\.").last.headOption.exists(_.isUpper)
              if (!keywords.contains(anno) && classish)
                resolveCallee(anno).foreach(t => fnScope.locals(m.group(1)) = t)
            }
            // slice 21: Optional[X] / X | None params type as X (jedi
            // resolves members through the non-None arm)
            (optionalAnno.findAllMatchIn(headerText).map(m =>
                (m.group(1), m.group(2))) ++
              unionNoneAnno.findAllMatchIn(headerText).map(m =>
                (m.group(1), Option(m.group(2)).getOrElse(m.group(3)))))
              .foreach { case (nm, anno) =>
                val classish = topClasses.contains(anno) ||
                  anno.split("\\.").last.headOption.exists(_.isUpper)
                if (!keywords.contains(anno) && classish)
                  resolveCallee(anno).foreach(t => fnScope.locals(nm) = t)
              }
            // slice 9: container-annotated params bind their ELEMENT type
            // (`def f(xs: list[Helper])` → iterating/subscripting xs
            // yields Helper-typed names)
            containerAnno.findAllMatchIn(headerText).foreach { m =>
              val anno = m.group(2)
              val classish = topClasses.contains(anno) ||
                anno.split("\\.").last.headOption.exists(_.isUpper)
              if (!keywords.contains(anno) && classish)
                resolveCallee(anno).foreach(t =>
                  fnScope.elemLocals(m.group(1)) = t)
            }
            // slice 28: mapping-annotated params bind their VALUE type
            mappingAnno.findAllMatchIn(headerText).foreach { m =>
              val anno = m.group(2)
              val classish = topClasses.contains(anno) ||
                anno.split("\\.").last.headOption.exists(_.isUpper)
              if (!keywords.contains(anno) && classish)
                resolveCallee(anno).foreach(t =>
                  fnScope.valueLocals(m.group(1)) = t)
            }
            // slice 36: `*args: T` is a tuple OF T (element binding),
            // `**kw: T` a str→T mapping (value binding) — both override
            // the plain paramAnno direct bind their name also matched
            starParamAnno.findAllMatchIn(headerText).foreach { m =>
              val anno = m.group(2)
              val classish = topClasses.contains(anno) ||
                anno.split("\\.").last.headOption.exists(_.isUpper)
              if (!keywords.contains(anno) && classish)
                resolveCallee(anno).foreach { t =>
                  fnScope.locals.remove(m.group(1))
                  fnScope.elemLocals(m.group(1)) = t
                }
            }
            dstarParamAnno.findAllMatchIn(headerText).foreach { m =>
              val anno = m.group(2)
              val classish = topClasses.contains(anno) ||
                anno.split("\\.").last.headOption.exists(_.isUpper)
              if (!keywords.contains(anno) && classish)
                resolveCallee(anno).foreach { t =>
                  fnScope.locals.remove(m.group(1))
                  fnScope.valueLocals(m.group(1)) = t
                }
            }
            // slice 37: an unannotated param with a CONSTRUCTOR default
            // (`def f(h=Helper()):`) types from the default — an
            // explicit annotation (already bound above) wins
            // matched per TOP-LEVEL parameter piece, not over the raw
            // span: a keyword argument of a nested default call
            // (`def f(t=compute(retries=Backoff())):`) must not bind
            // `retries` as a typed local
            splitTopLevel(parenSpan(headerText)).map(_.trim)
              .foreach { piece =>
                paramCtorDefault.findFirstMatchIn(piece)
                  .filter(_.start == 0)
                  .foreach { m =>
                    val anno = m.group(2)
                    val classish = topClasses.contains(anno) ||
                      anno.split("\\.").last.headOption.exists(_.isUpper)
                    if (!fnScope.locals.contains(m.group(1)) &&
                        !fnScope.elemLocals.contains(m.group(1)) &&
                        !fnScope.valueLocals.contains(m.group(1)) &&
                        !keywords.contains(anno) && classish)
                      resolveCallee(anno).foreach(t =>
                        fnScope.locals(m.group(1)) = t)
                  }
              }
            // r16 slices 90/92: call-site inferred params — top-level
            // defs and first-level class methods (the dynParams key
            // space); annotations, defaults and the container/mapping
            // channels above all win
            locally {
              val dynKey =
                if (!inClass && stack.isEmpty) Some(name)
                else if (inClass && stack.size == 1)
                  Some(s"${parent.split("\\.").last}.$name")
                else None
              dynKey.map(dynParams.getOrElse(_, Map.empty))
                .getOrElse(Map.empty).foreach { case (pn, head) =>
                  if (!fnScope.locals.contains(pn) &&
                      !fnScope.elemLocals.contains(pn) &&
                      !fnScope.valueLocals.contains(pn))
                    resolveCallee(head).foreach(t =>
                      fnScope.locals(pn) = t)
                }
            }
            // A9/srctrl LOCAL symbols: every parameter (incl. self) is a
            // function-local — the reference records one local-symbol row
            // per param (shallow_indexer.py:394-397) and seeds the
            // context's localSymbolNames with them (:363-374). Position =
            // the param's first bare-word occurrence in the (possibly
            // multi-line) header, after the opening paren.
            splitTopLevel(parenSpan(headerText))
              .flatMap(p => paramName.findFirstMatchIn(p.trim).map(_.group(1)))
              .foreach { p =>
                var h = i
                var cpos = -1
                while (cpos < 0 && h < rawLines.length &&
                    (h == i || cont(h))) {
                  val from = if (h == i) rawLines(h).indexOf('(') + 1 else 0
                  cpos = wordPos(rawLines(h), p, from)
                  if (cpos < 0) h += 1
                }
                if (cpos >= 0) {
                  locs += LocationRow(s"$full<$p>", relPath, "LOCAL",
                    h + 1, cpos + 1, h + 1, cpos + p.length)
                  localDefPos += ((h + 1, cpos + 1))
                }
                fnScope.localNames += p
              }
            stack.push(fnScope)

          case assignStmt(_, name)
              if stack.isEmpty && !keywords.contains(name) =>
            val full = s"$mod.$name"
            if (!topDefs.contains(name) && !topClasses.contains(name)) {
              symbols += SymbolEvent(nextSeq(), taskId, Kind.GlobalVariable, full,
                name, Some(relPath), None, None, None, Map.empty)
              locs += LocationRow(full, relPath, "SYMBOL", i + 1, 1, i + 1,
                rawLines(i).length)
              edges += EdgeEvent(nextSeq(), taskId, mod, Rel.Contains, full,
                Map("association_type" -> Kind.GlobalVariable))
            }

          case assignStmt(_, name)
              if stack.headOption.exists(_.kind == Kind.Class) &&
                !keywords.contains(name) =>
            // class-level assignment -> FIELD (shallow_indexer static member)
            val cls = stack.top.fullName
            val full = s"$cls.$name"
            symbols += SymbolEvent(nextSeq(), taskId, Kind.Field, full, name,
              Some(relPath), None, Some(cls), None, Map.empty)
            edges += EdgeEvent(nextSeq(), taskId, cls, Rel.HasField, full, Map.empty)
            classFields.getOrElseUpdate(cls, mutable.Set.empty) += name
            // an annotated assignment (`h: Helper = make()`) also types the
            // field for self.h.method() resolution
            paramAnno.findFirstMatchIn(line).filter(_.group(1) == name)
              .foreach { m =>
                val anno = m.group(2)
                if (!keywords.contains(anno) &&
                    (topClasses.contains(anno) ||
                      anno.split("\\.").last.headOption.exists(_.isUpper)))
                  resolveCallee(anno).foreach(t =>
                    classFieldTypes.getOrElseUpdate(cls,
                      mutable.Map.empty)(name) = t)
              }
            // slice 17: an UNANNOTATED class-body constructor assignment
            // (`x = Helper()`) types the class attribute exactly like a
            // constructor-typed self-field, so `self.x.m()` / `o.x.m()` /
            // `Cls.x.m()` chase through it (jedi resolves all three)
            instanceAssign.findFirstMatchIn(line).filter(_.group(1) == name)
              .foreach { m =>
                classishType(m.group(2)).foreach(t =>
                  classFieldTypes.getOrElseUpdate(cls,
                    mutable.Map.empty)(name) = t)
              }

          case classAnnoBare(_, name, anno)
              if stack.headOption.exists(_.kind == Kind.Class) &&
                !keywords.contains(name) =>
            // bare dataclass-style annotation -> FIELD (annassign is a
            // definition in parso) + type binding
            val cls = stack.top.fullName
            val full = s"$cls.$name"
            symbols += SymbolEvent(nextSeq(), taskId, Kind.Field, full, name,
              Some(relPath), None, Some(cls), None, Map.empty)
            edges += EdgeEvent(nextSeq(), taskId, cls, Rel.HasField, full, Map.empty)
            classFields.getOrElseUpdate(cls, mutable.Set.empty) += name
            if (!keywords.contains(anno) &&
                (topClasses.contains(anno) ||
                  anno.split("\\.").last.headOption.exists(_.isUpper)))
              resolveCallee(anno).foreach(t =>
                classFieldTypes.getOrElseUpdate(cls, mutable.Map.empty)(name) = t)

          case forStmt(_, name)
              if stack.isEmpty && !keywords.contains(name) &&
                !topDefs.contains(name) && !topClasses.contains(name) =>
            // module-level for-target → GLOBAL_VARIABLE (reference shallow
            // mode records any module-scope definition as one)
            val full = s"$mod.$name"
            symbols += SymbolEvent(nextSeq(), taskId, Kind.GlobalVariable, full,
              name, Some(relPath), None, None, None, Map.empty)
            locs += LocationRow(full, relPath, "SYMBOL", i + 1, 1, i + 1,
              rawLines(i).length)
            edges += EdgeEvent(nextSeq(), taskId, mod, Rel.Contains, full,
              Map("association_type" -> Kind.GlobalVariable))

          // A9/srctrl LOCAL symbols: a plain name bound directly inside a
          // funcdef (assignment / for-target) is a local-symbol definition
          // (shallow_indexer.py:473-475: non-member definitions record a
          // local symbol + location and join localSymbolNames; member
          // `self.x` / `x.attr` targets never match [[assignStmt]]).
          // Every re-binding records another row, as the reference does.
          case assignStmt(_, name)
              if stack.headOption.exists(sc =>
                sc.kind == Kind.Method || sc.kind == Kind.Function) &&
                !keywords.contains(name) =>
            recordLocalDef(stack.top, name, i)

          case forStmt(_, name)
              if stack.headOption.exists(sc =>
                sc.kind == Kind.Method || sc.kind == Kind.Function) &&
                !keywords.contains(name) =>
            recordLocalDef(stack.top, name, i)

          // `except E as e:` — the handler target is a local definition
          // inside the callable (jedi names it like any other binding)
          case exceptAs(_, name)
              if stack.headOption.exists(sc =>
                sc.kind == Kind.Method || sc.kind == Kind.Function) &&
                !keywords.contains(name) =>
            recordLocalDef(stack.top, name, i)

          // `case Cls(...) as x:` — the capture is a local definition
          // (slice 35's location twin of the except-as rule)
          case matchCaseAs(_, name)
              if stack.headOption.exists(sc =>
                sc.kind == Kind.Method || sc.kind == Kind.Function) &&
                !keywords.contains(name) =>
            recordLocalDef(stack.top, name, i)

          // tuple-unpack targets (`a, b = …`) are each a local definition
          // (the reference's visitName walks every target of the
          // testlist, shallow_indexer.py:486-494)
          case tupleTargetsAssign(targets, _)
              if stack.headOption.exists(sc =>
                sc.kind == Kind.Method || sc.kind == Kind.Function) =>
            targets.split(",").map(_.trim)
              .filter(t => t.nonEmpty && !keywords.contains(t))
              .foreach(t => recordLocalDef(stack.top, t, i))

          case _ => ()
        }

        // C3 (partial deep mode): `x = ClassName(...)` inside a callable
        // binds x's type for later `x.method()` resolution — the
        // direct-constructor slice of what jedi inference gives the
        // reference's deep mode (indexer_visitor.py:53-140). Guarded by
        // the PEP8 capitalized-class convention for imported names (a
        // local name only binds if it IS a known class).
        curCallable.foreach { fn =>
          // r17 slice 95: a REBINDING assignment (or `del`) INVALIDATES
          // the target's old type before the typing handlers below
          // re-bind it — jedi re-infers per assignment, so after
          // `x = unknown()` / `x = None` / `del x` a member read must
          // not resolve through the stale class (it fabricated edges to
          // a type the value no longer has). A RHS that references the
          // target itself (`x = x.next()`) skips the clear so the
          // handlers can still read the old binding.
          def invalidate(n: String): Unit = {
            fn.locals.remove(n); fn.elemLocals.remove(n)
            fn.valueLocals.remove(n); fn.classAliases.remove(n)
            fn.methodRefs.remove(n); ()
          }
          delStmt.findFirstMatchIn(line).foreach { m =>
            m.group(1).split(",").map(_.trim)
              .filter(_.matches("""[A-Za-z_]\w*"""))
              .foreach(invalidate)
          }
          locally {
            val eq = line.indexOf('=')
            def rhsRefs(n: String): Boolean = eq >= 0 &&
              ("\\b" + java.util.regex.Pattern.quote(n) + "\\b").r
                .findFirstIn(line.substring(eq + 1)).isDefined
            line match {
              case assignStmt(_, n) if !rhsRefs(n) => invalidate(n)
              case tupleTargetsAssign(ts, _) =>
                ts.split(",").map(_.trim)
                  .filter(t => t.matches("""[A-Za-z_]\w*""") && !rhsRefs(t))
                  .foreach(invalidate)
              case _ => ()
            }
          }
          // slice 39: stdlib copy functions preserve the argument's type
          copyAssign.findFirstMatchIn(line).foreach { m =>
            resolveCallee(m.group(2).replaceAll("\\s+", "")) match {
              case Some("copy.copy") | Some("copy.deepcopy") =>
                fn.locals.get(m.group(3))
                  .foreach(t => fn.locals(m.group(1)) = t)
              case _ => ()
            }
          }
          // slice 40: a partial over a class is a class alias
          partialAssign.findFirstMatchIn(line).foreach { m =>
            if (resolveCallee(m.group(2).replaceAll("\\s+", ""))
                .contains("functools.partial"))
              classishType(m.group(3))
                .foreach(t => fn.classAliases(m.group(1)) = t)
          }
          // slice 48: a LAMBDA whose body is a constructor call is a
          // factory — calling it constructs the class (jedi infers the
          // lambda's return from its body expression), the slice-40
          // partial pattern without the import
          lambdaCtorAssign.findFirstMatchIn(line).foreach { m =>
            classishType(m.group(2))
              .orElse(returnTypeTarget(m.group(2)))
              .foreach(t => fn.classAliases(m.group(1)) = t)
          }
          // slice 50: `x = name or Ctor(...)` — the or-default idiom
          // binds the constructor arm (jedi's union, collapsed onto the
          // resolvable side)
          orDefaultAssign.findFirstMatchIn(line).foreach { m =>
            classishType(m.group(3))
              .orElse(returnTypeTarget(m.group(3)))
              .orElse(typeshedReturnTarget(m.group(3)))
              .foreach(t => fn.locals(m.group(1)) = t)
          }
          // r17 slice 94: narrows record their pre-guard binding and
          // the indent past which they expire (processed in the walk)
          def narrowBind(name: String, t: String, threshold: Int): Unit = {
            fn.narrowRestores.push((threshold, name, fn.locals.get(name)))
            fn.locals(name) = t
          }
          // slice 51: `assert isinstance(x, Cls)` narrows x for the
          // rest of its SUITE (until a dedent below the assert) — the
          // assert twin of slice 38's if-guard
          assertIsinstance.findFirstMatchIn(line).foreach { m =>
            classishType(m.group(2)).foreach(t =>
              narrowBind(m.group(1), t, indentOf(line) - 1))
          }
          // r14 slice 75: record `global` declarations; a constructor
          // assignment to a declared name below also types the module
          // singleton (jedi resolves the global write module-wide; our
          // syntactic pass feeds later-scanned readers, the file-order
          // over-approximation every cross-scope slice takes)
          globalDecl.findFirstMatchIn(line).foreach(m =>
            fn.globalDecls ++= m.group(1).split(",").map(_.trim))
          // r14 slice 75: multi-target assignment binds BOTH targets
          multiTargetAssign.findFirstMatchIn(line).foreach { m =>
            chainReturnType(line, m.end,
                classishType(m.group(3))
                  .orElse(fn.classAliases.get(m.group(3)))
                  .orElse(returnTypeTarget(m.group(3)))
                  .orElse(typeshedReturnTarget(m.group(3))))
              .foreach { t =>
                fn.locals(m.group(1)) = t
                fn.locals(m.group(2)) = t
              }
          }
          // r14 slice 72: the WALRUS operator (`if (x := make()) …`,
          // PEP 572) binds its target exactly like `x = make()` — a
          // namedexpr assigns in the enclosing function scope (jedi
          // resolves it as an assignment); the grammar requires the
          // parentheses in these positions, so the `(` anchor never
          // misreads a comparison. Same RHS chain as instanceAssign.
          walrusAssign.findAllMatchIn(line).foreach { m =>
            chainReturnType(line, m.end,
                classishType(m.group(2))
                  .orElse(fn.classAliases.get(m.group(2)))
                  .orElse(fn.locals.get(m.group(2))
                    .flatMap(t => methodReturn(t, "__call__")))
                  .orElse(returnTypeTarget(m.group(2)))
                  .orElse(typeshedReturnTarget(m.group(2)))
                  .orElse(attrCallHead(m.group(2),
                    n => if (n == "self" || n == "cls")
                        curClass.map(_.fullName)
                      else fn.locals.get(n).orElse(moduleVarTypes.get(n)))))
              .foreach(t => fn.locals(m.group(1)) = t)
          }
          // binding priority: constructor RHS > callee's `-> Type` >
          // explicit annotation on the target
          instanceAssign.findFirstMatchIn(line) match {
            case Some(m) =>
              // slice 10: a trailing `.method()` chain folds the head's
              // type through method returns (`x = Service().connect()`
              // binds the FINAL return type, never the head class);
              // slice 13: the head itself may be a typed-receiver method
              // call (`self.f.m()`, `db.connect()` with db a typed local);
              // slice 24: a typing.cast head binds its declared type
              chainReturnType(line, m.end,
                  classishType(m.group(2))
                    // slice 32: `m = mk()` through a class alias binds
                    // the aliased class, same as a direct constructor
                    .orElse(fn.classAliases.get(m.group(2)))
                    // slice 44: `h = f()` on a typed INSTANCE resolves
                    // through its class's __call__ (MRO'd, declared or
                    // inferred return — jedi's callable-object protocol)
                    .orElse(fn.locals.get(m.group(2))
                      .flatMap(t => methodReturn(t, "__call__")))
                    .orElse(castTarget(rawLines(i), m.group(2), m.end))
                    .orElse(returnTypeTarget(m.group(2)))
                    .orElse(typeshedReturnTarget(m.group(2)))
                    .orElse(attrCallHead(m.group(2),
                      n => if (n == "self" || n == "cls")
                          curClass.map(_.fullName)
                        else fn.locals.get(n).orElse(moduleVarTypes.get(n)))))
                .orElse(localAnno.findFirstMatchIn(line)
                  .filter(_.group(1) == m.group(1))
                  .flatMap(a => classishType(a.group(2))))
                // slice 21: `h: Optional[Helper] = factory()` — the
                // nullable annotation types the target when the RHS
                // resolves nothing
                .orElse(optionalAnno.findFirstMatchIn(line)
                  .filter(_.group(1) == m.group(1))
                  .flatMap(a => classishType(a.group(2))))
                .orElse(unionNoneAnno.findFirstMatchIn(line)
                  .filter(_.group(1) == m.group(1))
                  .flatMap(a => classishType(
                    Option(a.group(2)).getOrElse(a.group(3)))))
                .foreach { t =>
                  fn.locals(m.group(1)) = t
                  // r14 slice 75: a `global`-declared target also
                  // types the module singleton
                  if (fn.globalDecls.contains(m.group(1)))
                    moduleVarTypes(m.group(1)) = t
                }
            case None =>
              // annotated local without a constructor RHS (`x: Helper` /
              // `x: Helper = registry.get(...)`); slice 21 extends the
              // same binding to `x: Optional[Helper]` / `x: Helper | None`
              optionalAnno.findFirstMatchIn(line)
                .map(m => (m.group(1), m.group(2)))
                .orElse(unionNoneAnno.findFirstMatchIn(line)
                  .map(m => (m.group(1),
                    Option(m.group(2)).getOrElse(m.group(3)))))
                .foreach { case (nm, anno) =>
                  classishType(anno).foreach(t => fn.locals(nm) = t)
                }
              // r14 slice 75: Final / ClassVar / Annotated wrappers
              // type the name as their first argument
              wrapperAnno.findFirstMatchIn(line)
                .filter(m => line.trim.startsWith(m.group(1)))
                .foreach(m => classishType(m.group(2))
                  .foreach(t => fn.locals(m.group(1)) = t))
              localAnno.findFirstMatchIn(line) match {
                case Some(m) =>
                  classishType(m.group(2)).foreach(t => fn.locals(m.group(1)) = t)
                case None =>
                  // context-manager binding (`with Database() as db:`);
                  // each manager clause of a multi-manager `with` binds
                  // its OWN as-target. C3 slice 27: the as-target is
                  // `__enter__`'s return type resolved along the
                  // manager's MRO (jedi follows the context-manager
                  // protocol: a `-> Cursor` enter types the target
                  // Cursor; `return self` keeps the manager class); an
                  // absent or unresolvable `__enter__` (cross-module
                  // managers included) falls back to the manager class
                  // itself — the enter-returns-self convention
                  if (withStmt.matches(line))
                    withManager.findAllMatchIn(line).foreach { m =>
                      classishType(m.group(1)).orElse(returnTypeTarget(m.group(1)))
                        .orElse(typeshedReturnTarget(m.group(1)))
                        .map(t => methodReturn(t, "__enter__").getOrElse(t))
                        .foreach(t => fn.locals(m.group(2)) = t)
                    }
                  // slice 32: bare-name RHS — an instance alias when the
                  // RHS is a typed local (`y = h`), a CLASS alias when
                  // it's a class object (`mk = Helper`); keywords and
                  // unresolvable names bind nothing
                  bareNameAssign.findFirstMatchIn(line)
                    .filter(m => !keywords.contains(m.group(2)))
                    .foreach { m =>
                      fn.locals.get(m.group(2)) match {
                        case Some(t) => fn.locals(m.group(1)) = t
                        case None =>
                          classishType(m.group(2)).foreach(t =>
                            fn.classAliases(m.group(1)) = t)
                      }
                    }
                  // C3 slice 11: `except CustomError as e:` types e as
                  // the (resolvable) exception class, so `e.method()`
                  // chains resolve; unresolvable builtins stay unbound.
                  // r17 slice 94: BLOCK-scoped — Python 3 DELETES the
                  // name when the except block ends, so a later read
                  // must not resolve through it
                  exceptAs.findFirstMatchIn(line).foreach { m =>
                    classishType(m.group(1))
                      .foreach(t => narrowBind(m.group(2), t,
                        indentOf(line)))
                  }
                  // slice 35: `case Cls(...) as x:` — jedi narrows the
                  // capture to the matched class pattern; r17 slice 94:
                  // ARM-scoped (a sibling case must not see it)
                  matchCaseAs.findFirstMatchIn(line).foreach { m =>
                    classishType(m.group(1))
                      .foreach(t => narrowBind(m.group(2), t,
                        indentOf(line)))
                  }
                  // slice 38: isinstance guards narrow the tested name —
                  // r17 slice 94: BRANCH-scoped (an if/elif/while narrow
                  // expires at its guard's indent; an assert holds for
                  // the rest of its suite)
                  val trimmed = line.trim
                  val isGuardLine = trimmed.startsWith("if ") ||
                    trimmed.startsWith("elif ") ||
                    trimmed.startsWith("while ")
                  val isAssertLine = trimmed.startsWith("assert ")
                  val narrowTh =
                    if (isAssertLine) indentOf(line) - 1 else indentOf(line)
                  if (isGuardLine || isAssertLine)
                    isinstanceNarrow.findAllMatchIn(line).foreach { m =>
                      classishType(m.group(2))
                        .foreach(t => narrowBind(m.group(1), t, narrowTh))
                    }
                  // r14 slice 77: the tuple form narrows to the FIRST
                  // class-resolving arm (jedi's union, optimistic take)
                  if (isGuardLine || isAssertLine)
                    isinstanceTupleNarrow.findAllMatchIn(line).foreach { m =>
                      m.group(2).split(",").iterator.map(_.trim)
                        .flatMap(classishType).toSeq.headOption
                        .foreach(t => narrowBind(m.group(1), t, narrowTh))
                    }
                  // slice 41: `y = x if … else None` flows x's type
                  ternaryNameAssign.findFirstMatchIn(line)
                    .foreach { m =>
                      fn.locals.get(m.group(2))
                        .foreach(t => fn.locals(m.group(1)) = t)
                    }
                  // attribute READ (`c = x.conn` / `c = self.db.conn`):
                  // binds only when EVERY step of the chain is a typed
                  // field — a partially-typed path must not leave c bound
                  // to a half-resolved name
                  attrReadAssign.findFirstMatchIn(line).foreach { m =>
                    val parts = m.group(2).split("\\.").toSeq
                    val base: Option[String] =
                      if (parts.head == "self") curClass.map(_.fullName)
                      else fn.locals.get(parts.head)
                        .orElse(moduleVarTypes.get(parts.head))
                    val fieldBind = base.flatMap(b =>
                      parts.tail.foldLeft(Option(b)) { (acc, p) =>
                        acc.flatMap(fieldOnlyViaMro(_, p))
                      })
                    fieldBind.foreach(t => fn.locals(m.group(1)) = t)
                    // C3 slice 29: when the tail is not a typed field
                    // but IS a method of the chained class, the target
                    // is a BOUND-METHOD alias: `f = db.query` makes a
                    // later bare `f(...)` call Database.query (jedi's
                    // method-reference resolution). Same-module classes
                    // resolve the definer along the MRO (override
                    // semantics); cross-module receivers take the
                    // member blindly, chaseFields' own convention.
                    if (fieldBind.isEmpty)
                      base.flatMap(b =>
                        parts.tail.dropRight(1).foldLeft(Option(b)) {
                          (acc, p) => acc.flatMap(fieldOnlyViaMro(_, p))
                        })
                        .flatMap { cls =>
                          val mth = parts.last
                          mroOf(cls).find(c =>
                              classMethodsRaw.get(c).exists(_.contains(mth)))
                            .map(d => s"$d.$mth")
                            .orElse(
                              if (!cls.startsWith(mod + "."))
                                Some(s"$cls.$mth")
                              else None)
                        }
                        .foreach(t => fn.methodRefs(m.group(1)) = t)
                  }
                  // C3 slice 14: parallel tuple unpacking — when the RHS
                  // arity matches, each position binds independently
                  // (constructor call or already-typed bare name); a
                  // position that doesn't resolve leaves only ITS target
                  // unbound, unlike the all-or-nothing chain slices
                  // (positions are independent in jedi too)
                  tupleTargetsAssign.findFirstMatchIn(line).foreach { m =>
                    val targets = m.group(1).split(",").map(_.trim).toSeq
                    val items = splitTopComma(m.group(2)).map(_.trim)
                    if (items.size == targets.size)
                      targets.zip(items).foreach { case (tgt, item) =>
                        if (!keywords.contains(tgt)) {
                          val ty = item match {
                            case ctorItem(callee) =>
                              classishType(callee)
                                .orElse(returnTypeTarget(callee))
                                .orElse(typeshedReturnTarget(callee))
                            case nm if nm.matches("""[A-Za-z_]\w*""") =>
                              fn.locals.get(nm).orElse(moduleVarTypes.get(nm))
                            case _ => None
                          }
                          ty.foreach(t => fn.locals(tgt) = t)
                        }
                      }
                  }
                  // slice 14, chained form: `a = b = Ctor()` binds both
                  // targets to the one constructed type
                  chainedAssign.findFirstMatchIn(line).foreach { m =>
                    classishType(m.group(3)).orElse(returnTypeTarget(m.group(3)))
                      .orElse(typeshedReturnTarget(m.group(3)))
                      .foreach { t =>
                        Seq(m.group(1), m.group(2))
                          .filterNot(keywords.contains)
                          .foreach(n => fn.locals(n) = t)
                      }
                  }
              }
          }
          // C3 slice 15: walrus bindings (`if (x := Helper()):`) type
          // their target wherever they appear on the line — independent
          // of the assignment-shaped cases above
          walrusBind.findAllMatchIn(line).foreach { m =>
            if (!keywords.contains(m.group(1)))
              classishType(m.group(2)).orElse(returnTypeTarget(m.group(2)))
                .orElse(typeshedReturnTarget(m.group(2)))
                .foreach(t => fn.locals(m.group(1)) = t)
          }
          // slice 9: container-annotated LOCALS (`ys: Sequence[T] = …`)
          // and the bindings that consume element types — iteration
          // targets and subscript reads become T-typed locals
          val isHdr = classHeader.matches(line) || defHeader.matches(line)
          if (!isHdr) {
            containerAnno.findFirstMatchIn(line)
              .filter(m => line.trim.startsWith(m.group(1)))
              .foreach(m => classishType(m.group(2))
                .foreach(t => fn.elemLocals(m.group(1)) = t))
            // C3 slice 12: a homogeneous constructor-list literal binds
            // the element type; mixed/non-call items bind nothing
            listLitAssign.findFirstMatchIn(line).foreach { m =>
              val types = splitTopComma(m.group(2)).map(_.trim)
                .map {
                  case ctorItem(callee) => classishType(callee)
                  case _ => None
                }
              if (types.nonEmpty && types.forall(_.isDefined) &&
                  types.flatten.distinct.size == 1)
                fn.elemLocals(m.group(1)) = types.head.get
            }
            // r12 slice 56: homogeneous constructor-DICT literals bind
            // the VALUE type (keys out of model per slice 28's rule);
            // a colon-free brace literal is a SET — element type
            braceLitAssign.findFirstMatchIn(line)
              .filterNot(m => m.group(2).contains(" for "))
              .foreach { m =>
                val items = splitTopComma(m.group(2)).map(_.trim)
                val entryVal =
                  """^(?:'[^']*'|"[^"]*"|[\w.]+)\s*:\s*(.+)$""".r
                val allDict =
                  items.nonEmpty &&
                    items.forall(entryVal.findFirstMatchIn(_).isDefined)
                val anyColon = items.exists(_.contains(":"))
                val vals: Seq[String] =
                  if (allDict)
                    items.map(i =>
                      entryVal.findFirstMatchIn(i).get.group(1).trim)
                  else if (anyColon) Seq.empty // mixed/nested: bind nothing
                  else items
                val types = vals.map {
                  case ctorItem(callee) => classishType(callee)
                  case _ => None
                }
                if (types.nonEmpty && types.forall(_.isDefined) &&
                    types.flatten.distinct.size == 1) {
                  if (allDict) fn.valueLocals(m.group(1)) = types.head.get
                  else fn.elemLocals(m.group(1)) = types.head.get
                }
              }
            // C3 slice 26: constructor-call comprehensions bind the
            // element type (a non-classish element binds nothing)
            compCtorAssign.findFirstMatchIn(line).foreach(m =>
              classishType(m.group(2))
                .foreach(t => fn.elemLocals(m.group(1)) = t))
            forIn.findFirstMatchIn(line).foreach(m =>
              fn.elemLocals.get(m.group(2))
                .foreach(t => fn.locals(m.group(1)) = t))
            // r12 slice 57: iteration / subscript reads over a
            // container SELF-FIELD bind the element type (MRO'd)
            if (fn.kind == Kind.Method) curClass.foreach { c =>
              forInSelf.findFirstMatchIn(line).foreach(m =>
                fieldElemViaMro(c.fullName, m.group(2))
                  .foreach(t => fn.locals(m.group(1)) = t))
              selfSubscriptRead.findFirstMatchIn(line).foreach(m =>
                fieldElemViaMro(c.fullName, m.group(2))
                  .foreach(t => fn.locals(m.group(1)) = t))
            }
            // slice 30: `for x in gen():` binds the generator's yield
            // type (skipping `.values()`, which slice 28 owns); r14
            // slice 70: a declared container return feeds the same
            // binding (`for u in all_users():` with `-> list[User]`)
            forInCall.findFirstMatchIn(line)
              .filter(!_.group(2).endsWith(".values"))
              .foreach(m => yieldTypeTarget(m.group(2))
                .orElse(returnElemTarget(m.group(2)))
                .foreach(t => fn.locals(m.group(1)) = t))
            // r14 slice 70: `xs = all_users()` binds the TARGET's
            // ELEMENT type — iteration and subscript reads then type
            // like any container-annotated local (the container itself
            // is never an instance type, so fn.locals stays out)
            instanceAssign.findFirstMatchIn(line).foreach(m =>
              returnElemTarget(m.group(2))
                .foreach(t => fn.elemLocals(m.group(1)) = t))
            // slice 42: enumerate/zip/order-wrapper iteration
            forInEnumerate.findFirstMatchIn(line).foreach { m =>
              // r14 slice 80: call sources feed from the callee's yield
              // or declared container element
              val t =
                if (m.group(4) != null)
                  yieldTypeTarget(m.group(3))
                    .orElse(returnElemTarget(m.group(3)))
                else fn.elemLocals.get(m.group(3))
              t.foreach(ty => fn.locals(m.group(2)) = ty)
            }
            forInZip.findFirstMatchIn(line).foreach { m =>
              fn.elemLocals.get(m.group(3))
                .foreach(t => fn.locals(m.group(1)) = t)
              fn.elemLocals.get(m.group(4))
                .foreach(t => fn.locals(m.group(2)) = t)
            }
            forInPassthrough.findFirstMatchIn(line).foreach(m =>
              fn.elemLocals.get(m.group(2))
                .foreach(t => fn.locals(m.group(1)) = t))
            // r14 slice 73: COMPREHENSION loop variables — `[u.save()
            // for u in all_users()]` / `(… for u in xs)` bind u from
            // the source's element type (typed-container local/param,
            // declared container return, or yield type), so the
            // same-line member call resolves. jedi scopes the variable
            // to the comprehension; binding into the callable's locals
            // is the slice-38-style line-scoped over-approximation (a
            // later rebinding overwrites). Statement `for` lines keep
            // their own slices.
            if (!line.trim.startsWith("for ") &&
                !line.trim.startsWith("async for "))
              compForIn.findAllMatchIn(line).foreach { m =>
                val isCall = m.group(3) != null
                val t =
                  if (isCall) {
                    if (m.group(2).endsWith(".values")) None
                    else yieldTypeTarget(m.group(2))
                      .orElse(returnElemTarget(m.group(2)))
                  } else fn.elemLocals.get(m.group(2))
                t.foreach(ty => fn.locals(m.group(1)) = ty)
              }
            // slice 43: identity comprehensions carry the element type
            compIdentAssign.findFirstMatchIn(line)
              .filter(m => m.group(2) == m.group(3))
              .foreach { m =>
                val srcType =
                  if (m.group(5) == null) fn.elemLocals.get(m.group(4))
                  else yieldTypeTarget(m.group(4))
                    .orElse(returnElemTarget(m.group(4)))
                srcType.foreach(t => fn.elemLocals(m.group(1)) = t)
              }
            // r14 slice 74: identity-VALUE dict comprehensions carry
            // the element type onto the target's VALUE binding, so
            // `d.get(k)` / `d[k]` reads type (slice 28's machinery)
            dictCompIdentAssign.findFirstMatchIn(line)
              .filter(m => m.group(2) == m.group(3))
              .foreach { m =>
                val srcType =
                  if (m.group(5) == null) fn.elemLocals.get(m.group(4))
                  else yieldTypeTarget(m.group(4))
                    .orElse(returnElemTarget(m.group(4)))
                srcType.foreach(t => fn.valueLocals(m.group(1)) = t)
              }
            // r14 slice 74: `ys = sorted(xs)` / list/tuple/set/reversed
            // — the assignment spelling of the order-wrapper iteration:
            // element bindings pass through the wrapper
            wrapAssign.findFirstMatchIn(line).foreach { m =>
              val srcType =
                if (m.group(3) == null) fn.elemLocals.get(m.group(2))
                else yieldTypeTarget(m.group(2))
                  .orElse(returnElemTarget(m.group(2)))
              srcType.foreach(t => fn.elemLocals(m.group(1)) = t)
            }
            subscriptRead.findFirstMatchIn(line).foreach(m =>
              fn.elemLocals.get(m.group(2))
                .orElse(fn.valueLocals.get(m.group(2)))
                .foreach(t => fn.locals(m.group(1)) = t))
            // slice 49: next(iter(xs)) reads the first ELEMENT — the
            // subscript-read rule for the iterator-protocol spelling.
            // Mapping locals stay out: next(iter(d)) yields a KEY,
            // which slice 28 keeps out of model.
            nextIterRead.findFirstMatchIn(line).foreach(m =>
              fn.elemLocals.get(m.group(2))
                .foreach(t => fn.locals(m.group(1)) = t))
            // slice 52: builtin ELEMENT reads — `y = max(xs)` / `min(xs)`
            // (typeshed: Iterable[T] → T) and `y = xs.pop()` (list.pop
            // returns the element; a MAPPING's pop returns the VALUE,
            // routed through valueLocals like slice 28's reads)
            builtinElemRead.findFirstMatchIn(line).foreach(m =>
              fn.elemLocals.get(m.group(2))
                .foreach(t => fn.locals(m.group(1)) = t))
            popRead.findFirstMatchIn(line).foreach(m =>
              fn.elemLocals.get(m.group(2))
                .orElse(fn.valueLocals.get(m.group(2)))
                .foreach(t => fn.locals(m.group(1)) = t))
            // slice 28: mapping-annotated LOCALS, value-side iteration
            // and .get() reads (plain `for k in d:` binds nothing — the
            // map's keys are out of model)
            mappingAnno.findFirstMatchIn(line)
              .filter(m => line.trim.startsWith(m.group(1)))
              .foreach(m => classishType(m.group(2))
                .foreach(t => fn.valueLocals(m.group(1)) = t))
            forInValues.findFirstMatchIn(line).foreach(m =>
              fn.valueLocals.get(m.group(2))
                .foreach(t => fn.locals(m.group(1)) = t))
            mapGetRead.findFirstMatchIn(line).foreach(m =>
              fn.valueLocals.get(m.group(2))
                .foreach(t => fn.locals(m.group(1)) = t))
            // C3 slice 47: `for k, v in d.items():` — the value target
            // binds, the key stays unbound (slice 28's key rule)
            forInItems.findFirstMatchIn(line).foreach(m =>
              fn.valueLocals.get(m.group(3))
                .foreach(t => fn.locals(m.group(2)) = t))
            // C3 slice 46: empty-container build-up — record `xs = []`,
            // then the first resolvable `.append`/`.add`/`d[k] =` write
            // infers the content type; explicit annotations win
            emptyContainerAssign.findFirstMatchIn(line).foreach(m =>
              if (!keywords.contains(m.group(1)))
                fn.emptyContainers += m.group(1))
            def writeType(rhs: String): Option[String] = rhs match {
              case ctorItem(callee) =>
                classishType(callee).orElse(returnTypeTarget(callee))
                  .orElse(typeshedReturnTarget(callee))
              case nm if nm.matches("""[A-Za-z_]\w*""") => fn.locals.get(nm)
              case _ => None
            }
            appendCall.findFirstMatchIn(line)
              .filter(m => fn.emptyContainers.contains(m.group(1)) &&
                !fn.elemLocals.contains(m.group(1)))
              .foreach(m => writeType(m.group(2))
                .foreach(t => fn.elemLocals(m.group(1)) = t))
            subscriptPut.findFirstMatchIn(line)
              .filter(m => fn.emptyContainers.contains(m.group(1)) &&
                !fn.valueLocals.contains(m.group(1)))
              .foreach(m => writeType(m.group(2))
                .foreach(t => fn.valueLocals(m.group(1)) = t))
            // C3 slice 53: `y = d.setdefault(k, Ctor())` — BOTH a write
            // and a read: on an empty-dict build-up it infers the VALUE
            // type (jedi's setdefault(…) -> _VT overload), and the
            // target binds that value type either way
            setdefaultCall.findFirstMatchIn(line).foreach { m =>
              if (fn.emptyContainers.contains(m.group(2)) &&
                  !fn.valueLocals.contains(m.group(2)))
                writeType(m.group(3))
                  .foreach(t => fn.valueLocals(m.group(2)) = t)
              fn.valueLocals.get(m.group(2))
                .foreach(t => fn.locals(m.group(1)) = t)
            }
            // C3 slice 61: `y = d.get(k, Ctor())` — jedi's union of the
            // mapping's value type and the DEFAULT arm: a TYPED receiver
            // keeps the slice-28 value binding; an untyped one binds the
            // resolvable default (the `conn = pool.get(key, Conn())`
            // idiom; get never inserts, so no value-type write)
            getDefaultCall.findFirstMatchIn(line).foreach { m =>
              if (!fn.valueLocals.contains(m.group(2)))
                writeType(m.group(3))
                  .foreach(t => fn.locals(m.group(1)) = t)
            }
            // A9 LOCAL: `with … as x` as-targets are definitions inside
            // the callable (same reference path as assignment targets)
            if (withStmt.matches(line) &&
                stack.headOption.exists(sc =>
                  sc.kind == Kind.Method || sc.kind == Kind.Function))
              withManager.findAllMatchIn(line).foreach { m =>
                val t = m.group(2)
                if (!keywords.contains(t)) recordLocalDef(fn, t, i)
              }
            // walrus targets (`(x := …)`) are local definitions too —
            // Python scopes them to the enclosing function
            if (stack.headOption.exists(sc =>
                sc.kind == Kind.Method || sc.kind == Kind.Function))
              walrusBind.findAllMatchIn(line).foreach { m =>
                if (!keywords.contains(m.group(1)))
                  recordLocalDef(fn, m.group(1), i)
              }
          }
          if (fn.kind == Kind.Method) curClass.foreach { c =>
            selfInstanceAssign.findAllMatchIn(line).foreach { m =>
              chainReturnType(line, m.end,
                  classishType(m.group(2)).orElse(returnTypeTarget(m.group(2)))
                    .orElse(typeshedReturnTarget(m.group(2))))
                .foreach(t =>
                  classFieldTypes.getOrElseUpdate(c.fullName,
                    mutable.Map.empty)(m.group(1)) = t)
            }
            // r14 slice 78: or-default fields take the constructed arm
            selfOrDefaultAssign.findAllMatchIn(line).foreach { m =>
              classishType(m.group(2)).foreach(t =>
                classFieldTypes.getOrElseUpdate(c.fullName,
                  mutable.Map.empty)(m.group(1)) = t)
            }
            // C3 slice 20: `self.f = <name>` where the name is a TYPED
            // param/local — the constructor-injection pattern
            // (`def __init__(self, conn: Conn): self.conn = conn`);
            // jedi types the field from the assigned name. Bare-name
            // RHS only, so the constructor-call handler above stays
            // disjoint.
            selfNameAssign.findAllMatchIn(line).foreach { m =>
              fn.locals.get(m.group(2)).foreach(t =>
                classFieldTypes.getOrElseUpdate(c.fullName,
                  mutable.Map.empty)(m.group(1)) = t)
            }
            // `self.f: T = …` — the declared annotation wins over any
            // RHS-derived binding above (jedi's annassign semantics);
            // Optional[X] / X | None unwrap like slice 21
            selfAnnoAssign.findAllMatchIn(line).foreach { m =>
              annoCoreType(m.group(2)).foreach(t =>
                classFieldTypes.getOrElseUpdate(c.fullName,
                  mutable.Map.empty)(m.group(1)) = t)
            }
          }
        }
        } // end !cont(i)

        // C10 — self.x = … inside a method promotes x to a Class FIELD
        // (`Foo.__init__.self.bar` collapses to `Foo.bar`)
        if (curCallable.exists(_.kind == Kind.Method)) {
          selfAssign.findAllMatchIn(line).foreach { m =>
            curClass.foreach { c =>
              val fname = m.group(1)
              if (!classFields.getOrElseUpdate(c.fullName, mutable.Set.empty)
                    .contains(fname)) {
                classFields(c.fullName) += fname
                val full = s"${c.fullName}.$fname"
                symbols += SymbolEvent(nextSeq(), taskId, Kind.Field, full, fname,
                  Some(relPath), None, Some(c.fullName), None, Map.empty)
                edges += EdgeEvent(nextSeq(), taskId, c.fullName, Rel.HasField,
                  full, Map.empty)
              }
            }
          }
        }

        // C9 — call sites: next non-space token is `(` (isCallNode rule)
        val isHeader = classHeader.matches(line) || defHeader.matches(line)
        refSource.foreach { src =>
          if (!isHeader) {
            callSite.findAllMatchIn(line).foreach { m =>
              val callee = m.group(1)
              if (!keywords.contains(callee)) {
                // slice 29: a bare name bound as a method reference
                // (`f = db.query`) calls that method — the local alias
                // shadows any same-named module def, Python's own rule
                val viaRef =
                  if (!callee.contains("."))
                    // slice 29 method refs; slice 32 class aliases
                    // (`mk()` constructs the aliased class)
                    curCallable.flatMap(fn => fn.methodRefs.get(callee)
                      .orElse(fn.classAliases.get(callee)))
                  else None
                viaRef.orElse(resolveCallee(callee)).foreach { dst =>
                  if (dst != src.fullName) {
                    edges += EdgeEvent(nextSeq(), taskId, src.fullName, Rel.Call,
                      dst, Map.empty)
                    locs += LocationRow(dst, relPath, "REFERENCE", i + 1,
                      m.start + 1, i + 1, m.end)
                  }
                }
              }
            }
            // slice 31: a member call through a subscripted container /
            // mapping local (`xs[0].m()`, `d["k"].m()`) — the receiver
            // type is the element / value binding, the member chain
            // folds through typed fields like any other receiver
            subscriptCallSite.findAllMatchIn(line).foreach { m =>
              val recvType = curCallable.flatMap(fn =>
                fn.elemLocals.get(m.group(1))
                  .orElse(fn.valueLocals.get(m.group(1))))
              val chain = m.group(2).split("\\.").map(_.trim).toSeq
              recvType.flatMap(t => chaseFields(t, chain)).foreach { dst =>
                if (dst != src.fullName) {
                  edges += EdgeEvent(nextSeq(), taskId, src.fullName,
                    Rel.Call, dst, Map.empty)
                  locs += LocationRow(dst, relPath, "REFERENCE", i + 1,
                    m.start + 1, i + 1, m.end)
                }
              }
            }
            // r12 slice 57: a member call through a SUBSCRIPTED
            // container self-field (`self.conns[0].execute()`) — the
            // receiver is the field's element type (MRO'd), the member
            // chain folds through typed fields like slice 31
            if (src.kind == Kind.Method || src.kind == Kind.Function)
              curClass.foreach { c =>
                selfSubscriptCallSite.findAllMatchIn(line).foreach { m =>
                  val chain = m.group(2).split("\\.").map(_.trim).toSeq
                  fieldElemViaMro(c.fullName, m.group(1))
                    .flatMap(t => chaseFields(t, chain)).foreach { dst =>
                      if (dst != src.fullName) {
                        edges += EdgeEvent(nextSeq(), taskId, src.fullName,
                          Rel.Call, dst, Map.empty)
                        locs += LocationRow(dst, relPath, "REFERENCE",
                          i + 1, m.start + 1, i + 1, m.end)
                      }
                    }
                }
              }
            // r12 slice 55: INLINE CALL-RESULT CHAINS —
            // `Head(...).m1(...).m2(...)` emits a Call edge PER LINK
            // (jedi references every chained call, not just the head):
            // the head's RESULT type (constructor, class alias,
            // declared/inferred return, typeshed stub, typed-receiver
            // head) folds through methodReturn link by link; each
            // link's callee resolves along the chain type's MRO
            // (same-module definers; cross-module blind take — slice 54
            // verifies those at enrich). callSite's lookbehind never
            // matches a post-`)` trailer, so links are exclusively this
            // scanner's. An unresolvable link stops the chain (the
            // all-or-nothing posture, applied link-prefix-wise).
            locally {
              def closeParen(from: Int): Int = {
                var j = from; var depth = 1
                while (j < line.length && depth > 0) {
                  val c = line.charAt(j)
                  if (c == '(') depth += 1 else if (c == ')') depth -= 1
                  j += 1
                }
                if (depth == 0) j else -1
              }
              val linkCall = """^\s*\.\s*([A-Za-z_]\w*)\s*\(""".r
              callSite.findAllMatchIn(line).foreach { m =>
                val callee = m.group(1)
                if (!keywords.contains(callee)) {
                  var t: Option[String] = classishType(callee)
                    .orElse(curCallable.flatMap(_.classAliases.get(callee)))
                    .orElse(returnTypeTarget(callee))
                    .orElse(typeshedReturnTarget(callee))
                    .orElse(curCallable.flatMap(fn => attrCallHead(callee,
                      n => if (n == "self" || n == "cls")
                          curClass.map(_.fullName)
                        else fn.locals.get(n).orElse(moduleVarTypes.get(n)))))
                  var pos = closeParen(m.end)
                  var guard = 0
                  while (t.isDefined && pos >= 0 && pos < line.length &&
                      guard < 8) {
                    guard += 1
                    linkCall.findFirstMatchIn(line.substring(pos)) match {
                      case Some(mm) =>
                        val recv = t.get
                        val member = mm.group(1)
                        val definer = mroOf(recv).find(c =>
                          classMethodsRaw.get(c).exists(_.contains(member)))
                        val dst = definer.map(d => s"$d.$member")
                          .getOrElse(s"$recv.$member")
                        if (dst != src.fullName) {
                          edges += EdgeEvent(nextSeq(), taskId, src.fullName,
                            Rel.Call, dst, Map.empty)
                          locs += LocationRow(dst, relPath, "REFERENCE",
                            i + 1, pos + mm.start + 1, i + 1, pos + mm.end)
                        }
                        t = methodReturn(recv, member)
                        pos = closeParen(pos + mm.end)
                      case None => pos = -1
                    }
                  }
                }
              }
            }
            // C3 slice 16 — `super().m()`: the real callee is the first
            // definer of m along the class's C3 MRO AFTER the class —
            // whole-graph information (bases live in other files), so
            // emit a `<cls>.__super__.<m>` SENTINEL call edge; enrich
            // rewrites it via [[graft.enrich.Closure.superResolve]] and
            // drops it when nothing on the MRO defines m (jedi's
            // zero-argument super() binding). No REFERENCE location row:
            // the target symbol is unknowable per-file.
            if (src.kind == Kind.Method)
              superCall.findAllMatchIn(line).foreach { m =>
                curClass.foreach { c =>
                  edges += EdgeEvent(nextSeq(), taskId, src.fullName, Rel.Call,
                    s"${c.fullName}.__super__.${m.group(1)}", Map.empty)
                }
              }
          }
          // C9 — USES: loads of module globals / self fields from callables
          // (reference: FUNCTION|METHOD -> GLOBAL_VARIABLE|FIELD only,
          // myClient.py:299-305)
          if (src.kind == Kind.Function || src.kind == Kind.Method) {
            nameRef.findAllMatchIn(line).foreach { m =>
              val n = m.group(1)
              if (topGlobals.contains(n) && !keywords.contains(n))
                edges += EdgeEvent(nextSeq(), taskId, src.fullName, Rel.Uses,
                  s"$mod.$n", Map.empty)
            }
            if (src.kind == Kind.Method) {
              val assigned = selfAssign.findAllMatchIn(line).map(_.group(1)).toSet
              selfRef.findAllMatchIn(line).foreach { m =>
                val f = m.group(1)
                curClass.foreach { c =>
                  if (!assigned.contains(f) &&
                      classFields.get(c.fullName).exists(_.contains(f)) &&
                      !classMethods.get(c.fullName).exists(_.contains(f)))
                    edges += EdgeEvent(nextSeq(), taskId, src.fullName, Rel.Uses,
                      s"${c.fullName}.$f", Map.empty)
                }
              }
            }
            // A9/srctrl LOCAL usages (shallow_indexer.py:486-494): a bare
            // name — not after a '.'; calls and attribute BASES count, so
            // `self` in `self.x` records — matching a tracked local of
            // the innermost callable records another LOCAL row. Scanned on
            // the PREPROCESSED line (names inside strings/comments never
            // match); definition positions themselves are skipped, the
            // reference visits each name node once.
            if (!isHeader && src.localNames.nonEmpty)
              localUse.findAllMatchIn(line).foreach { m =>
                val n = m.group(1)
                if (src.localNames.contains(n) &&
                    !localDefPos.contains((i + 1, m.start + 1)))
                  locs += LocationRow(s"${src.fullName}<$n>", relPath,
                    "LOCAL", i + 1, m.start + 1, i + 1, m.start + n.length)
              }
          }
        }
      }
      i += 1
    }

    // C12 — multiline strings as atomic ranges
    atomicRanges.foreach { case (s, e) =>
      locs += LocationRow(mod, relPath, "ATOMIC_RANGE", s, 1, e, 1)
    }

    // parse-error heuristic for the shallow parser: a bracket opened and
    // never closed by EOF → ERROR row (reference recordError,
    // myClient.py:419-437); indexing still completes with what was seen
    val balance = lines.map(l =>
      l.count("([{".contains(_)) - l.count(")]}".contains(_))).sum
    if (balance != 0)
      locs += LocationRow(mod, relPath, "ERROR", 1, 1, rawLines.length, 1)

    FileEvents(symbols.toSeq, dedupEdges(edges.toSeq), locs.toSeq,
      importFacts.toSeq)
  }

  /** Never-throwing wrapper: a file the indexer chokes on produces its
    * MODULE symbol plus an ERROR location row instead of aborting the
    * partition (the reference records errors via recordError,
    * myClient.py:419-437). */
  def indexFileSafe(taskId: String, relPath: String, content: String,
      corpus: Option[CorpusContext] = None): FileEvents =
    try indexFile(taskId, relPath, content, corpus)
    catch {
      case e: Exception =>
        val m = moduleName(relPath)
        FileEvents(
          Seq(SymbolEvent(1L, taskId, Kind.Module, m, m.split("\\.").last,
            Some(relPath), None, None, None, Map("index_error" -> e.toString))),
          Seq.empty,
          Seq(LocationRow(m, relPath, "ERROR", 1, 1, 1, 1)),
          Seq.empty)
    }

  /** Within-file edge dedup (the reference's upsert makes repeats no-ops). */
  private def dedupEdges(es: Seq[EdgeEvent]): Seq[EdgeEvent] =
    es.groupBy(e => (e.src, e.relType, e.dst)).values.map(_.last).toSeq
      .sortBy(_.seq)

  /** A top-level `__all__` augmentation or method mutation — anything
    * that can re-open a previously parsed literal export set. */
  private val allMutation: Regex =
    """^__all__\s*(?:\+=|-=|\|=|\.\w+\s*\()""".r

  /** Strip a `#` comment quote-aware (a `#` inside a string literal is
    * content, not a comment) — `__all__` continuation lines commonly
    * carry trailing comments per entry. */
  private def stripHashComment(line: String): String = {
    var q = ' '; var k = 0
    while (k < line.length) {
      val c = line.charAt(k)
      if (q != ' ') { if (c == q) q = ' ' }
      else if (c == '\'' || c == '"') q = c
      else if (c == '#') return line.substring(0, k)
      k += 1
    }
    line
  }

  /** The `__all__` literal parser (slice 91, hardened r17 per ADVICE):
    * accepts ONLY a bracketed list/tuple of quoted identifiers whose
    * MATCHING close bracket ends the RHS (trailing whitespace only) —
    * `["a"] + extra`, nested structures, and every other compound RHS
    * return None, so the export fallback stays the optimistic superset
    * and the corpus can never fabricate a star-import disproof. */
  private[graft] def parseAllLiteral(rhs: String): Option[Seq[String]] = {
    if (rhs.isEmpty || (rhs.head != '[' && rhs.head != '(')) return None
    val open = rhs.head
    val close = if (open == '[') ']' else ')'
    var depth = 0; var q = ' '; var end = -1; var k = 0
    while (k < rhs.length && end < 0) {
      val c = rhs.charAt(k)
      if (q != ' ') { if (c == q) q = ' ' }
      else if (c == '\'' || c == '"') q = c
      else if (c == open) depth += 1
      else if (c == close) { depth -= 1; if (depth == 0) end = k }
      k += 1
    }
    if (end < 0) return None
    if (rhs.substring(end + 1).trim.nonEmpty) return None
    val parts = rhs.substring(1, end).split(",").map(_.trim)
      .filter(_.nonEmpty)
    val lits = parts.flatMap { p =>
      val v = p.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("'").stripSuffix("'")
      if ((p.startsWith("\"") || p.startsWith("'")) &&
          v.matches("[A-Za-z_]\\w*")) Some(v) else None
    }
    if (lits.length == parts.length && lits.nonEmpty) Some(lits.toSeq)
    else None
  }

  /** Slice-62 PRE-SCAN — the names a module binds at its TOP LEVEL
    * (defs, classes, assignments incl. tuple targets, import aliases,
    * for/with targets), plus whether the binding set is CLOSED: a
    * `from x import *` or a module-level `__getattr__` (PEP 562) can
    * bind anything at runtime, so such a module can never DISPROVE a
    * name. Runs string-blanking preprocess (a column-0 `def` inside a
    * docstring must not bind) but emits nothing — a cheap executor-side
    * regex pass over headers, collected once per pipeline run. */
  def moduleBindings(relPath: String, content: String): ModuleScan = {
    val rawLines = content.split("\n", -1)
    val (lines, _) = preprocess(rawLines)
    val cont = continuations(lines)
    val mod = moduleName(relPath)
    val names = mutable.Set.empty[String]
    val classes = mutable.Set.empty[String]
    val defAnnos = mutable.Map.empty[String, String]
    val fieldAnnos = mutable.Map.empty[String, String]
    val varAnnos = mutable.Map.empty[String, String]
    val clsBases = mutable.Map.empty[String, Seq[String]]
    // slice 87: container returns (`-> list[User]`) key the ELEMENT
    val elemAnnos = mutable.Map.empty[String, String]
    val importBindings = mutable.Map.empty[String, String]
    val modImports = mutable.Map.empty[String, String]
    val starImports = mutable.ArrayBuffer.empty[String]
    var allList: Option[Seq[String]] = None
    var open = false
    // the top-level class whose body we are inside, and its body
    // indent (the FIRST statement indent seen — deeper statements are
    // nested in methods, not class members; slices 64-65)
    var curCls: Option[String] = None
    var bodyIndent = -1
    var pendingProp = false
    // slice 88: armed by a decorator the scan cannot resolve (not a
    // whitelisted transparent head, not a module name seen so far, not
    // an import binding) — the NEXT def's annotations are suspect and
    // key nothing, mirroring the deep pass's slice-59 poisoning
    var badDeco = false
    def armDeco(trimmed: String): Unit = {
      val dotted = trimmed.stripPrefix("@")
        .takeWhile(c => c.isLetterOrDigit || c == '_' || c == '.')
      val head = dotted.split('.').headOption.getOrElse("")
      if (head.nonEmpty && !knownDecoHeads.contains(head) &&
          !names.contains(head) && !importBindings.contains(head) &&
          !modImports.contains(head))
        badDeco = true
    }
    // slice 84: the annotated-param map of the __init__ we are inside
    // (null when not directly after a top-level class's __init__ header)
    var initParams: Map[String, String] = null
    // slice 95 (r18): a PEP 562 module-level __getattr__'s pinned type
    // — its `-> Cls` annotation, or (unannotated) the single
    // constructor every `return` in its body agrees on; any
    // non-conforming return keeps the blanket optimism (None)
    var getattrAnno: Option[String] = None
    var inGetattr = false
    val getattrReturns =
      mutable.ArrayBuffer.empty[Option[String]]
    val withAs = """^with\b.*\bas\s+([A-Za-z_]\w*)\s*:?\s*$""".r
    val tupleAssign =
      """^([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)+)\s*=(?!=).*$""".r
    val arrowTail = """->\s*(.+?)\s*:\s*$""".r
    def joined(li: Int): String =
      (lines(li) +: (li + 1 until lines.length)
        .iterator.takeWhile(cont(_)).map(lines(_)).toSeq).mkString(" ")
    // slice 63: a declared `-> Anno` on the (joined) header, unwrapped
    // of quotes / Optional[X] / X | None; simple names only —
    // resolution happens against this module's classes
    def annoOf(li: Int): Option[String] =
      arrowTail.findFirstMatchIn(joined(li)).flatMap { m =>
        var a = m.group(1).replaceAll("[\"']", "").trim
        if (a.startsWith("Optional[") && a.endsWith("]"))
          a = a.substring(9, a.length - 1).trim
        a = a.stripSuffix("| None").stripPrefix("None |").trim
        // slice 69: dotted module-attribute annotations (`-> mod.Cls`)
        // key too — resolution through the module's import bindings
        // happens at the corpus fold
        if (a.matches("[A-Za-z_]\\w*(?:\\.[A-Za-z_]\\w*)*")) Some(a)
        else None
      }
    lines.indices.foreach { li =>
      val ln = lines(li)
      if (!cont(li) && ln.nonEmpty && !ln.head.isWhitespace) {
        curCls = None; bodyIndent = -1; pendingProp = false
        initParams = null; inGetattr = false
        ln match {
          case dec if dec.startsWith("@") =>
            armDeco(dec) // stacked decorators accumulate
          case defHeader(ind, d) if ind.isEmpty =>
            names += d
            if (d == "__getattr__") {
              open = true
              // slice 95: a pinned `-> Cls` on __getattr__ types
              // attribute reads through the open module; unannotated
              // arms scan the body's returns instead (a decorated
              // __getattr__ stays blanket-optimistic like any
              // suspect annotation)
              if (!badDeco) {
                getattrAnno = annoOf(li)
                inGetattr = getattrAnno.isEmpty
              }
            }
            if (!badDeco) {
              annoOf(li).foreach(a => defAnnos(d) = a)
              // slice 87: a container arrow keys the element type —
              // resolution at the fold like every other annotation
              arrowContainer.findFirstMatchIn(joined(li))
                .foreach(m => elemAnnos(d) = m.group(1))
            }
            badDeco = false
          case classHeader(ind, c, _) if ind.isEmpty =>
            badDeco = false // class decorators stay out of scope
            names += c; classes += c; curCls = Some(c)
            // slice 83: base list, RAW (identifier / dotted spellings
            // only; keyword args and subscripted generics drop) —
            // resolution against imports happens at the corpus fold,
            // where the transitive cross-module MRO linearizes
            val bs = parenSpan(joined(li)).split(",").map(_.trim)
              .filter(b => b.nonEmpty && b != "object" &&
                b.matches("[A-Za-z_]\\w*(?:\\.[A-Za-z_]\\w*)*")).toSeq
            if (bs.nonEmpty) clsBases(c) = bs
          case fromImport(srcMod, items) =>
            if (items.trim == "*" || items.contains("*")) {
              // slice 89: defer — an ABSOLUTE star source may be a
              // closed corpus module whose name set the fold knows
              // exactly; a relative star has no corpus-stable module
              // spelling and keeps the blanket optimism (open)
              if (!srcMod.startsWith(".") && srcMod.nonEmpty)
                starImports += srcMod
              else open = true
            }
            else items.split(",").foreach { it =>
              val parts = it.trim.stripPrefix("(").stripSuffix(")")
                .trim.split("\\s+as\\s+")
              val bound = parts.last.trim
              if (bound.matches("[A-Za-z_]\\w*")) {
                names += bound
                // slice 68: an ABSOLUTE from-import binds the local
                // name to its qualified source — the corpus fold
                // resolves annotations through it (relative imports
                // have no corpus-stable module spelling; skipped)
                val orig = parts.head.trim
                if (!srcMod.startsWith(".") && srcMod.nonEmpty &&
                    orig.matches("[A-Za-z_]\\w*"))
                  importBindings(bound) = s"$srcMod.$orig"
              }
            }
          case importStmt(items) =>
            items.split(",").foreach { it =>
              val parts = it.trim.split("\\s+as\\s+")
              val bound = if (parts.length > 1) parts.last.trim
                else parts.head.trim.split("\\.").head.trim
              if (bound.matches("[A-Za-z_]\\w*")) names += bound
              // slice 69: a plain `import pkg.mod [as m]` binds the
              // alias (or the full dotted path) as a MODULE prefix for
              // dotted annotations — resolved at the corpus fold
              val full = parts.head.trim
              if (full.matches("[A-Za-z_]\\w*(?:\\.[A-Za-z_]\\w*)*")) {
                val key = if (parts.length > 1) parts.last.trim else full
                if (key.matches("[A-Za-z_]\\w*(?:\\.[A-Za-z_]\\w*)*"))
                  modImports(key) = full
              }
            }
          // advisor r17: ANY augmentation/mutation of __all__ after a
          // literal assignment (`+=`, `.append(…)`, `.extend(…)`, …)
          // re-opens the export set — Python binds those names at
          // runtime, so the parsed literal would be a wrong NARROW and
          // the corpus could fabricate star-import disproofs
          case mut if mut.startsWith("__all__") &&
              allMutation.findFirstIn(mut).isDefined =>
            allList = None
          case assignStmt(ind, n) if ind.isEmpty =>
            names += n
            // slice 91: a LITERAL `__all__ = ["a", "b"]` parses into the
            // star-export allow-list (joined across continuation lines);
            // any non-literal spelling keeps allList None — the export
            // fallback is the optimistic superset, never a wrong narrow
            if (n == "__all__") {
              // RAW lines: preprocess blanks string contents, and the
              // allow-list IS string contents. Comments stripped
              // quote-aware so multi-line lists with trailing comments
              // still parse. EVERY re-assignment overwrites — a later
              // dynamic `__all__ = gen()` resets to None (advisor r17:
              // a stale literal must not survive a dynamic rebind).
              val j = (rawLines(li) +: (li + 1 until lines.length)
                .iterator.takeWhile(cont(_)).map(rawLines(_)).toSeq)
                .map(stripHashComment).mkString(" ")
              val eq = j.indexOf('=')
              val rhs = if (eq >= 0) j.substring(eq + 1).trim else ""
              allList = parseAllLiteral(rhs)
            }
            // slice 67: module singleton — a constructor or annotated
            // assignment types the module-level name (simple own-module
            // class names only; resolution at the fold below)
            instanceAssign.findFirstMatchIn(ln) match {
              case Some(m) if m.group(2)
                  .matches("[A-Za-z_]\\w*(?:\\.[A-Za-z_]\\w*)*") =>
                varAnnos(n) = m.group(2) // slice 69: dotted ctors key too
              case _ => ln match {
                case localAnno(_, a)
                    if a.matches("[A-Za-z_]\\w*(?:\\.[A-Za-z_]\\w*)*") =>
                  varAnnos(n) = a
                case _ => ()
              }
            }
          case tupleAssign(ts) =>
            ts.split(",").foreach(t => names += t.trim)
          case forStmt(ind, v) if ind.isEmpty => names += v
          case withAs(v) => names += v
          case _ => ()
        }
      } else if (!cont(li) && ln.trim.nonEmpty && curCls.isDefined) {
        // slices 64-65: first-level class members only (the first
        // statement indent inside the class body; deeper lines live in
        // methods). Methods key their `-> Anno` under Cls.m; a
        // @property method keys it as a FIELD read; annotated
        // class-body fields (`conn: Conn [= ...]`) key as fields too.
        val ind = ln.takeWhile(_.isWhitespace).length
        if (bodyIndent < 0) bodyIndent = ind
        if (ind == bodyIndent) ln match {
          case defHeader(_, d) =>
            if (!badDeco) {
              annoOf(li).foreach { a =>
                defAnnos(s"${curCls.get}.$d") = a
                if (pendingProp) fieldAnnos(s"${curCls.get}.$d") = a
              }
              arrowContainer.findFirstMatchIn(joined(li))
                .foreach(m => elemAnnos(s"${curCls.get}.$d") = m.group(1))
            }
            badDeco = false
            // slice 84 (r15): constructor injection — `def __init__
            // (self, conn: Conn)` + `self.conn = conn` types the field
            // cross-module. Capture the annotated-param map here; the
            // deeper body lines below consume it.
            initParams =
              if (d == "__init__")
                ctorParamAnno.findAllMatchIn(parenSpan(joined(li)))
                  .map(m => m.group(1) -> m.group(2)).toMap
              else null
            pendingProp = false
          case localAnno(f, a)
              if a.matches("[A-Za-z_]\\w*(?:\\.[A-Za-z_]\\w*)*") =>
            initParams = null
            fieldAnnos(s"${curCls.get}.$f") = a
          case _ =>
            initParams = null
            val t = ln.trim
            if (t.startsWith("@")) {
              val deco = t.stripPrefix("@")
                .takeWhile(c => c.isLetterOrDigit || c == '_' || c == '.')
              if (deco == "property" || deco == "cached_property" ||
                  deco == "functools.cached_property") pendingProp = true
              armDeco(t) // slice 88
            } else if (!t.startsWith("#")) {
              // a COMMENT between a decorator and its def must not
              // reset the armed state (reviewer-caught: it silently
              // re-admitted poisoned annotations and dropped @property
              // arms); any real statement does
              pendingProp = false; badDeco = false
            }
        } else if (ind > bodyIndent && initParams != null) {
          // slice 84: inside __init__'s body — `self.f = p` where p is
          // an annotated parameter keys Cls.f as a field fact. An
          // explicit class-body annotation wins (getOrElseUpdate); any
          // re-binding of the field keeps the first take.
          ln match {
            case selfParamAssign(f, p) =>
              initParams.get(p).foreach(a =>
                fieldAnnos.getOrElseUpdate(s"${curCls.get}.$f", a))
            case _ => ()
          }
        }
      }
      // slice 95: while inside a top-level unannotated __getattr__,
      // every `return` statement votes — all must be the same bare
      // `Ctor(...)` construction for the pinned type to hold
      if (inGetattr && !cont(li) && ln.nonEmpty && ln.head.isWhitespace) {
        val rm = """^\s+return\s+(.+?)\s*$""".r
        rm.findFirstMatchIn(ln).foreach { m =>
          val ctor = """^([A-Za-z_]\w*)\s*\(.*\)$""".r
          getattrReturns += (m.group(1) match {
            case ctor(c) => Some(c)
            case _ => None
          })
        }
      }
      // slice 86 (r15): NESTED from-imports — `if TYPE_CHECKING:` /
      // function-local imports bind names this module's annotations
      // reference, which the top-level-only collection missed. They
      // feed IMPORT BINDINGS for annotation resolution ONLY: never
      // `names` (an indented import binds no top-level name, so the
      // disproof side is untouched) and never `open` (a nested
      // `import *` binds locally, not at module scope). Top-level
      // bindings win (first take; line order puts them equal anyway).
      if (!cont(li) && ln.nonEmpty && ln.head.isWhitespace) ln match {
        case fromImport(srcMod, items) if !items.contains("*") =>
          items.split(",").foreach { it =>
            val parts = it.trim.stripPrefix("(").stripSuffix(")")
              .trim.split("\\s+as\\s+")
            val bound = parts.last.trim
            val orig = parts.head.trim
            if (bound.matches("[A-Za-z_]\\w*") &&
                !srcMod.startsWith(".") && srcMod.nonEmpty &&
                orig.matches("[A-Za-z_]\\w*"))
              importBindings.getOrElseUpdate(bound, s"$srcMod.$orig")
          }
        case _ => ()
      }
    }
    // slice 68: annotations stay RAW here (module-qualified keys,
    // simple-name values) — resolution moved to the corpus fold where
    // every module's class set is visible, so an imported-class
    // annotation (`from models import User` + `-> User`) types too
    // slice 95: the unannotated arm's vote — a unanimous single-ctor
    // return body pins the type like an annotation would
    val gaPinned = getattrAnno.orElse {
      val rs = getattrReturns.toSeq
      if (rs.nonEmpty && rs.forall(_.isDefined) &&
          rs.flatten.distinct.size == 1) rs.head
      else None
    }
    ModuleScan(mod, names.toSet, open, classes.toSet,
      defAnnos.iterator.map { case (d, a) => s"$mod.$d" -> a }.toMap,
      fieldAnnos.iterator.map { case (f, a) => s"$mod.$f" -> a }.toMap,
      varAnnos.iterator.map { case (v, a) => s"$mod.$v" -> a }.toMap,
      importBindings.toMap, modImports.toMap, clsBases.toMap,
      elemAnnos.iterator.map { case (d, a) => s"$mod.$d" -> a }.toMap,
      starImports.distinct.toSeq, allList, gaPinned)
  }

  /** Fold per-module binding scans into the [[CorpusContext]] the deep
    * slices consume: open modules are excluded from the DISPROOF side
    * (they cannot disprove) but contribute their positive return facts;
    * bound names are module-qualified. Annotation resolution (slice 68)
    * runs here, with the whole corpus visible: an annotation names the
    * scanning module's OWN class, or — new — a class it FROM-IMPORTS
    * from another scanned module (aliases included: `import User as U`
    * + `-> U` types as the source class). An import whose target module
    * is out of corpus, or whose name is not a class there, resolves to
    * nothing — the optimistic take stays, the corpus never guesses. */
  /** Slice 89 (r16, verdict task #4): STAR-IMPORT resolution against
    * the corpus. `from X import *` of a CLOSED indexed module binds
    * exactly X's exported top-level names (Python's default export set
    * — underscore names stay home unless `__all__` is declared, in
    * which case the optimistic superset is kept: a too-large name set
    * only withholds a disproof, never fabricates one); the importer
    * also gains import bindings name → X.name so annotations resolve
    * and facades chase through the star. A star of an open or
    * out-of-corpus module OPENS the importer (jedi can bind anything
    * through it — the pre-slice-89 blanket), and openness propagates
    * through star chains. Name sets union to a fixpoint, so star
    * CYCLES between closed modules converge to the optimistic union —
    * sound for disproof. */
  private def resolveStars(scans0: Seq[ModuleScan]): Seq[ModuleScan] = {
    if (scans0.forall(_.starImports.isEmpty)) return scans0
    val byMod = scans0.iterator.map(s => s.mod -> s).toMap
    val open = mutable.Map.empty[String, Boolean]
    scans0.foreach(s => open(s.mod) =
      s.open || s.starImports.exists(!byMod.contains(_)))
    var changed = true
    while (changed) {
      changed = false
      scans0.foreach { s =>
        if (!open(s.mod) && s.starImports.exists(open(_))) {
          open(s.mod) = true; changed = true
        }
      }
    }
    val names = mutable.Map.empty[String, Set[String]]
    val imports = mutable.Map.empty[String, Map[String, String]]
    scans0.foreach { s =>
      names(s.mod) = s.names; imports(s.mod) = s.imports
    }
    def exported(m: String): Set[String] = {
      val ns = names(m)
      byMod(m).allList match {
        // slice 91: a parsed literal __all__ IS the export set —
        // Python's own star-import rule
        case Some(al) => al.toSet
        // an unparsed (dynamic) __all__ keeps the optimistic superset:
        // a too-large set only withholds a disproof
        case None if ns.contains("__all__") => ns
        case None => ns.filterNot(_.startsWith("_"))
      }
    }
    changed = true
    while (changed) {
      changed = false
      scans0.foreach { s =>
        if (!open(s.mod)) s.starImports.foreach { src =>
          exported(src).foreach { x =>
            if (!names(s.mod).contains(x)) {
              names(s.mod) += x
              // own bindings (and earlier stars) win; the qualified
              // target may itself be src's re-export — chaseClass
              // follows it through src's effective imports
              if (!imports(s.mod).contains(x))
                imports(s.mod) += x -> s"$src.$x"
              changed = true
            }
          }
        }
      }
    }
    scans0.map(s => s.copy(open = open(s.mod), names = names(s.mod),
      imports = imports(s.mod)))
  }

  def corpusContext(scans0: Seq[ModuleScan]): CorpusContext = {
    val scans = resolveStars(scans0)
    val closed = scans.filterNot(_.open)
    val scansByMod = scans.iterator.map(s => s.mod -> s).toMap
    // slice 85 (r15): RE-EXPORT chasing — `from mod_core import User`
    // in a facade module + `from facade import User` elsewhere must
    // resolve to mod_core.User. Chase a qualified `mod.Name` through
    // each module's own from-import bindings until a module DEFINES
    // the class (bounded hops; an out-of-corpus or non-class end
    // binds nothing — the corpus never guesses).
    @annotation.tailrec
    def chaseClass(q: String, hops: Int = 4): Option[String] = {
      val i = q.lastIndexOf('.')
      if (i <= 0) None
      else {
        val (m, c) = (q.substring(0, i), q.substring(i + 1))
        scansByMod.get(m) match {
          case Some(ms) if ms.classes.contains(c) => Some(s"$m.$c")
          case Some(ms) if hops > 0 && ms.imports.contains(c) =>
            chaseClass(ms.imports(c), hops - 1)
          case _ => None
        }
      }
    }
    def resolve(s: ModuleScan)(anno: String): Option[String] =
      if (!anno.contains('.')) {
        if (s.classes.contains(anno)) Some(s"${s.mod}.$anno")
        else s.imports.get(anno).flatMap(q => chaseClass(q))
      } else {
        // slice 69: dotted `prefix.Cls` — the prefix must be one of the
        // scanning module's OWN `import` bindings (alias or full dotted
        // path); the class must exist in the bound module's scan (or
        // chase its re-exports, slice 85)
        val i = anno.lastIndexOf('.')
        val (pref, cls) = (anno.substring(0, i), anno.substring(i + 1))
        s.modImports.get(pref).flatMap(m => chaseClass(s"$m.$cls"))
      }
    def resolved(pick: ModuleScan => Map[String, String])
        : Map[String, String] =
      scans.iterator.flatMap { s =>
        pick(s).iterator.flatMap { case (k, a) =>
          resolve(s)(a).map(k -> _) }
      }.toMap
    // slice 83 (r15, verdict task #4): TRANSITIVE cross-module MRO.
    // Slice 66 consults corpus facts per MRO class, but the per-class
    // facts above only cover members declared ON the scanned class —
    // a chain `local Sub(a.Mid)` where `a.Mid(b.Base)` inherited
    // nothing from b.Base. Here, with every module's scan visible,
    // each scanned class's base list resolves through the SAME import
    // resolution as annotations, linearizes with the shared C3 kernel
    // ([[graft.enrich.Closure.c3Merge]] — base order preserved,
    // out-of-corpus ancestors drop, so they bind nothing), and member
    // facts FLATTEN ancestor-ward: a fact declared on b.Base surfaces
    // keyed a.Mid.m too, nearest MRO declaration winning. The local
    // mroOf + corpus lookups then see two-hop inheritance for free.
    val baseMap: Map[String, Seq[String]] =
      scans.iterator.flatMap { s =>
        s.bases.iterator.map { case (c, bs) =>
          s"${s.mod}.$c" -> bs.flatMap(b => resolve(s)(b))
        }
      }.filter(_._2.nonEmpty).toMap
    val mroMemo = mutable.Map.empty[String, Seq[String]]
    def mroOf(c: String): Seq[String] = mroMemo.get(c) match {
      case Some(m) => m
      case None =>
        mroMemo(c) = Seq(c) // cycle guard (illegal Python anyway)
        val bs = baseMap.getOrElse(c, Seq.empty)
        val res =
          if (bs.isEmpty) Seq(c)
          else graft.enrich.Closure.c3Merge(c,
            bs.map(b => mroOf(b).toList) :+ bs.toList)
        mroMemo(c) = res
        res
    }
    def flatten(facts: Map[String, String]): Map[String, String] = {
      val byOwner = facts.toSeq
        .groupBy { case (k, _) => k.substring(0, k.lastIndexOf('.')) }
        .map { case (o, kvs) => o -> kvs.map { case (k, v) =>
          k.substring(o.length + 1) -> v }.toMap }
      val inherited = baseMap.keysIterator.flatMap { c =>
        val own = byOwner.getOrElse(c, Map.empty[String, String])
        val merged = mutable.Map.empty[String, String]
        mroOf(c).drop(1).foreach { a =>
          byOwner.getOrElse(a, Map.empty[String, String]).foreach {
            case (m, t) =>
              if (!own.contains(m) && !merged.contains(m)) merged(m) = t
          }
        }
        merged.iterator.map { case (m, t) => s"$c.$m" -> t }
      }.toMap
      inherited ++ facts
    }
    // slice 95 (r18): resolve each pinned __getattr__ type through the
    // SAME import resolution as every other annotation; the module's
    // own top-level names ride along so a real binding never routes
    // through the dynamic-attribute type
    val getattrs: Map[String, String] = scans.iterator.flatMap { s =>
      s.getattrAnno.flatMap(a => resolve(s)(a)).map(s.mod -> _)
    }.toMap
    CorpusContext(
      closed.iterator.map(_.mod).toSet,
      closed.iterator.flatMap { s =>
        s.names.iterator.map(n => s"${s.mod}.$n") }.toSet,
      flatten(resolved(_.returns)),
      flatten(resolved(_.fields)),
      resolved(_.vars),
      flatten(resolved(_.returnElems)),
      closed.iterator.map { s =>
        s.mod -> (s.allList match {
          case Some(al) => al.toSet
          case None if s.names.contains("__all__") => s.names
          case None => s.names.filterNot(_.startsWith("_"))
        })
      }.toMap,
      getattrs,
      scans.iterator.filter(s => getattrs.contains(s.mod))
        .map(s => s.mod -> s.names).toMap)
  }
}
