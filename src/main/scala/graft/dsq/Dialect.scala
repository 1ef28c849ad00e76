package graft.dsq

import scala.collection.mutable
import scala.util.matching.Regex

/** SQLite-dialect → Spark SQL translation (reference §4.2 item 1; the
  * reference's own rewrite is main.go:54-88 plus SQLite's parser).
  *
  * Passes, in order:
  *  1. table-ref macros `{}`/`{N}`/`{N,"path"}`/`{"path"}` → view names
  *     `t_N` (+ captured object path);
  *  2. double-quoted tokens: identifier if they name a known column
  *     (SQLite resolves quoted identifiers first), else string literal;
  *  3. `REGEXP` → `RLIKE`, `x -> y`/`x ->> y` → `get_json_object`;
  *  4. output labels: SQLite names result columns by the verbatim select-
  *     item text (reference test expects keys like "COUNT(*)").
  */
object Dialect {

  final case class TableRef(index: Int, path: Option[String])

  // {} | {N} | {N, "path"} | {"path"} — reference tableFileRe main.go:54-88
  private val refRe: Regex =
    """\{(\d*)\s*(?:,\s*)?(?:"([^"]*)"|'([^']*)')?\}""".r

  /** Replace table macros with `t_N` view names; return refs in order. */
  def extractTableRefs(q: String): (String, Seq[TableRef]) = {
    val refs = mutable.LinkedHashSet[TableRef]()
    val out = refRe.replaceAllIn(q, m => {
      val idx = Option(m.group(1)).filter(_.nonEmpty).map(_.toInt).getOrElse(0)
      val path = Option(m.group(2)).orElse(Option(m.group(3))).filter(_.nonEmpty)
      refs += TableRef(idx, path)
      Regex.quoteReplacement(viewName(TableRef(idx, path)))
    })
    (out, refs.toSeq)
  }

  def viewName(r: TableRef): String =
    r.path match {
      case None => s"t_${r.index}"
      case Some(p) =>
        // unsigned hex of a 64-bit FNV-1a — math.abs(hashCode) kept the
        // sign for Int.MinValue (invalid identifier) and 32 bits invites
        // path collisions silently binding one path's data to the other
        var h = 0xcbf29ce484222325L
        p.foreach { c => h ^= c; h *= 0x100000001b3L }
        s"t_${r.index}_p" + java.lang.Long.toHexString(h)
    }

  /** Token-level translation with full quote awareness. `columns` is the
    * union of column names across registered tables (for the
    * identifier-vs-string-literal decision on double quotes).
    */
  def translate(q: String, columns: Set[String]): String = {
    // SQLite resolves quoted identifiers case-insensitively; Spark's
    // analyzer is case-insensitive too, so matching by lowercase and
    // emitting the quoted text as-typed resolves correctly.
    val columnsLower = columns.map(_.toLowerCase)
    val sb = new StringBuilder
    var i = 0
    val n = q.length
    while (i < n) {
      q.charAt(i) match {
        case '\'' => // string literal: copy verbatim (incl. '' escapes)
          val j = endOfSingleQuoted(q, i)
          sb.append(q.substring(i, j)); i = j
        case '"' => // quoted token: identifier or (fallback) string
          val j = endOfDoubleQuoted(q, i)
          val content = q.substring(i + 1, j - 1).replace("\"\"", "\"")
          if (columnsLower.contains(content.toLowerCase))
            sb.append('`').append(content.replace("`", "``")).append('`')
          else
            sb.append('\'').append(content.replace("'", "''")).append('\'')
          i = j
        case '`' =>
          val j = endOfBackQuoted(q, i)
          sb.append(q.substring(i, j)); i = j
        case '-' if i + 1 < n && q.charAt(i + 1) == '>' =>
          // -> / ->> copied verbatim; arrowRewrite handles them after
          val op = if (i + 2 < n && q.charAt(i + 2) == '>') { i += 3; "->>" }
          else { i += 2; "->" }
          sb.append(op)
        case c if c.isLetter || c == '_' =>
          val j = endOfWord(q, i)
          val w = q.substring(i, j)
          if (w.equalsIgnoreCase("REGEXP")) sb.append("RLIKE")
          else sb.append(w)
          i = j
        case c => sb.append(c); i += 1
      }
    }
    arrowRewrite(sb.toString)
  }

  /** `expr -> key` / `expr ->> key`. SQLite semantics (reference
    * README.md:389-403): `->` returns a JSON fragment — string values
    * KEEP their quotes — while `->>` returns raw text. `->>` maps to
    * Spark's codegen'd get_json_object (same raw-text contract); `->`
    * maps to the dsq_json_frag UDF (Stdlib) which re-serializes the
    * extracted node as JSON. Operand forms: identifier/backticked
    * column/previous arrow result on the left; integer or string literal
    * on the right.
    */
  // The left operand may be the output of a previous rewrite round, which
  // nests one paren level deeper per chain link — build a balanced-paren
  // matcher to a fixed depth (3 levels ≙ arrow chains of depth 5, beyond
  // any realistic query; SQLite itself encourages '$.a.b' paths instead).
  private val arrowRe: Regex = {
    val parens = (1 to 3).foldLeft("[^()]*") { (inner, _) =>
      s"(?:[^()]|\\($inner\\))*"
    }
    // left operand: ANY call with balanced parens (SQLite allows arbitrary
    // expressions — upper(c)->'k' — and chains nest one call per link),
    // a parenthesized expression, a backticked/bare column, or a previous
    // rewrite's output; right operand: integer or string literal only
    // (a non-literal right operand means Spark lambda syntax, not JSON).
    (s"""((?:[A-Za-z_][A-Za-z0-9_]*)?\\($parens\\)|`[^`]+`|""" +
      """[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)?)""" +
      """\s*(->>?)\s*('(?:[^']|'')*'|\d+)""").r
  }

  // residual arrow in the JSON-chain shape (literal right operand) after
  // the fixpoint → the chain out-nested the matcher's paren depth
  private val residualChainRe: Regex = """->>?\s*(?:'(?:[^']|'')*'|\d+)""".r

  // Spark higher-order functions whose lambda parameters must NOT be
  // json-arrow-rewritten even when the lambda body is a literal
  // (`transform(a, x -> 0)`): the arrow there is lambda syntax.
  private val hofNames = Set("transform", "filter", "exists", "forall",
    "aggregate", "reduce", "zip_with", "map_filter", "map_zip_with",
    "transform_keys", "transform_values", "array_sort")

  private val multiParamTupleRe =
    """\(\s*[A-Za-z_][A-Za-z0-9_]*(\s*,\s*[A-Za-z_][A-Za-z0-9_]*)+\s*\)"""
  private val singleParamTupleRe = """\(\s*[A-Za-z_][A-Za-z0-9_]*\s*\)"""

  /** True iff the arrow whose LEFT operand spans [leftStart, …) sits in
    * lambda-parameter position. Two cases: (a) the operand is a bare
    * identifier tuple `(acc, x)` — never a valid scalar expression, so
    * skipping the JSON rewrite is always safe; (b) a single identifier
    * (`transform(a, x -> 0)`) or single parenthesized parameter
    * (`transform(a, (x) -> 0)`, valid Spark lambda syntax) that is a
    * direct argument of a known higher-order function. A lone
    * `c ->> 'k'` / `(c) -> 'k'` or one nested in an ordinary call
    * (`upper(c->>'k')`, `f(a, b->'x')`) stays a JSON arrow.
    */
  private def inLambdaPosition(seg: String, leftStart: Int,
      leftOperand: String): Boolean = {
    if (leftOperand.matches(multiParamTupleRe)) return true
    if (!leftOperand.matches("[A-Za-z_][A-Za-z0-9_]*") &&
      !leftOperand.matches(singleParamTupleRe)) return false
    var p = leftStart - 1
    while (p >= 0 && seg.charAt(p).isWhitespace) p -= 1
    if (p < 0 || (seg.charAt(p) != ',' && seg.charAt(p) != '(')) return false
    // walk back to the '(' opening the argument list containing the operand,
    // then read the callee identifier immediately before it
    var depth = 0
    while (p >= 0) {
      val c = seg.charAt(p)
      if (c == ')') depth += 1
      else if (c == '(') {
        if (depth == 0) {
          var e = p - 1
          while (e >= 0 && seg.charAt(e).isWhitespace) e -= 1
          var s2 = e
          while (s2 >= 0 && (seg.charAt(s2).isLetterOrDigit ||
            seg.charAt(s2) == '_')) s2 -= 1
          return hofNames.contains(
            seg.substring(s2 + 1, e + 1).toLowerCase(java.util.Locale.ROOT))
        }
        depth -= 1
      }
      p -= 1
    }
    false
  }

  /** Locate the left operand of a residual arrow at `arrowStart` (walking
    * back over a balanced-paren group or an identifier) and ask
    * [[inLambdaPosition]] whether it is lambda syntax rather than an
    * over-deep JSON chain.
    */
  private def residualIsLambda(seg: String, arrowStart: Int): Boolean = {
    var p = arrowStart - 1
    while (p >= 0 && seg.charAt(p).isWhitespace) p -= 1
    if (p < 0) return false
    val leftEnd = p + 1
    var leftStart = 0
    if (seg.charAt(p) == ')') {
      var depth = 1
      var j = p - 1
      while (j >= 0 && depth > 0) {
        val c = seg.charAt(j)
        if (c == ')') depth += 1 else if (c == '(') depth -= 1
        j -= 1
      }
      var s2 = j
      while (s2 >= 0 && (seg.charAt(s2).isLetterOrDigit ||
        seg.charAt(s2) == '_')) s2 -= 1
      leftStart = s2 + 1
    } else {
      var s2 = p
      while (s2 >= 0 && (seg.charAt(s2).isLetterOrDigit ||
        seg.charAt(s2) == '_' || seg.charAt(s2) == '.' ||
        seg.charAt(s2) == '`')) s2 -= 1
      leftStart = s2 + 1
    }
    inLambdaPosition(seg, leftStart, seg.substring(leftStart, leftEnd))
  }

  /** The already-flushed prefix with string-literal CONTENTS blanked to
    * spaces (quotes kept): [[inLambdaPosition]]'s backward walk crosses
    * segment boundaries through this, so a freestanding literal earlier
    * in the argument list (`transform(split(t, ','), x -> 0)`) can't
    * hide the enclosing higher-order callee, and unbalanced parens
    * INSIDE literals (`split(t, '(')`) can't derail the depth count.
    */
  private def blankLiterals(s: String): String = {
    val sb = new StringBuilder(s)
    var i = 0
    while (i < sb.length) {
      if (sb.charAt(i) == '\'') {
        val j = endOfSingleQuoted(s, i)
        var p = i + 1
        while (p < j - 1) { sb.setCharAt(p, ' '); p += 1 }
        i = j
      } else i += 1
    }
    sb.toString
  }

  /** Quote-aware: string literals are copied verbatim; the arrow regex
    * only runs on non-literal segments, iterated to a fixpoint so chained
    * `a->'x'->'y'` rewrites left-to-right (the left alternative matches
    * the get_json_object(...) produced by the previous pass).
    */
  private def arrowRewrite(q: String): String = {
    val out = new StringBuilder
    var i = 0
    var segStart = 0
    def flushSegment(end: Int): Unit = {
      var seg = q.substring(segStart, end)
      val ctx = blankLiterals(out.toString)
      var prev: String = null
      var rounds = 0
      while (seg != prev && rounds < 8) {
        prev = seg
        val segSnapshot = seg
        seg = arrowRe.replaceAllIn(seg, m => {
          val target = m.group(1)
          if (inLambdaPosition(ctx + segSnapshot, ctx.length + m.start, target))
            Regex.quoteReplacement(m.matched) // Spark lambda, not JSON
          else {
            val op = m.group(2)
            val key = m.group(3)
            val jsonPath =
              if (key.matches("\\d+")) s"'$$[$key]'"
              else {
                val content = key.substring(1, key.length - 1)
                s"'$$.$content'"
              }
            val fn = if (op == "->>") "get_json_object" else "dsq_json_frag"
            Regex.quoteReplacement(s"$fn($target, $jsonPath)")
          }
        })
        rounds += 1
      }
      // a residual ->/->>  WITH a literal right operand is a JSON arrow
      // chain deeper than the matcher's paren depth: fail loudly at
      // translate time instead of handing Spark an unparseable '->'.
      // Arrows with non-literal right operands are Spark higher-order
      // lambdas (transform(a, x -> upper(x))) and pass through untouched.
      if (residualChainRe.findAllMatchIn(seg)
          .exists(m => !residualIsLambda(ctx + seg, ctx.length + m.start)))
        throw DsqError("Unsupported JSON arrow chain depth (max 5); " +
          "use a single '$.a.b.…' path instead.")
      out.append(seg)
    }
    while (i < q.length) {
      if (q.charAt(i) == '\'') {
        // a literal that is an arrow's key operand belongs IN the segment
        // (c->>'k'); only a freestanding literal is protected
        var p = i - 1
        while (p >= 0 && q.charAt(p).isWhitespace) p -= 1
        val isArrowKey = p >= 1 && q.charAt(p) == '>' &&
          (q.charAt(p - 1) == '-' || q.charAt(p - 1) == '>')
        val j = endOfSingleQuoted(q, i)
        if (!isArrowKey) {
          flushSegment(i)
          out.append(q.substring(i, j))
          segStart = j
        }
        i = j
      } else i += 1
    }
    flushSegment(q.length)
    out.toString
  }

  private def endOfSingleQuoted(q: String, start: Int): Int = {
    var i = start + 1
    while (i < q.length) {
      if (q.charAt(i) == '\'') {
        if (i + 1 < q.length && q.charAt(i + 1) == '\'') i += 2
        else return i + 1
      } else i += 1
    }
    q.length
  }

  private def endOfDoubleQuoted(q: String, start: Int): Int = {
    var i = start + 1
    while (i < q.length) {
      if (q.charAt(i) == '"') {
        if (i + 1 < q.length && q.charAt(i + 1) == '"') i += 2
        else return i + 1
      } else i += 1
    }
    q.length
  }

  private def endOfBackQuoted(q: String, start: Int): Int = {
    var i = start + 1
    while (i < q.length && q.charAt(i) != '`') i += 1
    math.min(i + 1, q.length)
  }

  private def endOfWord(q: String, start: Int): Int = {
    var i = start
    while (i < q.length && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '_')) i += 1
    i
  }

  // --- output labels ----------------------------------------------------

  /** SQLite-style result column labels from the ORIGINAL query text:
    * explicit `AS x` → x; implicit trailing-identifier alias → it; bare
    * (possibly qualified/quoted) column → unquoted last component;
    * any other expression → its verbatim text. Returns None when the
    * query isn't a single plain SELECT or contains `*` items.
    */
  def outputLabels(q: String): Option[Seq[String]] = {
    val t = q.trim.stripSuffix(";")
    val upper = t.toUpperCase
    if (!upper.startsWith("SELECT")) return None
    var i = "SELECT".length
    if (upper.startsWith("SELECT DISTINCT")) i = "SELECT DISTINCT".length
    // find top-level FROM
    var depth = 0; var j = i; var fromAt = -1
    while (j < t.length && fromAt < 0) {
      t.charAt(j) match {
        case '\'' => j = endOfSingleQuoted(t, j) - 1
        case '"' => j = endOfDoubleQuoted(t, j) - 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if depth == 0 && (c == 'F' || c == 'f') &&
          j + 4 <= t.length && t.substring(j, j + 4).equalsIgnoreCase("FROM") &&
          (j == 0 || !t.charAt(j - 1).isLetterOrDigit) &&
          (j + 4 == t.length || !t.charAt(j + 4).isLetterOrDigit) =>
          fromAt = j
        case _ =>
      }
      j += 1
    }
    val selectList = if (fromAt < 0) t.substring(i) else t.substring(i, fromAt)
    val items = splitTopLevel(selectList)
    if (items.isEmpty || items.exists(it => it.trim == "*" || it.trim.endsWith(".*")))
      return None
    Some(items.map(labelOf))
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' => i = endOfSingleQuoted(s, i) - 1
        case '"' => i = endOfDoubleQuoted(s, i) - 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private val keywords = Set("FROM", "WHERE", "GROUP", "ORDER", "HAVING",
    "LIMIT", "AND", "OR", "NOT", "NULL", "TRUE", "FALSE", "END", "ASC", "DESC")

  private def labelOf(item: String): String = {
    val it = item.trim
    // explicit AS
    val asRe = """(?is)^(.*\S)\s+AS\s+("(?:[^"]|"")*"|`[^`]*`|[A-Za-z_][A-Za-z0-9_]*)\s*$""".r
    it match {
      case asRe(_, alias) => return unquoteIdent(alias)
      case _ =>
    }
    // bare column reference: [tbl.]col, possibly quoted
    val colRe = """(?s)^(?:[A-Za-z_][A-Za-z0-9_]*\.|"(?:[^"]|"")*"\.|`[^`]*`\.)?("(?:[^"]|"")*"|`[^`]*`|[A-Za-z_][A-Za-z0-9_]*)$""".r
    it match {
      case colRe(last) if !keywords.contains(last.toUpperCase) =>
        return unquoteIdent(last)
      case _ =>
    }
    // implicit alias: expression ending in ')' or quote, then identifier
    val implicitRe = """(?s)^(.*(?:\)|'|"))\s+("(?:[^"]|"")*"|`[^`]*`|[A-Za-z_][A-Za-z0-9_]*)\s*$""".r
    it match {
      case implicitRe(_, alias) if !keywords.contains(alias.toUpperCase) =>
        return unquoteIdent(alias)
      case _ =>
    }
    it
  }

  private def unquoteIdent(s: String): String =
    if (s.startsWith("\"") && s.endsWith("\""))
      s.substring(1, s.length - 1).replace("\"\"", "\"")
    else if (s.startsWith("`") && s.endsWith("`"))
      s.substring(1, s.length - 1)
    else s
}
