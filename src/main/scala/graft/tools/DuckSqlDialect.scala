package graft.tools

/** Mechanical DuckDB→Spark SQL dialect translation for the oracle texts —
  * dev/test tooling only (the shipped engine never parses oracle SQL; this
  * exists so SqlParitySpec can run MORE of the registry's oracles through
  * `spark.sql` as a third independent evaluation of each query's
  * semantics).
  *
  * Only differences that are PURELY SYNTACTIC are rewritten — integer
  * division spelling, function names with identical semantics on the
  * testbed's value domains, 1-indexed list subscripts → element_at, list
  * literals → array(...), `unnest` → `explode`. Anything whose semantics
  * could drift (rounding carriers, recursive CTE set semantics, ordered
  * list() aggregates, HUGEINT arithmetic) is left alone; such oracles
  * simply stay out of the parity set. The parity spec compares RESULTS, so
  * a translation rule that were subtly wrong cannot silently pass — it
  * would show up as a row/value mismatch. Translated texts must be parsed
  * with `spark.sql.parser.escapedStringLiterals=true` (DuckDB literals are
  * raw; the oracles' regexes rely on that) — see
  * [[SqlParityProbe.withRawLiterals]].
  */
object DuckSqlDialect {

  /** Function spellings with identical semantics on both engines (for the
    * argument types the oracles use). Word-boundary renames. */
  private val FnRenames: Seq[(String, String)] = Seq(
    "epoch_us" -> "unix_micros",
    // DuckDB epoch() yields seconds (the oracles always floor it);
    // unix_timestamp is Spark's floored-seconds twin
    "epoch" -> "unix_timestamp",
    "string_split" -> "split",
    "list_contains" -> "array_contains",
    "list_transform" -> "transform",
    "list_filter" -> "filter",
    "list_sort" -> "array_sort",
    "list_distinct" -> "array_distinct",
    "list_min" -> "array_min",
    "list_max" -> "array_max",
    "generate_series" -> "sequence",
    "arg_min" -> "min_by",
    "arg_max" -> "max_by",
    // same $-path semantics; Spark returns the raw string like DuckDB's
    // _string variant (the plain json_extract would quote it)
    "json_extract_string" -> "get_json_object",
    "unnest" -> "explode")

  /** Placeholder delimiter for shielded string literals — a char that
    * cannot appear in SQL text AND survives `String.trim` (trim strips
    * everything ≤ 0x20, so a low control char would silently lose its
    * delimiters inside argument-splitting helpers). */
  private val Shield: Char = 127.toChar

  /** DuckDB→Spark translation of one oracle text. Deterministic, total —
    * returns the best-effort translation; the caller decides by RUNNING it
    * whether the result is usable. */
  def toSpark(sql: String): String = {
    // 1. shield string literals so operators/brackets inside them survive
    val literals = scala.collection.mutable.ArrayBuffer.empty[String]
    val shielded = "'(?:[^']|'')*'".r.replaceAllIn(sql, m => {
      literals += m.matched
      java.util.regex.Matcher.quoteReplacement(
        s"${Shield}L${literals.size - 1}$Shield")
    })
    def literalOf(token: String): Option[String] = {
      val t = token.trim
      if (t.length > 3 && t.head == Shield && t.last == Shield && t(1) == 'L')
        t.substring(2, t.length - 1).toIntOption.map(literals)
      else None
    }
    var s = shielded
    // 2. integer division: DuckDB `//` is Spark `div` (both floor on the
    //    BIGINT domains the oracles use)
    s = s.replace("//", " div ")
    // 3. table-function forms with a column alias, BEFORE any scalar
    //    rewrites touch them: DuckDB `range(N) t(r)` / `generate_series(a,
    //    b) t(d)` become explode-subqueries (range is end-EXCLUSIVE,
    //    generate_series end-INCLUSIVE — mirrored exactly)
    s = s.replaceAll(
      "\\brange\\(([^()]*)\\)\\s+(\\w+)\\((\\w+)\\)",
      "(SELECT explode(sequence(0, ($1) - 1)) AS $3) $2")
    s = s.replaceAll(
      "\\bgenerate_series\\(([^()]*)\\)\\s+(\\w+)\\((\\w+)\\)",
      "(SELECT explode(sequence($1)) AS $3) $2")
    // 4. list literal with subscript: (['a','b'])[idx] → element_at(array(..), idx)
    s = subscriptedListLiteral(s)
    // 5. identifier subscripts: DuckDB lists are 1-indexed like
    //    element_at; Spark's `x[i]` would be 0-indexed (off by one AND out
    //    of bounds at the last element)
    s = subscriptToElementAt(s)
    // 6. remaining bare [a, b] list literals → array(a, b)
    s = bareListLiterals(s)
    // 7. calls needing argument surgery (before renames — original names)
    s = rewriteCall(s, "quantile_cont") { args =>
      val (x, p) = splitTopLevel(args)
      s"percentile_cont($p) WITHIN GROUP (ORDER BY $x)"
    }
    s = rewriteCall(s, "list_sum") { arg =>
      // DOUBLE accumulator: exact for the testbed's integer sums (< 2^53)
      // and the float norms alike; oracles cast their outputs anyway
      s"aggregate($arg, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE))"
    }
    s = rewriteCall(s, "encode") { args =>
      // DuckDB encode(s) → UTF-8 blob; Spark spells the charset explicitly
      if (splitParts(args).length == 1) s"encode($args, 'UTF-8')"
      else s"encode($args)"
    }
    s = rewriteCall(s, "datediff") { args =>
      // DuckDB datediff('day', a, b) → Spark datediff(DAY, a, b): the
      // unit is a KEYWORD there, not a string literal
      val parts = splitParts(args)
      val unit = if (parts.length == 3) literalOf(parts.head) else None
      unit match {
        case Some(lit) =>
          val u = lit.stripPrefix("'").stripSuffix("'").toUpperCase
          s"datediff($u, ${parts(1)}, ${parts(2)})"
        case None => s"datediff($args)"
      }
    }
    s = rewriteCall(s, "regexp_replace") { args =>
      // DuckDB needs the 'g' flag for replace-all; Spark replaces all by
      // default and reads a 4th arg as a position — drop the flag
      val parts = splitParts(args)
      if (parts.length == 4 && literalOf(parts.last).contains("'g'"))
        s"regexp_replace(${parts.take(3).mkString(", ")})"
      else s"regexp_replace($args)"
    }
    s = rewriteCall(s, "list_reduce") { args =>
      // the oracles' fold shape list_reduce(list_prepend(z, l), f) has an
      // exact Spark twin with an explicit zero: aggregate(l, z, f)
      val (first, f) = splitTopLevel(args)
      if (first.startsWith("list_prepend(") && first.endsWith(")")) {
        val (z, l) = splitTopLevel(
          first.stripPrefix("list_prepend(").stripSuffix(")"))
        s"aggregate($l, $z, $f)"
      } else s"list_reduce($args)"
    }
    // 8. scalar range(a, b[, s]) is end-EXCLUSIVE; sequence is inclusive
    s = rewriteCall(s, "range") { args =>
      splitParts(args) match {
        case Seq(n) => s"sequence(0, ($n) - 1)"
        case Seq(a, b) => s"sequence($a, ($b) - 1)"
        case Seq(a, b, st) => s"sequence($a, ($b) - 1, $st)"
        case other => s"range(${other.mkString(", ")})"
      }
    }
    // 8a. DuckDB's regexp_extract_all defaults to group 0; Spark to 1
    s = rewriteCall(s, "regexp_extract_all") { args =>
      if (splitParts(args).length == 2) s"regexp_extract_all($args, 0)"
      else s"regexp_extract_all($args)"
    }
    // 8aa. json_valid has no Spark spelling; a whole-document $ probe is
    //      its twin for the oracles' use (non-NULL input, validity test):
    //      get_json_object returns NULL exactly on unparseable input
    s = rewriteCall(s, "json_valid") { arg =>
      s"(get_json_object($arg, '$$') IS NOT NULL)"
    }
    // 8ab. null-safe equality: Spark's parser has no IS [NOT] DISTINCT
    //      FROM; <=> is its null-safe-equal twin
    s = s.replaceAll("(?i)(\\S+)\\s+IS\\s+NOT\\s+DISTINCT\\s+FROM\\s+(\\S+)",
      "$1 <=> $2")
    // 8b. aggregate FILTER (cond): Spark requires FILTER (WHERE cond)
    s = s.replaceAll("(?i)\\bFILTER\\s*\\(\\s*(?!WHERE\\b)", "FILTER (WHERE ")
    // 9. window-function null treatment: DuckDB puts IGNORE NULLS inside
    //    the call parens, Spark after them
    s = s.replaceAll("\\(([^()]*?)\\s+IGNORE\\s+NULLS\\)", "($1) IGNORE NULLS")
    // 10. function renames
    for ((from, to) <- FnRenames)
      s = s.replaceAll(s"\\b$from\\s*\\(", to + "(")
    // 11. len() is DuckDB's overloaded length: size() for the list uses in
    //     the oracles (string length is spelled `length` there)
    s = s.replaceAll("\\blen\\s*\\(", "size(")
    // 12. bare VARCHAR casts: Spark wants STRING (VARCHAR needs a length)
    s = s.replaceAll("\\bVARCHAR\\b", "STRING")
    // 13. unshield literals
    literals.zipWithIndex.foldLeft(s) { case (acc, (lit, i)) =>
      acc.replace(s"${Shield}L$i$Shield", lit)
    }
  }

  /** Rewrite every `fn(<args>)` call (balanced parens) through `f`. Runs on
    * shielded text, so parens inside string literals cannot confuse the
    * scan. */
  private def rewriteCall(sql: String, fn: String)(f: String => String): String = {
    val m = s"\\b$fn\\s*\\(".r.findFirstMatchIn(sql)
    m match {
      case None => sql
      case Some(hit) =>
        var depth = 1
        var i = hit.end
        while (i < sql.length && depth > 0) {
          sql.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        if (depth != 0) sql
        else {
          val args = sql.substring(hit.end, i - 1)
          // recurse on args and tail so nested/following calls rewrite too
          sql.substring(0, hit.start) + f(rewriteCall(args, fn)(f)) +
            rewriteCall(sql.substring(i), fn)(f)
        }
    }
  }

  /** Split `args` at its single top-level comma. */
  private def splitTopLevel(args: String): (String, String) = {
    var depth = 0
    var i = 0
    while (i < args.length) {
      args.charAt(i) match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          return (args.substring(0, i).trim, args.substring(i + 1).trim)
        case _ =>
      }
      i += 1
    }
    (args.trim, "")
  }

  /** All top-level comma-separated pieces of `args`. */
  private def splitParts(args: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var last = 0
    for (i <- args.indices) args.charAt(i) match {
      case '(' | '[' => depth += 1
      case ')' | ']' => depth -= 1
      case ',' if depth == 0 => out += args.substring(last, i).trim; last = i + 1
      case _ =>
    }
    out += args.substring(last).trim
    out.toSeq
  }

  /** `([<items>])[<idx>]` → `element_at(array(<items>), <idx>)` with
    * balanced-bracket index extraction. */
  private def subscriptedListLiteral(sql: String): String = {
    val start = sql.indexOf("([")
    if (start < 0) return sql
    val closeList = sql.indexOf("])", start)
    if (closeList < 0) return sql
    val items = sql.substring(start + 2, closeList)
    val afterList = closeList + 2
    if (afterList >= sql.length || sql.charAt(afterList) != '[') return sql
    var depth = 0
    var i = afterList
    var end = -1
    while (i < sql.length && end < 0) {
      sql.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) end = i
        case _ =>
      }
      i += 1
    }
    if (end < 0) return sql
    val idx = sql.substring(afterList + 1, end)
    val rewritten = sql.substring(0, start) +
      s"element_at(array($items), $idx)" + sql.substring(end + 1)
    subscriptedListLiteral(rewritten)
  }

  /** `name[idx]` (identifier directly against the bracket) →
    * `element_at(name, idx)`; slices (`:` inside) are left alone. */
  private def subscriptToElementAt(sql: String): String = {
    val re = "([A-Za-z_][\\w.]*)\\[([^\\[\\]:]+)\\]".r
    var cur = sql
    var prev = ""
    while (cur != prev) { // nested subscripts resolve inner-first
      prev = cur
      cur = re.replaceAllIn(cur, m =>
        java.util.regex.Matcher.quoteReplacement(
          s"element_at(${m.group(1)}, ${m.group(2)})"))
    }
    cur
  }

  /** `[a, b, c]` list literals (bracket NOT attached to an identifier /
    * closing bracket — those are subscripts) → `array(a, b, c)`,
    * innermost-first so nesting works. */
  private def bareListLiterals(sql: String): String = {
    def attachedBefore(i: Int): Boolean = {
      if (i == 0) return false
      val c = sql.charAt(i - 1)
      c.isLetterOrDigit || c == '_' || c == ')' || c == ']'
    }
    var i = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '[' && !attachedBefore(i)) {
        var depth = 0
        var j = i
        var end = -1
        while (j < sql.length && end < 0) {
          sql.charAt(j) match {
            case '[' => depth += 1
            case ']' => depth -= 1; if (depth == 0) end = j
            case _ =>
          }
          j += 1
        }
        if (end >= 0) {
          val inner = bareListLiterals(sql.substring(i + 1, end))
          return sql.substring(0, i) + s"array($inner)" +
            bareListLiterals(sql.substring(end + 1))
        }
      }
      i += 1
    }
    sql
  }
}
