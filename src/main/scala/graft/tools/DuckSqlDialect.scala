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
    "array_to_string" -> "array_join",
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
    // 1b. CTE materialization hints: DuckDB's `AS MATERIALIZED (` forces a
    //    multi-referenced CTE to evaluate once (the component oracles'
    //    edges/edges2 would otherwise re-run the pair-generation chain per
    //    label-propagation round, a measured 50x); Spark has no such
    //    syntax and handles reuse itself — strip the hint
    s = s.replaceAll("(?i)\\bAS MATERIALIZED\\s*\\(", "AS (")
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
    // 4a. slices BEFORE plain subscripts (the ':' inside would otherwise
    //     be skipped): DuckDB `l[b:e]` is 1-based and END-INCLUSIVE →
    //     slice(l, b, e - b + 1)
    s = s.replaceAll(
      "([A-Za-z_][\\w.]*)\\[([^\\[\\]:]+):([^\\[\\]:]+)\\]",
      "slice($1, $2, ($3) - ($2) + 1)")
    // 5. identifier subscripts: DuckDB lists are 1-indexed like
    //    element_at; Spark's `x[i]` would be 0-indexed (off by one AND out
    //    of bounds at the last element)
    s = subscriptToElementAt(s)
    // 5a. parenthesized-expression subscripts `(...)[idx]` (e.g. a
    //     list_transform call indexed directly): same 1-indexed semantics
    s = parenSubscriptToElementAt(s)
    // 6. remaining bare [a, b] list literals → array(a, b)
    s = bareListLiterals(s)
    // 6a. struct literals {'k': v, ...} → named_struct('k', v, ...);
    //     field ACCESS (`x.k`) spells the same on both engines
    s = structLiterals(s)
    // 6b. ordered list() aggregates: `list(expr ORDER BY key)` has no
    //     direct Spark spelling — collect (key, value) structs, sort
    //     (array_sort on structs orders by fields left-to-right, so the
    //     key field leads), project the value back out. Exact when the
    //     key is a total order within the group (the oracles' keys are
    //     row_number()/positions — unique by construction).
    s = rewriteCall(s, "list") { args =>
      splitTopLevelOrderBy(args) match {
        case Some((expr, key)) =>
          s"transform(array_sort(collect_list(named_struct('o', $key, " +
            s"'v', $expr))), t_ord -> t_ord.v)"
        case None => s"list($args)"
      }
    }
    // 6c. ordered string_agg: same sort-struct-project shape; array_join
    //     drops null elements exactly as string_agg skips null inputs
    s = rewriteCall(s, "string_agg") { args =>
      splitTopLevelOrderBy(args) match {
        case Some((pre, key)) =>
          val (expr, sep) = splitTopLevel(pre)
          s"array_join(transform(array_sort(collect_list(named_struct(" +
            s"'o', $key, 'v', $expr))), t_ord -> t_ord.v), $sep)"
        case None => s"string_agg($args)"
      }
    }
    // 6d. list_slice(l, b, e) is 1-based END-INCLUSIVE → slice length form
    s = rewriteCall(s, "list_slice") { args =>
      splitParts(args) match {
        case Seq(l, b, e) => s"slice($l, $b, ($e) - ($b) + 1)"
        case _ => s"list_slice($args)"
      }
    }
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
          // Locale.ROOT: under a tr-TR default locale 'minute' would
          // uppercase its i to dotted İ and break the keyword
          val u = lit.stripPrefix("'").stripSuffix("'")
            .toUpperCase(java.util.Locale.ROOT)
          s"datediff($u, ${parts(1)}, ${parts(2)})"
        case None => s"datediff($args)"
      }
    }
    s = rewriteCall(s, "regexp_replace") { args =>
      // DuckDB needs the 'g' flag for replace-all; Spark replaces all by
      // default and reads a 4th arg as a position — drop the flag.
      // Backreferences in the REPLACEMENT literal are RE2-style `\1` in
      // DuckDB but Java-style `$1` in Spark (Java reads `\1` as a literal
      // '1') — rewrite them inside the shielded literal.
      val parts = splitParts(args)
      parts.lift(2).foreach { repl =>
        val t = repl.trim
        if (t.length > 3 && t.head == Shield && t.last == Shield && t(1) == 'L')
          t.substring(2, t.length - 1).toIntOption.foreach { i =>
            literals(i) = literals(i).replaceAll("\\\\(\\d)", "\\$$1")
          }
      }
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
    // 8ac. date difference: DuckDB `date - date` yields INTEGER days;
    //      Spark yields an INTERVAL — datediff(end, start) is the
    //      integer-days twin
    s = s.replaceAll(
      s"(CAST\\([^()]*\\)|[A-Za-z_][\\w.]*)\\s*-\\s*DATE\\s*($Shield" +
        s"L\\d+$Shield)",
      "datediff($1, DATE $2)")
    // 8ad. HUGEINT (int128) → DECIMAL(38,0): exact for every oracle value
    //      below 10³⁸ (q8's scaled-integer market share; NOT the lcg
    //      mod-2⁶⁴ chains, whose 128-bit products overflow 38 digits —
    //      those stay out of the parity set)
    s = s.replaceAll("\\bHUGEINT\\b", "DECIMAL(38,0)")
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
    // 10a. DuckDB's ZIPPED double-unnest banding idiom — `, LATERAL
    //      (SELECT unnest(generate_series(0, N)) AS i, unnest([e0..eN])
    //      AS v) b` pairs the two lists POSITIONALLY; Spark rejects a
    //      correlated generator in a lateral subquery, but posexplode is
    //      the exact twin: (pos, element) = (i, v). Runs after renames,
    //      so the text here spells explode/sequence.
    s = zippedUnnestToPosexplode(s)
    // 10b. the other zipped-unnest idiom: two unnests of the SAME list in
    //      one SELECT, the second under arithmetic (`unnest(r) AS i,
    //      unnest(r) * k AS s`). DuckDB zips them row-for-row; Spark
    //      forbids a generator inside an expression — hoist ONE explode
    //      into a LATERAL VIEW and express the second item through the
    //      generated column.
    s = zippedSelfUnnestToLateral(s)
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

  /** `, LATERAL (SELECT explode(<0..N index gen>) AS i, explode(<arr>) AS
    * v) alias` → ` LATERAL VIEW posexplode(<arr>) alias AS i, v`. The
    * index generator must be `sequence(0, N)` or a literal `array(0, 1,
    * …, N)` — DuckDB zips the two unnests positionally, and posexplode's
    * (pos, element) is that zip exactly when the index list is 0-based
    * consecutive. */
  private def zippedUnnestToPosexplode(sql: String): String = {
    val marker = "LATERAL (SELECT explode("
    val at = sql.indexOf(marker)
    if (at < 0) return sql
    // the list-comma before LATERAL becomes plain juxtaposition
    var comma = at - 1
    while (comma >= 0 && sql.charAt(comma).isWhitespace) comma -= 1
    if (comma < 0 || sql.charAt(comma) != ',') return sql
    // balanced capture of the index generator
    var i = at + marker.length - 1 // at the '('
    var d0 = 0
    var gEnd = -1
    while (i < sql.length && gEnd < 0) {
      sql.charAt(i) match {
        case '(' => d0 += 1
        case ')' => d0 -= 1; if (d0 == 0) gEnd = i
        case _ =>
      }
      i += 1
    }
    if (gEnd < 0) return sql
    val gen = sql.substring(at + marker.length, gEnd).trim
    // 0-based consecutive index list?
    val isZeroSeq = "sequence\\(\\s*0\\s*,\\s*\\d+\\s*\\)".r.matches(gen) || {
      val m = "array\\(([\\d\\s,]*)\\)".r.findFirstMatchIn(gen).filter(_.matched == gen)
      m.exists(_.group(1).split(',').map(_.trim).zipWithIndex
        .forall { case (v, idx) => v == idx.toString })
    }
    if (!isZeroSeq) return sql
    i = gEnd + 1
    if (!sql.startsWith(" AS ", i)) return sql
    i += 4
    val c1 = sql.indexOf(',', i)
    if (c1 < 0) return sql
    val name1 = sql.substring(i, c1).trim
    var j = c1 + 1
    while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
    if (!sql.startsWith("explode(", j)) return sql
    var depth = 0
    var k = j + "explode".length
    var close = -1
    while (k < sql.length && close < 0) {
      sql.charAt(k) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = k
        case _ =>
      }
      k += 1
    }
    if (close < 0) return sql
    val arr = sql.substring(j + "explode(".length, close)
    var m = close + 1
    while (m < sql.length && sql.charAt(m).isWhitespace) m += 1
    if (!sql.startsWith("AS ", m)) return sql
    m += 3
    var n = m
    while (n < sql.length && (sql.charAt(n).isLetterOrDigit || sql.charAt(n) == '_')) n += 1
    val name2 = sql.substring(m, n)
    var p = n
    while (p < sql.length && sql.charAt(p).isWhitespace) p += 1
    if (p >= sql.length || sql.charAt(p) != ')') return sql
    p += 1
    while (p < sql.length && sql.charAt(p).isWhitespace) p += 1
    var q = p
    while (q < sql.length && (sql.charAt(q).isLetterOrDigit || sql.charAt(q) == '_')) q += 1
    val alias = sql.substring(p, q)
    if (alias.isEmpty) return sql
    zippedUnnestToPosexplode(
      sql.substring(0, comma) + " LATERAL VIEW posexplode(" + arr + ") " +
        alias + " AS " + name1 + ", " + name2 + sql.substring(q))
  }

  /** `explode(X) AS a, explode(X) <op> AS b FROM t [WHERE …]` →
    * `a, a <op> AS b FROM t LATERAL VIEW explode(X) zu AS a [WHERE …]`.
    * Both unnests run over the SAME list X, so DuckDB's positional zip
    * degenerates to one generator plus arithmetic on its output. */
  private def zippedSelfUnnestToLateral(sql: String): String = {
    def balancedEnd(from: Int): Int = { // `from` at '('
      var depth = 0
      var i = from
      while (i < sql.length) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) return i
          case _ =>
        }
        i += 1
      }
      -1
    }
    val first = sql.indexOf("explode(")
    if (first < 0) return sql
    val e1 = balancedEnd(first + "explode".length)
    if (e1 < 0) return sql
    val x1 = sql.substring(first + "explode(".length, e1)
    if (!sql.startsWith(" AS ", e1 + 1)) return sql
    var i = e1 + 5
    var j = i
    while (j < sql.length && (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
    val name1 = sql.substring(i, j)
    // expect `,` then the second explode of the SAME list
    var k = j
    while (k < sql.length && (sql.charAt(k) == ',' || sql.charAt(k).isWhitespace)) k += 1
    if (!sql.startsWith("explode(", k)) return sql
    val e2 = balancedEnd(k + "explode".length)
    if (e2 < 0 || sql.substring(k + "explode(".length, e2) != x1) return sql
    // arithmetic tail up to ` AS name2`
    val asAt = sql.indexOf(" AS ", e2)
    if (asAt < 0) return sql
    val mid = sql.substring(e2 + 1, asAt)
    if (mid.exists(c => !" \t*/+-%0123456789().".contains(c))) return sql
    var n = asAt + 4
    var n2 = n
    while (n2 < sql.length && (sql.charAt(n2).isLetterOrDigit || sql.charAt(n2) == '_')) n2 += 1
    val name2 = sql.substring(n, n2)
    // `FROM <ident>` directly after
    val fromM = "(?s)\\A\\s*FROM\\s+(\\w+)".r.findPrefixMatchOf(sql.substring(n2))
    if (fromM.isEmpty) return sql
    val table = fromM.get.group(1)
    val rest = sql.substring(n2 + fromM.get.end)
    sql.substring(0, first) + name1 + ",\n       " + name1 + mid +
      " AS " + name2 + "\nFROM " + table +
      s" LATERAL VIEW explode($x1) zu_$name1 AS $name1" + rest
  }

  /** Split aggregate args at a TOP-LEVEL ` ORDER BY ` (whitespace-
    * insensitive): `expr ORDER BY key` → Some((expr, key)). */
  private def splitTopLevelOrderBy(args: String): Option[(String, String)] = {
    var depth = 0
    var i = 0
    while (i < args.length) {
      args.charAt(i) match {
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case c if depth == 0 && (c == 'O' || c == 'o') =>
          val m = "(?is)^ORDER\\s+BY\\s".r.findPrefixMatchOf(args.substring(i))
          if (m.isDefined && i > 0 && args.charAt(i - 1).isWhitespace)
            return Some((args.substring(0, i).trim,
              args.substring(i + m.get.end).trim))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** `(expr)[idx]` — a parenthesized expression indexed directly (e.g. an
    * inline list_transform) → `element_at((expr), idx)`, same 1-indexed
    * contract as [[subscriptToElementAt]]; slices are left alone. */
  private def parenSubscriptToElementAt(sql: String): String = {
    var i = 0
    while (i < sql.length - 1) {
      if (sql.charAt(i) == ')' && sql.charAt(i + 1) == '[') {
        // walk back to the matching open paren
        var depth = 0
        var j = i
        var open = -1
        while (j >= 0 && open < 0) {
          sql.charAt(j) match {
            case ')' => depth += 1
            case '(' => depth -= 1; if (depth == 0) open = j
            case _ =>
          }
          j -= 1
        }
        // walk forward for the balanced index bracket
        var k = i + 1
        depth = 0
        var close = -1
        while (k < sql.length && close < 0) {
          sql.charAt(k) match {
            case '[' => depth += 1
            case ']' => depth -= 1; if (depth == 0) close = k
            case _ =>
          }
          k += 1
        }
        if (open >= 0 && close > 0) {
          val idx = sql.substring(i + 2, close)
          if (!idx.contains(":")) { // slice stays for the slice rule
            // a function CALL's name belongs inside the wrap:
            // `string_split(x, '-')[2]` wraps the whole call, not `(x, '-')`
            var nameStart = open
            while (nameStart > 0 && {
              val c = sql.charAt(nameStart - 1)
              c.isLetterOrDigit || c == '_' || c == '.'
            }) nameStart -= 1
            val expr = sql.substring(nameStart, i + 1)
            return parenSubscriptToElementAt(
              sql.substring(0, nameStart) + s"element_at($expr, $idx)" +
                sql.substring(close + 1))
          }
        }
      }
      i += 1
    }
    sql
  }

  /** `{'k': v, ...}` struct literals (shielded keys) → named_struct('k',
    * v, ...), innermost-first so nested structs work. */
  private def structLiterals(sql: String): String = {
    val open = sql.indexOf('{')
    if (open < 0) return sql
    var depth = 0
    var i = open
    var close = -1
    while (i < sql.length && close < 0) {
      sql.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    if (close < 0) return sql
    val inner = structLiterals(sql.substring(open + 1, close))
    val fields = splitStructFields(inner).map { part =>
      val colon = part.indexOf(':')
      s"${part.substring(0, colon).trim}, ${part.substring(colon + 1).trim}"
    }
    structLiterals(
      sql.substring(0, open) + s"named_struct(${fields.mkString(", ")})" +
        sql.substring(close + 1))
  }

  /** Top-level comma split that also ignores commas inside braces and
    * lambda bodies — for struct-literal fields. */
  private def splitStructFields(args: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var last = 0
    for (i <- args.indices) args.charAt(i) match {
      case '(' | '[' | '{' => depth += 1
      case ')' | ']' | '}' => depth -= 1
      case ',' if depth == 0 => out += args.substring(last, i).trim; last = i + 1
      case _ =>
    }
    out += args.substring(last).trim
    out.toSeq
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
