package graft

import graft.tools.DuckSqlDialect.toSpark
import org.scalatest.funsuite.AnyFunSuite

/** Pin the DuckDB→Spark oracle-translation rules — each case is one rule
  * with the shape it exists for, lifted from a real oracle text. */
class DuckSqlDialectSpec extends AnyFunSuite {

  test("integer division and casts") {
    assert(toSpark("SELECT a // b, c::BIGINT") ===
      "SELECT a  div  b, c::BIGINT")
  }

  test("string literals are inert: operators inside survive") {
    assert(toSpark("SELECT '// not div', x // 2") ===
      "SELECT '// not div', x  div  2")
  }

  test("datediff unit literal becomes a keyword") {
    assert(toSpark("SELECT datediff('day', a, b) FROM t") ===
      "SELECT datediff(DAY, a, b) FROM t")
  }

  test("regexp_replace drops the DuckDB g flag") {
    assert(toSpark("SELECT regexp_replace(s, 'a+', 'X', 'g')") ===
      "SELECT regexp_replace(s, 'a+', 'X')")
  }

  test("1-indexed subscripts become element_at") {
    assert(toSpark("SELECT t[i], e.emb[64] FROM x") ===
      "SELECT element_at(t, i), element_at(e.emb, 64) FROM x")
  }

  test("bare list literals become array()") {
    assert(toSpark("SELECT CASE WHEN c THEN [a, b] ELSE [1] END") ===
      "SELECT CASE WHEN c THEN array(a, b) ELSE array(1) END")
  }

  test("list literal with subscript becomes element_at(array(...))") {
    assert(toSpark("SELECT (['x','y'])[(i)::INT]") ===
      "SELECT element_at(array('x','y'), (i)::INT)")
  }

  test("table-form range/generate_series with column alias") {
    assert(toSpark("FROM range(750) t(r)") ===
      "FROM (SELECT explode(sequence(0, (750) - 1)) AS r) t")
    assert(toSpark("FROM generate_series(1, 6) d(v)") ===
      "FROM (SELECT explode(sequence(1, 6)) AS v) d")
  }

  test("scalar range is end-exclusive; sequence spelled to match") {
    assert(toSpark("SELECT range(0, n, 128)") ===
      "SELECT sequence(0, (n) - 1, 128)")
  }

  test("list_reduce over list_prepend becomes aggregate with explicit zero") {
    assert(toSpark(
      "SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), bs), (acc, x) -> (acc * 131 + x) % 97)") ===
      "SELECT aggregate(bs, CAST(0 AS BIGINT), (acc, x) -> (acc * 131 + x) % 97)")
  }

  test("aggregate FILTER gains the WHERE Spark requires") {
    assert(toSpark("SELECT count(*) FILTER (d.h < r.x) FROM t") ===
      "SELECT count(*) FILTER (WHERE d.h < r.x) FROM t")
    // already-spelled WHERE stays single
    assert(toSpark("SELECT count(*) FILTER (WHERE a) FROM t") ===
      "SELECT count(*) FILTER (WHERE a) FROM t")
  }

  test("IGNORE NULLS moves outside the call parens") {
    assert(toSpark("SELECT last_value(x IGNORE NULLS) OVER (ORDER BY i)") ===
      "SELECT last_value(x) IGNORE NULLS OVER (ORDER BY i)")
  }

  test("regexp_extract_all gains DuckDB's default group 0") {
    assert(toSpark("SELECT regexp_extract_all(s, 'p+')") ===
      "SELECT regexp_extract_all(s, 'p+', 0)")
    assert(toSpark("SELECT regexp_extract_all(s, 'p+', 1)") ===
      "SELECT regexp_extract_all(s, 'p+', 1)")
  }

  test("function renames: epoch family, list family, arg_min/arg_max") {
    assert(toSpark("SELECT epoch(ts), epoch_us(ts)") ===
      "SELECT unix_timestamp(ts), unix_micros(ts)")
    assert(toSpark("SELECT arg_min(a, b), arg_max(a, b)") ===
      "SELECT min_by(a, b), max_by(a, b)")
    assert(toSpark("SELECT list_transform(l, x -> x + 1)") ===
      "SELECT transform(l, x -> x + 1)")
  }

  test("VARCHAR casts become STRING") {
    assert(toSpark("SELECT CAST(x AS VARCHAR)") === "SELECT CAST(x AS STRING)")
  }

  // ---- round-13 rules (the 152 → 175 parity expansion) ---------------------

  test("slices: 1-based end-inclusive l[b:e] becomes slice(l, b, len)") {
    assert(toSpark("SELECT t[j:j+19]") ===
      "SELECT slice(t, j, (j+19) - (j) + 1)")
  }

  test("parenthesized-call subscripts wrap the whole call in element_at") {
    assert(toSpark("SELECT string_split(s, '-')[2]") ===
      "SELECT element_at(split(s, '-'), 2)")
  }

  test("struct literals become named_struct; nesting and lambdas survive") {
    assert(toSpark("SELECT {'j': j, 'w': f(a, b)}") ===
      "SELECT named_struct('j', j, 'w', f(a, b))")
    assert(toSpark("SELECT {'a': {'b': 1}}") ===
      "SELECT named_struct('a', named_struct('b', 1))")
  }

  test("ordered list() and string_agg() become sort-struct-project") {
    assert(toSpark("SELECT list(x ORDER BY pos)") ===
      "SELECT transform(array_sort(collect_list(named_struct('o', pos, " +
        "'v', x))), t_ord -> t_ord.v)")
    assert(toSpark("SELECT string_agg(v, ',' ORDER BY rn)") ===
      "SELECT array_join(transform(array_sort(collect_list(named_struct(" +
        "'o', rn, 'v', v))), t_ord -> t_ord.v), ',')")
    // unordered forms stay untouched
    assert(toSpark("SELECT list(x)") === "SELECT list(x)")
  }

  test("HUGEINT becomes DECIMAL(38,0); date minus DATE literal becomes datediff") {
    assert(toSpark("SELECT CAST(s AS HUGEINT) * 10 // n") ===
      "SELECT CAST(s AS DECIMAL(38,0)) * 10  div  n")
    assert(toSpark("SELECT (CAST(d AS DATE) - DATE '1970-01-01') AS s") ===
      "SELECT (datediff(CAST(d AS DATE), DATE '1970-01-01')) AS s")
  }

  test("regexp_replace replacement backrefs go RE2 \\1 to Java $1") {
    assert(toSpark("SELECT regexp_replace(w, '(.)', ' \\1 ', 'g')") ===
      "SELECT regexp_replace(w, '(.)', ' $1 ')")
  }

  test("zipped double-unnest banding becomes posexplode LATERAL VIEW") {
    val in = "FROM sig,\n  LATERAL (SELECT unnest(generate_series(0, 3)) " +
      "AS band,\n                  unnest([a, b, c, d]) AS sg) b) x"
    val out = toSpark(in)
    assert(out.contains("LATERAL VIEW posexplode(array(a, b, c, d)) b AS band, sg"),
      out)
    assert(!out.contains("LATERAL ("), out)
  }

  test("self-zipped unnest with arithmetic hoists one LATERAL VIEW explode") {
    val in = "SELECT doc_id,\n       unnest(range(0, n)) AS w,\n       " +
      "unnest(range(0, n)) * 16000 AS s\nFROM aw WHERE n > 0"
    val out = toSpark(in)
    assert(out.contains("LATERAL VIEW explode(sequence(0, (n) - 1)) zu_w AS w"), out)
    assert(out.contains("w * 16000 AS s"), out)
  }

  test("list_slice is end-inclusive; array_to_string renames") {
    assert(toSpark("SELECT list_slice(l, a, b)") ===
      "SELECT slice(l, a, (b) - (a) + 1)")
    assert(toSpark("SELECT array_to_string(l, ' ')") ===
      "SELECT array_join(l, ' ')")
  }
}
