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
}
