package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the oracle registry against the Scala object-initialization-order
  * failure class: `GQuery.oracle` is a strict `Option[String]`, so an oracle
  * that interpolates a numeric `val` declared BELOW it in the same object
  * reads 0 mid-init and silently ships degenerate SQL (empty `(0 until 0)`
  * mkStrings → dangling commas, empty CTE bodies). That exact bug shipped
  * once (`dedup_embedding_lsh_banded`, round 6) and was invisible to every
  * run-the-query test because only the eagerly-built oracle string was
  * corrupted. These are pure-string assertions — no Spark, no DuckDB — so
  * they run in milliseconds and fail the build the moment a degenerate
  * oracle is constructed.
  */
class OracleSanitySpec extends AnyFunSuite {

  // a comma (or SELECT) followed directly by FROM: a projection list that
  // lost its tail to an empty mkString
  private val danglingComma = raw"(?is)(,|\bSELECT)\s+FROM\b".r
  // a CTE or subquery with an empty body — the `(` must not be a zero-arg
  // function call (`row_number()`), so it can't follow an identifier char
  private val emptyParens = raw"(?<![A-Za-z0-9_])\(\s*\)".r
  // an mkString over an uninitialized (0 until 0) range leaves "JOIN  ON"
  // or "AND  AND"-style doubled keywords behind in join assemblies — JOIN
  // leads the first alternation so the "JOIN  ON" form (empty table ref
  // from an empty mkString) is matched directly, not just incidentally
  private val doubledKeyword =
    raw"(?i)\b(JOIN|ON|AND|OR|WHERE)\s+(AND|OR|ON)\b".r

  for ((name, sql) <- SparkEntry.oracleSql) {
    test(s"$name oracle SQL is not degenerate") {
      assert(sql.trim.nonEmpty, "empty oracle")
      withClue(sql) {
        assert(danglingComma.findFirstIn(sql).isEmpty,
          s"projection list lost its tail: ${danglingComma.findFirstIn(sql)}")
        assert(emptyParens.findFirstIn(sql).isEmpty, "empty CTE/subquery body")
        assert(doubledKeyword.findFirstIn(sql).isEmpty,
          s"doubled keyword: ${doubledKeyword.findFirstIn(sql)}")
      }
    }
  }

  test("banded-LSH oracle interpolates the real band geometry") {
    val sql = SparkEntry.oracleSql("dedup_embedding_lsh_banded")
    // all four band columns must appear — 0 would mean init-order regressed
    for (b <- 0 until graft.operators.DedupOps.LshBands)
      assert(sql.contains(s"b$b"), s"missing band column b$b")
  }

  test("every scaled-money guard pairs bound x scale = 9.0e18 (oracle side)") {
    // The non-finite guard bound is SCALE-DEPENDENT (RelationalOps q1Agg
    // scaladoc): Spark's floor(double) saturates at Long.MaxValue under
    // non-ANSI semantics for any post-multiplication value past ~9.2e18
    // while DuckDB's TRY_CAST nulls — so x100 summands must guard at
    // 9.0e16, x10000 at 9.0e14, x1000000 at 9.0e12. The fragment is
    // hand-copied at ~30 sites in two dialects; an edit that changes a
    // scale without its bound (or vice versa) reopens the divergence
    // band invisibly — normal-range test data never enters it. This
    // extracts every (bound, scale) pair from every oracle and enforces
    // the product. The tempered dot stops at END so a bare guard (no
    // multiplication, e.g. the percentile column guards) never pairs
    // with a LATER fragment's scale.
    val guard = raw"(?is)>=\s*(9\.0e(\d+))\s+THEN\s+NULL\s+ELSE\s+(?:(?!\bEND\b).)*?\bEND\b\s*\*\s*(\d+)\s*\+\s*0\.5".r
    var found = 0
    for ((name, sql) <- SparkEntry.oracleSql;
         m <- guard.findAllMatchIn(sql)) {
      found += 1
      val exp = m.group(2).toInt
      val scale = m.group(3).toLong
      assert(math.pow(10, exp) * scale == 1e18,
        s"$name: guard bound ${m.group(1)} does not pair with scale $scale " +
          s"(bound x scale must be 9.0e18): ...${m.matched.take(120)}")
    }
    assert(found >= 25, s"guard regex matched only $found sites — pattern rot?")
  }
}
