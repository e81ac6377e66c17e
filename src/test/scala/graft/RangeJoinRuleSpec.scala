package graft

import org.apache.spark.sql.functions._
import graft.plans.RewriteRangeJoin

/** The range-join rewrite rule: the naive non-equi form users write gets
  * the bucketized plan, result-identically; shapes outside the sound
  * scope (outer joins, no range bounds) are left alone.
  */
class RangeJoinRuleSpec extends SparkSuite {

  private val W = 1000L

  private def probes = {
    import spark.implicits._
    (0L until 500L).map(i => (i, i % 13, (i * 7919) % 100000))
      .toDF("event_id", "k", "tu")
  }
  private def build = {
    import spark.implicits._
    (0L until 3000L).map(i => ((i * 104729) % 13, (i * 31) % 100000))
      .toDF("k", "btu")
  }

  private def naive = probes.as("a").join(
    build.as("b"),
    col("b.k") === col("a.k") &&
      col("b.btu") >= col("a.tu") - W && col("b.btu") < col("a.tu"))
    .select(col("a.event_id"), col("b.btu"))

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteRangeJoin
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteRangeJoin)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("naive inner range join gets the bucketized plan, same result") {
    val baseline = rows(naive)
    assert(baseline.nonEmpty, "test geometry must produce matches")
    withRule {
      val optimized = naive.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_range_bkt"),
        s"rewrite did not fire:\n$optimized")
      val physical = naive.queryExecution.executedPlan.toString
      assert(!physical.contains("NestedLoop"),
        s"rewritten plan still nested-loops:\n$physical")
      // multiplicity-exact parity with the un-rewritten join
      assert(rows(naive) === baseline)
    }
  }

  test("inclusive bounds and flipped sides still rewrite correctly") {
    def q = build.as("b").join(
      probes.as("a"),
      col("a.k") === col("b.k") &&
        col("a.tu") - W <= col("b.btu") && col("a.tu") >= col("b.btu"))
      .select(col("a.event_id"), col("b.btu"))
    val baseline = rows(q)
    assert(baseline.nonEmpty)
    withRule {
      assert(q.queryExecution.optimizedPlan.toString
        .contains("__graft_range_bkt"))
      assert(rows(q) === baseline)
    }
  }

  test("out-of-scope shapes are untouched: outer join, no range bounds") {
    def outer = probes.as("a").join(
      build.as("b"),
      col("b.k") === col("a.k") &&
        col("b.btu") >= col("a.tu") - W && col("b.btu") < col("a.tu"),
      "left")
    def equiOnly = probes.as("a").join(build.as("b"), col("b.k") === col("a.k"))
    val outerBaseline = rows(outer)
    withRule {
      assert(!outer.queryExecution.optimizedPlan.toString
        .contains("__graft_range_bkt"), "outer join must not rewrite")
      assert(!equiOnly.queryExecution.optimizedPlan.toString
        .contains("__graft_range_bkt"), "equi-only join must not rewrite")
      // outer results stay correct with the rule installed
      assert(rows(outer) === outerBaseline)
    }
  }
}
