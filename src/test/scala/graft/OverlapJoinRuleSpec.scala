package graft

import org.apache.spark.sql.functions._
import graft.plans.RewriteOverlapJoin

import scala.util.Random

/** The interval-overlap rewrite rule: the naive two-inequality form gets
  * the bucketized plan, result-identically (multiset), including the
  * soundness corners — inverted intervals, null endpoints, attribute-
  * bounded point-in-interval — while out-of-scope and already-bucketized
  * shapes are left alone.
  */
class OverlapJoinRuleSpec extends SparkSuite {

  import spark.implicits._

  private def withRule[T](width: Long)(body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteOverlapJoin
    spark.conf.set(RewriteOverlapJoin.WidthKey, width.toString)
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteOverlapJoin)
      spark.conf.unset(RewriteOverlapJoin.WidthKey)
    }
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def intervals(seed: Int, n: Int, keys: Int, maxLen: Int) = {
    val rnd = new Random(seed)
    (1 to n).map { i =>
      val s = rnd.nextInt(2000).toLong
      (rnd.nextInt(keys).toLong, i.toLong, s, s + rnd.nextInt(maxLen + 1))
    }.toDF("k", "id", "s", "e")
  }

  test("naive overlap join gets the bucketized plan, multiset-identical") {
    def q = intervals(1, 300, 4, 120).as("a").join(
      intervals(2, 300, 4, 120).as("b"),
      col("a.k") === col("b.k") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val baseline = rows(q)
    assert(baseline.nonEmpty, "test geometry must produce matches")
    withRule(width = 100L) {
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("__graft_overlap_bkt"),
        s"rewrite did not fire:\n$optimized")
      assert(!q.queryExecution.executedPlan.toString.contains("NestedLoop"),
        s"rewritten plan still nested-loops:\n${q.queryExecution.executedPlan}")
      assert(rows(q) === baseline)
    }
  }

  test("keyless overlap join (the BNLJ killer) rewrites and matches") {
    def q = intervals(3, 120, 1, 60).as("a").join(
      intervals(4, 120, 1, 60).as("b"),
      col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val baseline = rows(q)
    withRule(width = 64L) {
      assert(q.queryExecution.optimizedPlan.toString
        .contains("__graft_overlap_bkt"))
      assert(!q.queryExecution.executedPlan.toString.contains("NestedLoop"),
        "keyless overlap should become an equi-join on the bucket")
      assert(rows(q) === baseline)
    }
  }

  test("soundness corners: inverted intervals, nulls, strict bounds, flips") {
    val rnd = new Random(5)
    def mk(seed: Int) = {
      val r = new Random(seed)
      (1 to 200).map { i =>
        val s = r.nextInt(1000).toLong
        val e = s + r.nextInt(161) - 40 // ~25% inverted (e < s)
        (r.nextInt(3).toLong, i.toLong,
          if (r.nextInt(20) == 0) null else java.lang.Long.valueOf(s),
          if (r.nextInt(20) == 0) null else java.lang.Long.valueOf(e))
      }.toDF("k", "id", "s", "e")
    }
    // strict on one bound, flipped operand order on the other
    def q = mk(6).as("a").join(
      mk(7).as("b"),
      col("a.k") === col("b.k") &&
        col("a.s") < col("b.e") && col("a.e") >= col("b.s"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val baseline = rows(q)
    assert(baseline.nonEmpty)
    withRule(width = 37L) {
      assert(q.queryExecution.optimizedPlan.toString
        .contains("__graft_overlap_bkt"))
      assert(rows(q) === baseline)
    }
  }

  test("attribute-bounded point-in-interval rewrites (no literal W needed)") {
    val points = (1L to 400L).map(i => (i % 5, i, (i * 7919) % 2000))
      .toDF("k", "pid", "t")
    def q = intervals(8, 200, 5, 90).as("a").join(
      points.as("p"),
      col("a.k") === col("p.k") &&
        col("p.t") >= col("a.s") && col("p.t") <= col("a.e"))
      .select(col("a.id"), col("p.pid"))
    val baseline = rows(q)
    assert(baseline.nonEmpty)
    withRule(width = 128L) {
      assert(q.queryExecution.optimizedPlan.toString
        .contains("__graft_overlap_bkt"))
      assert(rows(q) === baseline)
    }
  }

  test("already-bucketized and full-outer shapes are untouched") {
    // the hand-bucketized query: its join carries a bucket equi-conjunct
    // derived from both sides' endpoints — must not be double-rewritten
    val handPlan = withRule(width = 50L) {
      graft.operators.RelationalOps.joinIntervalOverlap
        .run(spark, smokeDir).queryExecution.optimizedPlan.toString
    }
    assert(!handPlan.contains("__graft_overlap_bkt"),
      s"hand-bucketized join was double-bucketized:\n$handPlan")

    def full = intervals(9, 50, 2, 40).as("a").join(
      intervals(10, 50, 2, 40).as("b"),
      col("a.k") === col("b.k") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"),
      "full")
    val baseline = rows(full)
    withRule(width = 50L) {
      assert(!full.queryExecution.optimizedPlan.toString
        .contains("__graft_overlap_bkt"),
        "full outer overlap must not rewrite (both sides would need dedup)")
      assert(rows(full) === baseline)
    }
  }

  test("left/right outer overlap rewrites with exactly-once null extension") {
    // sparse geometry so a real fraction of left rows have NO partner;
    // ~5% null endpoints exercise the outer-generate null-coverage corner
    def mk(seed: Int, n: Int) = {
      val r = new Random(seed)
      (1 to n).map { i =>
        val s = r.nextInt(4000).toLong
        (r.nextInt(40).toLong, i.toLong,
          if (r.nextInt(20) == 0) null else java.lang.Long.valueOf(s),
          if (r.nextInt(20) == 0) null
          else java.lang.Long.valueOf(s + r.nextInt(30)))
      }.toDF("k", "id", "s", "e")
    }
    for (how <- Seq("left", "right")) {
      def q = mk(13, 300).as("a").join(
        mk(14, 60).as("b"),
        col("a.k") === col("b.k") &&
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"),
        how)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      val baseline = rows(q)
      assert(baseline.exists(_.contains("null")),
        s"$how-outer geometry must produce unmatched rows")
      withRule(width = 25L) {
        val optimized = q.queryExecution.optimizedPlan.toString
        assert(optimized.contains("__graft_overlap_bkt"),
          s"$how outer overlap did not rewrite:\n$optimized")
        assert(rows(q) === baseline, s"$how outer parity broke")
      }
    }
  }

  test("exactly-once: pair count matches a distinct-pair count") {
    def q = intervals(11, 250, 3, 150).as("a").join(
      intervals(12, 250, 3, 150).as("b"),
      col("a.k") === col("b.k") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    withRule(width = 40L) { // intervals span up to 4-5 buckets each
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size === got.distinct.size,
        "a pair surviving in more than one shared bucket means attribution leaked")
    }
  }
}
