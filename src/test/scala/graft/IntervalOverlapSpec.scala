package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.functions._

import scala.util.Random

/** join_interval_overlap: the bucketized interval×interval join must be
  * value-identical to the naive overlap join (which is what the DuckDB
  * oracle runs), and each overlapping pair must be emitted EXACTLY once —
  * the structural-attribution claim (pair counted only in the bucket of
  * greatest(s_a, s_b)) is the part a distinct would silently paper over.
  */
class IntervalOverlapSpec extends SparkSuite {

  import spark.implicits._

  private def naivePairs(items: Seq[(Long, Long, Long, Long)])
      : Set[(Long, Long, Long)] =
    (for {
      (ka, ia, sa, ea) <- items
      (kb, ib, sb, eb) <- items
      if ka == kb && ia < ib && sa <= eb && sb <= ea
    } yield (ka, ia, ib)).toSet

  private def bucketed(items: Seq[(Long, Long, Long, Long)])
      : Seq[(Long, Long, Long)] =
    RelationalOps
      .overlapPairsBucketed(items.toDF("key", "id", "s", "e"))
      .select("key", "id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

  test("hand-picked boundary geometries: inclusive touch, shared-2-bucket dedup") {
    val B = RelationalOps.OverlapBucketDays
    val items = Seq[(Long, Long, Long, Long)](
      // touch exactly at a bucket boundary: inclusive overlap, one pair
      (1L, 1L, 0L, B), (1L, 2L, B, 2 * B),
      // identical intervals spanning 2 buckets: share BOTH buckets — the
      // attribution must still count the pair once
      (2L, 3L, B - 1, 2 * B - 1), (2L, 4L, B - 1, 2 * B - 1),
      // same bucket, disjoint: no pair
      (3L, 5L, 0L, 10L), (3L, 6L, 20L, 30L),
      // overlap across a bucket boundary
      (4L, 7L, B - 10, B + 10), (4L, 8L, B + 5, B + 20),
      // different keys never pair
      (5L, 9L, 0L, 10L), (6L, 10L, 0L, 10L))
    val got = bucketed(items)
    assert(got.size === got.toSet.size, s"duplicate pair emitted: $got")
    assert(got.toSet === naivePairs(items))
    assert(got.toSet === Set((1L, 1L, 2L), (2L, 3L, 4L), (4L, 7L, 8L)))
  }

  test("randomized parity with the naive overlap join (seeded)") {
    val B = RelationalOps.OverlapBucketDays
    val rnd = new Random(41)
    val items = (1L to 400L).map { id =>
      val key = rnd.nextInt(5).toLong
      val s = rnd.nextInt(1000).toLong
      val len = rnd.nextInt(B.toInt + 1).toLong // 0..B inclusive
      (key, id, s, s + len)
    }
    val got = bucketed(items)
    assert(got.size === got.toSet.size, "a pair crossed the shuffle twice")
    assert(got.toSet === naivePairs(items))
  }

  test("join_interval_overlap matches the naive per-supplier count on sf0.001") {
    // The testbed's (l_orderkey, l_linenumber) is NOT unique (synthetic
    // generator quirk), so the naive here is a row-level MULTISET count —
    // exactly what the DuckDB oracle computes: every ROW pair with
    // id_a < id_b and overlapping intervals, duplicates included.
    val result = RelationalOps.joinIntervalOverlap.run(spark, smokeDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val iv = Tables.lineitem(spark, smokeDir).select(
      col("l_suppkey").as("key"),
      (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
      datediff(col("l_shipdate"), lit("1970-01-01")).cast("long").as("s"),
      (datediff(col("l_shipdate"), lit("1970-01-01")) +
        col("l_quantity").cast("int")).cast("long").as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = (for {
      (ka, ia, sa, ea) <- iv
      (kb, ib, sb, eb) <- iv
      if ka == kb && ia < ib && sa <= eb && sb <= ea
    } yield ka).groupBy(identity).map { case (k, ps) => k -> ps.size.toLong }
    assert(result === expect)
  }

  test("join_interval_overlap plans equi-join shuffles, never a nested loop") {
    val p = RelationalOps.joinIntervalOverlap.run(spark, smokeDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"overlap join degraded to a nested loop:\n$p")
  }
}
