package graft

import graft.operators.RelationalOps

/** skyline_pareto: the bucketed-prefix skyline against hand-picked
  * dominance cases AND a brute-force replay on a deterministic pseudo-
  * random cloud, so the bucket/window/prefix decomposition cannot drift
  * from the NOT EXISTS definition it implements.
  */
class SkylineSpec extends SparkSuite {

  import spark.implicits._

  private def run(rows: Seq[(Long, Double, Int)]): Set[(Long, Double, Int)] =
    RelationalOps.skyline(rows.toDF("p_partkey", "p_retailprice", "p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet

  test("skyline: strict dominance on either axis eliminates; duplicates survive") {
    val pts = Seq(
      (1L, 900.0, 50),  // frontier: cheapest AND largest
      (2L, 905.0, 50),  // dominated: same size, strictly pricier than 1
      (3L, 900.0, 40),  // dominated: same price as 1, strictly smaller
      (4L, 950.0, 60),  // frontier: larger than anything cheaper
      (5L, 950.0, 60),  // duplicate of 4 — mutually non-dominating, kept
      (6L, 999.0, 60),  // dominated by 4/5 (same size, cheaper exists)
      (7L, 999.0, 70))  // frontier: globally largest
    assert(run(pts) ===
      Set((1L, 900.0, 50), (4L, 950.0, 60), (5L, 950.0, 60), (7L, 999.0, 70)))
  }

  test("skyline: cross-bucket pruning — a far-cheaper giant clears later buckets") {
    // bucket width 10: 901 and 995 land ~9 buckets apart; the early giant
    // must eliminate via the broadcast prefix, not the in-bucket window
    val pts = Seq(
      (1L, 901.0, 60),
      (2L, 995.0, 59), (3L, 995.0, 60), // both dominated by 1 (strict price)
      (4L, 995.0, 61))                  // survives: strictly larger
    assert(run(pts) === Set((1L, 901.0, 60), (4L, 995.0, 61)))
  }

  test("skyline: matches the brute-force dominance definition on a cloud") {
    // deterministic LCG cloud spanning several buckets with repeats
    var x = 12345L
    def next(): Long = { x = (x * 1103515245L + 12345L) % 2147483648L; x }
    val pts = (1L to 300L).map { id =>
      (id, 900.0 + (next() % 1000L) / 10.0, (next() % 50L).toInt + 1)
    }
    val brute = pts.filter { p =>
      !pts.exists(q => q._2 <= p._2 && q._3 >= p._3 &&
        (q._2 < p._2 || q._3 > p._3))
    }.toSet
    assert(run(pts) === brute)
  }
}
