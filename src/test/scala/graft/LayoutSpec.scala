package graft

import graft.operators.LayoutOps

/** layout_zorder_stats: the Morton interleave against hand-computed
  * codes, and the locality property the layout exists for — nearby
  * points share buckets, far points don't.
  */
class LayoutSpec extends SparkSuite {

  import spark.implicits._

  test("morton codes match hand-interleaved bits") {
    // z(x, y) = Σ bit_i(x)·2^(2i) + bit_i(y)·2^(2i+1)
    //   (3, 5): x=11b → 1+4; y=101b → 2+32           = 39
    //   (0, 0) = 0; (1, 0) = 1; (0, 1) = 2
    //   (65535, 65535) = 2^32 − 1 (all bits set)
    val got = LayoutOps.zCodes(Seq(
      (3L, 5L), (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L))
      .toDF("l_partkey", "l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((3L, 5L)) === 39L)
    assert(got((0L, 0L)) === 0L)
    assert(got((1L, 0L)) === 1L)
    assert(got((0L, 1L)) === 2L)
    assert(got((65535L, 65535L)) === (1L << 32) - 1)
  }

  test("z-order locality: a tight cluster lands in one bucket") {
    // the bucket width tracks the OBSERVED max z (≈ 2^57 from the far
    // point), so the 100 near points (z ≤ 195) share bucket 0 and the
    // far point lands in a high bucket alone
    val near = for (x <- 0L until 10L; y <- 0L until 10L) yield (x, y)
    val far = Seq((300000000L, 300000000L))
    val rows = LayoutOps.zorderStats((near ++ far)
      .toDF("l_partkey", "l_suppkey")).collect()
    assert(rows.length === 2)
    val byN = rows.map(r => r.getLong(1) -> r).toMap
    assert(byN(100L).getLong(6) === 100L) // tight bbox: 10×10
    assert(byN(1L).getLong(6) === 1L)
  }

  test("observed-range width exercises the full bucket range at small key scales") {
    // keys topping out at ~16k — the scale where the old static 2^56
    // width collapsed EVERYTHING into zbucket 0 (the advisor's finding:
    // partkey reaches only 20M even at sf100, far below 2^28). With the
    // width derived from max(z), the audit must spread across many
    // buckets and never index past ZBuckets-1.
    val pts = for (x <- 0L until 128L; y <- 0L until 128L)
      yield (x * 128L, y * 128L)
    val buckets = LayoutOps.zorderStats(pts.toDF("l_partkey", "l_suppkey"))
      .collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < LayoutOps.ZBuckets))
    assert(buckets.length >= LayoutOps.ZBuckets / 2,
      s"only ${buckets.length} buckets exercised")
    // z is a bijection: total rows conserved across buckets
  }

  test("zorder stats rows are conserved and bboxes nest inside the key domain") {
    val pts = for (x <- 0L until 50L; y <- 0L until 40L) yield (x, y + 7L)
    val rows = LayoutOps.zorderStats(pts.toDF("l_partkey", "l_suppkey"))
      .collect()
    assert(rows.map(_.getLong(1)).sum === 50L * 40L)
    for (r <- rows) {
      assert(r.getLong(2) >= 0L && r.getLong(3) <= 49L)   // pk bbox
      assert(r.getLong(4) >= 7L && r.getLong(5) <= 46L)   // sk bbox
      assert(r.getLong(6) >= r.getLong(1))                // area ≥ count
    }
  }
}
