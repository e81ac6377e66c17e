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
    // 100 points in a 10×10 box share one z-bucket (bucket width 2^56
    // covers z codes of points below 2^28 in both coords); a far-away
    // point (bits up to 28 → z ≈ 2^57) lands elsewhere
    val near = for (x <- 0L until 10L; y <- 0L until 10L) yield (x, y)
    val far = Seq((300000000L, 300000000L))
    val rows = LayoutOps.zorderStats((near ++ far)
      .toDF("l_partkey", "l_suppkey")).collect()
    assert(rows.length === 2)
    val byN = rows.map(r => r.getLong(1) -> r).toMap
    assert(byN(100L).getLong(6) === 100L) // tight bbox: 10×10
    assert(byN(1L).getLong(6) === 1L)
  }
}
