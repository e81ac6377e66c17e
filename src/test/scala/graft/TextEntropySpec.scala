package graft

import graft.operators.TextOps

/** text_unigram_entropy: hand-computed distributions pin the formula
  * (H = ln n − Σ tf·ln tf / n, emitted at e6 via per-row scaled
  * integers — exact under any summation order) so a both-engines-wrong
  * oracle mirror cannot pass silently.
  */
class TextEntropySpec extends SparkSuite {

  import spark.implicits._

  private def entropies(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    TextOps.unigramEntropy(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  /** The e6 replay: floor(ln(n)·10⁶ + 0.5) − (Σ floor(tf·ln tf·10⁶ + 0.5)) div n. */
  private def e6(tfs: Seq[Long]): Long = {
    val n = tfs.sum
    math.floor(math.log(n.toDouble) * 1e6 + 0.5).toLong -
      tfs.map(tf => math.floor(tf * math.log(tf.toDouble) * 1e6 + 0.5).toLong).sum / n
  }

  test("hand-computed entropy: skewed, uniform, constant, empty") {
    val got = entropies(Seq(
      (1L, "a a b"),       // ln 3 − 2 ln 2 / 3 ≈ 0.636514
      (2L, "a b c d"),     // uniform: ln 4 ≈ 1.386294
      (3L, "x x x x"),     // constant: 0
      (4L, ""),            // no tokens: no row
      (5L, "  a   b  ")))  // empties dropped by the tokenizer
    assert(got === Map(
      1L -> ((e6(Seq(2L, 1L)), 2L)),
      2L -> ((e6(Seq(1L, 1L, 1L, 1L)), 4L)),
      3L -> ((e6(Seq(4L)), 1L)),
      5L -> ((e6(Seq(1L, 1L)), 2L))))
    assert(e6(Seq(2L, 1L)) === 636514L) // and the replay itself is pinned
    assert(e6(Seq(4L)) === 0L)
  }

  test("entropy is permutation-invariant and bounded by ln(n_distinct)") {
    val got = entropies(Seq(
      (1L, "c a b a c a"),
      (2L, "a a a b c c")))
    assert(got(1L) === got(2L))
    assert(got(1L)._1 <= (math.log(got(1L)._2.toDouble) * 1e6).toLong + 1)
  }
}
