package graft

import graft.operators.TextOps

/** text_unigram_entropy: hand-computed distributions pin the formula
  * (H = ln n − Σ tf·ln tf / n) so a both-engines-wrong oracle mirror
  * cannot pass silently.
  */
class TextEntropySpec extends SparkSuite {

  import spark.implicits._

  private def entropies(docs: Seq[(Long, String)]): Map[Long, (Double, Long)] =
    TextOps.unigramEntropy(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap

  test("hand-computed entropy: skewed, uniform, constant, empty") {
    val got = entropies(Seq(
      (1L, "a a b"),       // ln 3 − 2 ln 2 / 3 = 0.6365
      (2L, "a b c d"),     // uniform: ln 4 = 1.3863
      (3L, "x x x x"),     // constant: 0
      (4L, ""),            // no tokens: no row
      (5L, "  a   b  ")))  // empties dropped by the tokenizer
    assert(got === Map(
      1L -> ((0.6365, 2L)),
      2L -> ((1.3863, 4L)),
      3L -> ((0.0, 1L)),
      5L -> ((0.6931, 2L))))
  }

  test("entropy is permutation-invariant and bounded by ln(n_distinct)") {
    val got = entropies(Seq(
      (1L, "c a b a c a"),
      (2L, "a a a b c c")))
    assert(got(1L) === got(2L))
    assert(got(1L)._1 <= math.log(got(1L)._2.toDouble) + 1e-9)
  }
}
