package graft

import graft.operators.TextOps

/** text_inverted_index: posting dedup, ascending order, the bounded-heap
  * cap, and df counting the FULL posting set (not the capped slice).
  */
class InvertedIndexSpec extends SparkSuite {

  import spark.implicits._

  private def index(rows: Seq[(Long, String)]): Map[String, (Long, String)] =
    TextOps.invertedIndex(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap

  test("postings: deduped per doc, ascending, df over all docs") {
    val got = index(Seq(
      (3L, "alpha beta"),
      (1L, "alpha alpha gamma"), // repeated token: one posting
      (2L, "beta  alpha")))      // double space: empty token dropped
    assert(got("alpha") === ((3L, "1,2,3")))
    assert(got("beta") === ((2L, "2,3")))
    assert(got("gamma") === ((1L, "1")))
  }

  test("stop-word cap: df counts everything, postings truncate at the cap") {
    val n = TextOps.PostingCap + 5
    val docs = (1 to n).map(i => (i.toLong, "the")) :+
      ((n + 1).toLong, "rare")
    val got = index(docs)
    assert(got("the")._1 === n.toLong)
    assert(got("the")._2 ===
      (1 to TextOps.PostingCap).mkString(","))
    assert(got("rare") === ((1L, (n + 1).toString)))
  }
}
