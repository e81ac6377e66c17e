package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** LshBucketCap semantics on the minhash LSH path: a (band, signature)
  * bucket STRICTLY above the cap drops before the pair self-join (the
  * hot-boilerplate guard), a bucket exactly AT the cap is kept (boundary
  * inclusive, matching the oracle's HAVING count(*) <= cap), and small
  * buckets elsewhere are untouched. Identical texts are used for the
  * planted pairs because identical docs share every band signature —
  * collision is certain, so the assertions are deterministic rather than
  * minhash-probabilistic. Cross-engine parity of the capped CTEs is
  * checked by the selfcheck run on a cap-active corpus (see SURVEY §7.9).
  */
class DedupCapSpec extends SparkSuite {

  /** nIdentical byte-identical docs (ids ≥ 1000, 'z' vocab) + one identical
    * pair (ids 1, 2, 'a…p' vocab — a 2-doc bucket, far under the cap).
    */
  private def corpus(nIdentical: Int) = {
    import spark.implicits._
    val boiler = (0 until nIdentical).map(i =>
      (1000L + i, (0 until 30).map(j => s"z$j").mkString(" ")))
    val pair = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o p"))
    (pair ++ boiler).toDF("doc_id", "text").repartition(4)
  }

  test("bucket above LshBucketCap drops; small buckets survive") {
    val pairs = DedupOps.minhashPairsOf(corpus(DedupOps.LshBucketCap.toInt + 1))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"2-doc bucket pair lost: $pairs")
    assert(!pairs.exists(p => p._1 >= 1000L || p._2 >= 1000L),
      s"pairs from the >cap identical cluster must drop: ${pairs.size} pairs")
  }

  test("bucket exactly at the cap is kept (boundary inclusive)") {
    val n = DedupOps.LshBucketCap.toInt
    val got = DedupOps.minhashPairsOf(corpus(n))
      .filter(col("doc_a") >= 1000L).count()
    assert(got == n.toLong * (n - 1) / 2,
      s"expected all ${n.toLong * (n - 1) / 2} at-cap pairs, got $got")
  }
}
