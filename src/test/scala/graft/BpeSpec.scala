package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Hand-computed BPE application cases — the oracle hash-checks engine
  * parity; these pin the SEMANTICS (greedy left-to-right, order-sensitive
  * compounding, symbol-boundary safety) against values worked out by hand
  * from the merge table, so a both-engines-wrong replay cannot slip
  * through.
  */
class BpeSpec extends SparkSuite {

  private def countOf(text: String): Long = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .createOrReplaceTempView("bpe_probe")
    val sparkChain = {
      // re-derive the chain exactly as the query does
      TextOps.BpeMerges.foldLeft("regexp_replace(w, '(.)', ' $1 ')") {
        case (acc, (a, b)) => s"replace($acc, ' $a  $b ', ' $a$b ')"
      }
    }
    spark.sql(
      s"""SELECT aggregate(
         |  transform(
         |    transform(filter(split(text, ' '), w -> w != ''),
         |              w -> $sparkChain),
         |    m -> (length(m) - length(replace(m, ' ', ''))) div 2),
         |  CAST(0 AS BIGINT), (acc, x) -> acc + x) AS n
         |FROM bpe_probe""".stripMargin).collect()(0).getLong(0)
  }

  test("compounding merges collapse whole words (order-sensitivity)") {
    assert(countOf("the") === 1)   // t+h -> th, th+e -> the
    assert(countOf("data") === 1)  // d+a, da+t, dat+a
    assert(countOf("join") === 1)  // i+n, j+o, jo+in
    assert(countOf("row") === 1)   // r+o, ro+w
  }

  test("partial merges count intermediate symbols") {
    assert(countOf("query") === 3)  // qu | er | y
    assert(countOf("order") === 3)  // or | d | er
    assert(countOf("window") === 2) // win+d -> wind | o+w -> ow
    assert(countOf("zzz") === 3)    // no merge applies
  }

  test("greedy overlap: left-to-right non-overlapping application") {
    // merge (a,t) fires once on "atat" -> at|at (both pairs, no overlap
    // issue); "aaat" -> a|a|at (only the last pair matches (a,t))
    assert(countOf("atat") === 2)
    assert(countOf("aaat") === 3)
  }

  test("symbol-boundary safety: a merged symbol cannot re-split") {
    // "the the" = 2; the wrapper encoding must not let 'th' match a
    // bare 't','h' pair across boundaries
    assert(countOf("the the") === 2)
    // "dat" stops at da+t (dat) -- 1 token; "datat": d,a,t,a,t ->
    // (d,a)->da (da,t)->dat (dat,a)->data, then (a,t) cannot match
    // INSIDE the merged 'data' symbol; trailing t stays -> data|t = 2
    assert(countOf("datat") === 2)
  }

  test("the registered query agrees with the documents oracle shape") {
    val out = TextOps.textBpeExact.run(spark, smokeDir)
    assert(out.columns.toSeq === Seq("doc_id", "n_bpe_tokens", "n_words"))
    // BPE merges strictly reduce symbol counts: tokens <= chars, and a
    // corpus of English-ish words must merge SOMETHING
    val agg = out.agg(sum("n_bpe_tokens"), sum("n_words")).collect()(0)
    assert(agg.getLong(0) > agg.getLong(1),
      "BPE tokens must exceed word count (pieces, not words)")
    val chars = Tables.documents(spark, smokeDir)
      .agg(sum(length(regexp_replace(col("text"), " ", ""))))
      .collect()(0).getLong(0)
    assert(agg.getLong(0) < chars, "BPE must merge below character count")
  }
}
