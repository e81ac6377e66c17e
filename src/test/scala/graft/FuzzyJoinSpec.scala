package graft

import graft.operators.SimilarityOps

/** fuzzy_name_pairs: the deletion-neighborhood candidate generation must
  * find every insert/delete/substitute-1 pair and nothing farther.
  */
class FuzzyJoinSpec extends SparkSuite {

  import spark.implicits._

  private def pairs(names: Seq[String]): Set[(String, String)] =
    SimilarityOps.fuzzyPairs(names.toDF("name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("one edit links; two edits do not") {
    val got = pairs(Seq(
      "cat",   // ↔ cart (insert), ↔ car (substitute), ↔ at (delete)
      "cart",
      "car",
      "at",
      "dog"))  // ≥ 2 edits from everything
    assert(got === Set(
      ("cart", "cat"), ("car", "cat"), ("at", "cat"), ("car", "cart")))
  }

  test("shared deletion keys at distance 2 are candidates but verify away") {
    // id#101 / id#110 share the deletion keys id#10 and id#11 yet sit at
    // levenshtein 2 (no transpositions) — the exact verify must drop them
    val got = pairs(Seq("id#100", "id#101", "id#110", "id#999"))
    assert(got === Set(("id#100", "id#101"), ("id#100", "id#110")))
  }
}
