package graft

import graft.operators.TextOps

/** quality_source_filter and its salted twin: the twin must be
  * row-identical to the plain gate (the whole point — same semantics,
  * skew-proof plan) and must actually take the pinned co-keyed path
  * (a hand-salted join that silently broadcasts carries its salt as
  * dead weight — the overlap-join lesson).
  */
class SourceGateSpec extends SparkSuite {

  test("salted gate is row-identical to the plain gate") {
    val plain = TextOps.qualitySourceFilter.run(spark, smokeDir)
    val salted = TextOps.qualitySourceFilterSalted.run(spark, smokeDir)
    assert(plain.count() > 0)
    assert(plain.except(salted).count() === 0)
    assert(salted.except(plain).count() === 0)
  }

  test("salted gate plans a shuffled hash join on the salted key") {
    val q = TextOps.qualitySourceFilterSalted.run(spark, smokeDir)
    val plan = q.queryExecution.sparkPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"expected the SHUFFLE_HASH-pinned join:\n$plan")
    assert(plan.toLowerCase.contains("salt"), "join key must carry the salt")
    assert(!plan.contains("BroadcastHashJoin"),
      "salted gate must not silently broadcast")
  }

  test("both kept and dropped sources exist at the smoke sf") {
    val kept = TextOps.qualitySourceFilter.run(spark, smokeDir)
      .select("source").distinct().count()
    val all = Tables.documents(spark, smokeDir)
      .select("source").distinct().count()
    assert(kept > 0 && kept < all,
      s"threshold must split sources (kept $kept of $all)")
  }
}
