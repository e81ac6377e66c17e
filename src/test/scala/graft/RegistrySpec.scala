package graft

/** Contract-level checks: every registered query runs on the smoke testbed,
  * has unique names, and every oracle key points at a registered query.
  * Deeper value assertions live in the per-family specs.
  */
class RegistrySpec extends SparkSuite {

  test("query names are unique") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicates: ${names.diff(names.distinct)}")
  }

  test("oracleSql keys all exist in queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.all) {
    test(s"${q.name} runs on sf0.001 and is deterministic in size") {
      val df = q.run(spark, smokeDir)
      val n = df.count()
      // the NON-VACUITY manifest (GQuery.minRows, default 1): a query that
      // silently returns 0 rows turns its oracle row into a 0 = 0 hash
      // match that can never fail — trip loudly instead
      val floor = q.minRowsAt(smokeDir)
      assert(n >= floor,
        s"${q.name} returned $n rows < minRows=$floor: the oracle " +
          "row is vacuous — re-arm the query or justify an explicit " +
          "minRows/smokeMinRows override")
      assert(df.columns.nonEmpty)
      // re-run: same row count (no nondeterminism in the result set size)
      assert(q.run(spark, smokeDir).count() === n)
    }
  }
}
