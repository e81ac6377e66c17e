package graft

import graft.tools.SqlParityProbe.canon

/** The temp-view catalog contract: `Tables.registerViews` + `spark.sql` runs
  * the ANSI subset of the oracle SQL with results identical to the engine's
  * DataFrame queries. The pinned list is every oracle whose SQL parses in
  * Spark's dialect (probed by graft.tools.SqlParityProbe — the rest use
  * DuckDB-only list lambdas / unnest / `//`); parity here means a THIRD
  * independent evaluation (Spark SQL planner over the same text DuckDB
  * hash-verifies) agrees with the DataFrame plan.
  */
class SqlParitySpec extends SparkSuite {

  private val AnsiSubset = Seq(
    "agg_above_type_avg", "agg_distinct_cells", "agg_priority_count",
    "agg_salted_skew", "dedup_exact", "filter_event_type", "funnel_stages",
    "join_anti", "join_broadcast", "join_hash_equi", "join_left_display",
    "join_semi", "next_position", "obstacle_density", "q1_agg",
    "q7_volume_shipping", "q10_returned_items",
    "sample_hash_bernoulli", "sample_stratified", "setop_intersect",
    "setop_obstacle_build")

  test("every ANSI-subset oracle runs through spark.sql with identical results") {
    Tables.registerViews(spark, smokeDir)
    val byName = SparkEntry.all.map(q => q.name -> q).toMap
    val failures = AnsiSubset.flatMap { name =>
      val viaSql = canon(spark.sql(SparkEntry.oracleSql(name)))
      val viaDf = canon(byName(name).run(spark, smokeDir))
      if (viaSql == viaDf) None
      else Some(s"$name: sql=${viaSql.size} rows, df=${viaDf.size} rows, " +
        s"first diff: ${viaSql.zip(viaDf).find(p => p._1 != p._2)}")
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("registerViews exposes all ten testbed tables") {
    Tables.registerViews(spark, smokeDir)
    Tables.All.foreach { t =>
      assert(spark.catalog.tableExists(t), s"missing view: $t")
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() === 1)
    }
    // the events view must carry the rebuilt µs timestamp, not raw nanos
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }
}
