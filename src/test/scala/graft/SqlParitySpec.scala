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
    "agg_above_type_avg", "agg_distinct_cells", "agg_mode_exact",
    "agg_salted_skew", "cdc_snapshot_diff", "dedup_exact", "dq_referential",
    "filter_event_type", "funnel_stages", "funnel_windowed",
    "fuzzy_name_pairs", "join_anti", "join_broadcast",
    "join_followup_window", "join_hash_equi", "join_left_display",
    "join_semi", "next_position", "obstacle_density", "q10_returned_items",
    "q11_important_parts", "q13_customer_distribution", "q15_top_supplier",
    "q16_supplier_part_counts", "q19_disjunctive_revenue",
    "q20_excess_shipments", "q21_suppliers_kept_waiting",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q4_order_priority", "q5_region_revenue", "q6_forecast_revenue",
    "q7_volume_shipping", "q9_product_profit", "reshape_unpivot",
    "sample_hash_bernoulli", "sample_stratified", "setop_intersect",
    "setop_obstacle_build", "skyline_pareto", "tableview_tombstone",
    "window_drawdown", "window_ntile_quartiles")

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
