package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates (§7 extension set): approx_count_distinct (HLL++).
  * Not oracle-checkable (engine-specific sketches), so accuracy is asserted
  * against the exact count here instead.
  */
class SketchSpec extends SparkSuite {

  test("approx_count_distinct within 5% of exact on every key column") {
    val e = Tables.events(spark, smokeDir)
    val row = e.agg(
      countDistinct(col("user_id")).as("exact_users"),
      approx_count_distinct(col("user_id")).as("approx_users"),
      countDistinct(col("event_id")).as("exact_events"),
      approx_count_distinct(col("event_id")).as("approx_events"))
      .collect()(0)
    val pairs = Seq((row.getLong(0), row.getLong(1)), (row.getLong(2), row.getLong(3)))
    pairs.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx=$approx exact=$exact")
    }
  }

  test("per-room approx distinct victims tracks exact") {
    val g = operators.EventOps.gameView(spark, smokeDir)
    val both = g.groupBy("room").agg(
      countDistinct(col("victim")).as("exact"),
      approx_count_distinct(col("victim"), 0.02).as("approx"))
      .collect()
    both.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / math.max(exact, 1) < 0.1,
        s"room=${r.getString(0)} approx=$approx exact=$exact")
    }
  }
}
