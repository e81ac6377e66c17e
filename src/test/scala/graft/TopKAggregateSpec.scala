package graft

import org.apache.spark.sql.functions._
import graft.functions.TopKAggregate

/** The custom top-k aggregate: two-phase planning, bounded output,
  * deterministic tie-breaks, and heap-merge correctness across partitions.
  */
class TopKAggregateSpec extends SparkSuite {

  test("graft_topk plans with partial (map-side) aggregation") {
    TopKAggregate.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(("r1", "a", 5L), ("r1", "b", 3L)).toDF("room", "k", "s")
    val plan = df.groupBy("room").agg(expr("graft_topk(s, k, 2)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkaggregate"),
      s"expected two-phase aggregation:\n$plan")
  }

  test("ties break by key ascending; output bounded at k") {
    TopKAggregate.ensureRegistered(spark)
    import spark.implicits._
    // many partitions so merge() is exercised, equal scores everywhere
    val df = (1 to 100).map(i => ("r", f"k$i%03d", 7L))
      .toDF("room", "k", "s").repartition(16)
    val top = df.groupBy("room").agg(expr("graft_topk(s, k, 3)").as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.key"), col("e.score"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top === Seq(("k001", 7L), ("k002", 7L), ("k003", 7L)))
  }

  test("matches orderBy+limit on skewed scores across partitions") {
    TopKAggregate.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(i => ("g" + (i % 4), "k" + i, rnd.nextInt(1000).toLong))
    val df = rows.toDF("g", "k", "s").repartition(32)
    val viaAgg = df.groupBy("g").agg(expr("graft_topk(s, k, 5)").as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("p", "e")))
      .select(col("g"), col("e.key"), col("e.score"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy { case (_, k, s) => (-s, k) }.take(5).map(t => (g, t._2, t._3))
    }.toSet
    assert(viaAgg === expected)
  }
}
