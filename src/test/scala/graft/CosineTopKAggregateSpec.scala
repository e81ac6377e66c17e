package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CosineTopKAggregate

/** The double-score top-k aggregate fused into the ANN per-query rankers:
  * two-phase planning, window-parity on real-shaped data, deterministic
  * tie-breaks, bounded output.
  */
class CosineTopKAggregateSpec extends SparkSuite {

  test("graft_cosine_topk plans with partial (map-side) aggregation") {
    CosineTopKAggregate.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((1L, 10L, 0.9), (1L, 11L, 0.8)).toDF("q", "id", "cos")
    val plan = df.groupBy("q").agg(expr("graft_cosine_topk(cos, id, 2)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_cosinetopkaggregate"),
      s"expected two-phase aggregation:\n$plan")
  }

  test("matches the row_number window form it replaces") {
    CosineTopKAggregate.ensureRegistered(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 4000).map { i =>
      (i % 7L, i.toLong, math.rint(rnd.nextDouble() * 100) / 100) // dup scores
    }
    val df = rows.toDF("query_id", "neighbor_id", "cos").repartition(32)

    val viaAgg = df.groupBy("query_id")
      .agg(expr("graft_cosine_topk(cos, neighbor_id, 5)").as("t"))
      .select(col("query_id"), posexplode(col("t")).as(Seq("pos", "kv")))
      .select(col("query_id"), col("kv.id").as("neighbor_id"),
        col("kv.score").as("cos"), (col("pos") + 1).cast("long").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("neighbor_id"))
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3).toLong)).toSet

    assert(viaAgg === viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("non-numeric score / non-integral id fail at analysis, not on executors") {
    CosineTopKAggregate.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((1L, "oops", 0.5)).toDF("q", "s", "cos")
    val badScore = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("q").agg(expr("graft_cosine_topk(s, q, 3)")).collect()
    }
    assert(badScore.getMessage.contains("score requires"))
    val badId = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("q").agg(expr("graft_cosine_topk(cos, cos, 3)")).collect()
    }
    assert(badId.getMessage.contains("id requires"))
  }

  test("equal scores break ties by id ascending; output bounded at k") {
    CosineTopKAggregate.ensureRegistered(spark)
    import spark.implicits._
    val df = (1 to 100).map(i => (0L, i.toLong, 0.5))
      .toDF("q", "id", "cos").repartition(16)
    val top = df.groupBy("q").agg(expr("graft_cosine_topk(cos, id, 3)").as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.id"), col("e.score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(top === Seq((1L, 0.5), (2L, 0.5), (3L, 0.5)))
  }
}
