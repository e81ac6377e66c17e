package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join scale path: two tables bucketed on the
  * join key join WITHOUT a shuffle on either side. At 100 TB this is the
  * difference between a network-bound and a local join; here we assert the
  * plan property that delivers it.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed orders ⋈ customer plans with zero shuffle exchanges") {
    // explicit per-table paths; warehouse dir is a static conf we can't touch
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")

    Tables.orders(spark, smokeDir)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    Tables.customer(spark, smokeDir)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").saveAsTable("b_customer")

    // disable broadcast so the join would otherwise shuffle both sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the join
      assert(!joinSection.contains("Exchange hashpartitioning(o_custkey") &&
        !joinSection.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      // and it is still correct
      val expect = Tables.orders(spark, smokeDir)
        .join(Tables.customer(spark, smokeDir),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
