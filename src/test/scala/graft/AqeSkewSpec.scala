package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE runtime re-planning on skew: the engine's answer to hot keys is
  * salting where the key is known (agg_salted_skew) and AQE skew-join
  * splitting where it is not — this pins the latter actually firing.
  */
class AqeSkewSpec extends SparkSuite {

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the testbed-sized partitions register as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 200k rows, 95% on one key + padding that must SURVIVE the
      // shuffle (referenced downstream — else pruning empties the hot
      // partition) so it is big in BYTES; right: uniform small. The
      // downstream agg is GLOBAL: a groupBy(k) would require hash
      // distribution on k, which forbids splitting skewed partitions.
      val left = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 1000).as("k"),
          concat(lit("x" * 64), col("id")).as("pad"))
      val right = spark.range(1000).select(col("id").as("k"), lit(1L).as("v"))
      val joined = left.join(right, "k")
        .agg(sum(length(col("pad"))).as("bytes"))
      joined.collect() // execute so AQE finalizes the plan
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$finalPlan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
