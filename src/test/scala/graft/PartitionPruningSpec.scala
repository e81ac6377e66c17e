package graft

import org.apache.spark.sql.functions._

/** The reference's first design optimization: room = topic, so queries never
  * touch other rooms' data (SURVEY §4 row 1). In Spark that is a
  * partitioned-by-room layout + partition pruning — asserted here end to
  * end: write the event log partitioned by room, filter one room, and the
  * scan must list only that room's directory.
  */
class PartitionPruningSpec extends SparkSuite {

  test("room filter prunes to a single partition directory") {
    val dir = java.nio.file.Files.createTempDirectory("rooms").toString + "/events"
    operators.EventOps.gameView(spark, smokeDir)
      .write.partitionBy("room").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("room") === "room3")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(room"),
      s"no partition filter in scan:\n$plan")

    // physical check: only the one directory is actually read
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("room=room3")),
      s"scan read outside room=room3: ${files.mkString(", ")}")

    // and the pruned read equals the filtered full read
    val full = operators.EventOps.gameView(spark, smokeDir)
      .filter(col("room") === "room3").count()
    assert(pruned.count() === full)
  }
}
