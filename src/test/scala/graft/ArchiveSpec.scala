package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.ArchiveOps

/** S9 tiered storage: offload → date-partitioned layout → pruned replay.
  * The three claims the SURVEY makes for the archival tier, asserted on a
  * real offload of the testbed event log.
  */
class ArchiveSpec extends SparkSuite {

  private lazy val archiveDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_archive").toString
    ArchiveOps.offloadEvents(Tables.events(spark, smokeDir), dir)
    dir
  }

  test("layout: one partition directory per event date") {
    val dates = Tables.events(spark, smokeDir)
      .select(to_date(col("ts")).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(dates.size > 1, "testbed must span several dates")
    val dirs = new java.io.File(archiveDir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs === dates.map(d => s"event_date=$d"))
  }

  test("replay from the archive is lossless") {
    val src = Tables.events(spark, smokeDir)
    val back = ArchiveOps.readArchive(spark, archiveDir).drop("event_date")
      .select(src.columns.map(col): _*)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).count() === 0)
    assert(src.exceptAll(back).count() === 0)
  }

  test("date-ranged replay prunes to the matching partitions") {
    val allDates = Tables.events(spark, smokeDir)
      .select(to_date(col("ts")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0))
    val want = allDates.head
    val q = ArchiveOps.readArchive(spark, archiveDir)
      .filter(col("event_date") === lit(want))
    q.collect()
    val scan = (q.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no file scan in plan"))
    // the filter landed on the PARTITION listing, not the row data
    assert(scan.toString.contains("PartitionFilters"),
      s"partition filter missing:\n$scan")
    assert(scan.metadata.get("PartitionFilters").exists(_.contains("event_date")),
      "event_date must be a partition (metadata) filter")
    // and only the matching partition was read (the scan's own runtime
    // metric — DataFrame.inputFiles reflects the unfiltered relation)
    assert(scan.metrics("numPartitions").value === 1,
      s"pruning read ${scan.metrics("numPartitions").value} partitions, " +
        s"expected 1 of ${allDates.length}")
    // result parity with the unpartitioned source on the same predicate
    val expect = Tables.events(spark, smokeDir)
      .filter(to_date(col("ts")) === lit(want)).count()
    assert(q.count() === expect && expect > 0)
  }
}
