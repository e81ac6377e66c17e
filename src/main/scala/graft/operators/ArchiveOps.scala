package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S9 tiered storage / offload (docs/en/game2-use-mq.md:141-145,
  * game-code/TODO.md:16): the reference's "move old log segments to cheap
  * storage; replay still works", re-expressed as the lakehouse layout it
  * maps to in Spark — the event log offloaded to DATE-PARTITIONED parquet
  * (`event_date=YYYY-MM-DD/` directories). Replay over a time range then
  * touches only the matching partition directories: the partition filter
  * is resolved against file-listing METADATA, so "read last week" costs
  * last week's bytes regardless of archive size — the property that makes
  * the offloaded tier cheap to query at 100 TB, and the storage-layout
  * twin of the filter pushdown the scans already get.
  *
  * Kept out of the oracle registry on purpose: the offload WRITES a
  * derived dataset, and the correctness gate's DuckDB oracle runs against
  * the driver's immutable testbed parquet only. ArchiveSpec proves the
  * three S9 claims instead: layout (one directory per date), lossless
  * replay (round-trip row parity), and pruning (a date-ranged read scans
  * only the matching partitions — asserted on PartitionFilters AND on the
  * files actually read).
  */
object ArchiveOps {

  /** Offload the event log to the archival tier: one parquet partition
    * directory per event date. Partition count = distinct dates — bounded
    * by retention, not corpus size; within a date, files parallelize as
    * usual. maxRecordsPerFile guards the hot-date-skew case (one huge
    * date must still split into parallel-readable files).
    */
  def offloadEvents(events: DataFrame, archiveDir: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .write
      .partitionBy("event_date")
      .option("maxRecordsPerFile", 1000000)
      .mode("overwrite")
      .parquet(archiveDir)

  /** Replay from the archival tier. The `event_date` partition column
    * comes back as a real column, so both date-ranged reads (pruned) and
    * full replays (every partition) go through the same entry.
    */
  def readArchive(spark: SparkSession, archiveDir: String): DataFrame =
    spark.read.parquet(archiveDir)
}
