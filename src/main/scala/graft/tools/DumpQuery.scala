package graft.tools

/** Dev tool: dump ONE registry query's result to parquet — the single-query
  * slice of graft.Verify, for driver-style DuckDB hash comparisons without
  * paying the full 183-query dump.
  *
  *   sbt "runMain graft.tools.DumpQuery <query_name> <sfDir> <outPath>"
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outPath) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    q.run(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(outPath)
    println(s"[dump] $name -> $outPath")
    spark.stop()
  }
}
