package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query timed on SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout (driver contract). Queries run in sorted name
  * order so round-over-round comparisons are stable; the first query eats
  * JVM/codegen warmup, so a trivial warmup action runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM paths shared by all queries (codegen, parquet footer reads)
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    val results = SparkEntry.all.sortBy(_.name).map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
