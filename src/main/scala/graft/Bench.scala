package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query timed on SPARK_GRAFT_SF_DIR.
  * Queries run in sorted name order so round-over-round comparisons are
  * stable; the first query eats JVM/codegen warmup, so a trivial warmup
  * action runs first.
  *
  * Output contract (driver parses a one-line JSON):
  *   line 1: compact  {"metric":"total","value":N,"unit":"sec","sf":…}
  *           where value = sum over the HEADLINE set (GQuery.bench == true;
  *           excludes the documented O(n²) correctness baselines)
  *   line 2: detailed {"metric":"detail", …, "queries":{name:sec,…}}
  *   file  : bench_out.json in the working dir with the detailed JSON,
  *           in case stdout gets mangled by the sbt log prefix.
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
      // DSV2 key-grouped reads (GameEventsSource) aggregate shuffle-free
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM paths shared by all queries (codegen, parquet footer reads)
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    val headline = SparkEntry.benchQueries.map(_.name).toSet
    val results = SparkEntry.all.sortBy(_.name).map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val headlineTotal = results.collect { case (k, v) if headline(k) => v }.sum
    val totalAll = results.map(_._2).sum
    val compact =
      s"""{"metric":"total","value":$headlineTotal,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"total_all_sec":$totalAll}"""
    val detail =
      s"""{"metric":"detail","value":$totalAll,"unit":"sec","sf":"$sfDir","headline_sec":$headlineTotal,"queries":$qs}"""
    println(compact)
    println(detail)
    Console.out.flush()
    try {
      val w = new java.io.PrintWriter("bench_out.json")
      try { w.println(compact); w.println(detail) } finally w.close()
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
