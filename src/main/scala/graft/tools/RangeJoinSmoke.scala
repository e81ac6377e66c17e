package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Range-join scale smoke: run the bucketized point-in-interval join
  * (RelationalOps.recentCountBucketed) over a synthetic event stream
  * orders of magnitude bigger than the testbed, assert the plan never
  * degrades to a nested loop, and cross-check correctness against the
  * naive non-equi join on a subsample (the naive plan is the quadratic
  * baseline the operator exists to avoid — running it at full N is the
  * failure mode, so it only sees the subsample).
  *
  *   N_EVENTS=2000000 N_USERS=10000 sbt "runMain graft.tools.RangeJoinSmoke"
  *
  * Events are generated distributed (xxhash64-derived users/timestamps,
  * no driver data) over a 30-day window; 1 in 5 is a probe ("purchase"),
  * the rest build ("click"). Expected matches per probe ≈ clicks per
  * user per day ≈ N·0.8/(users·30), so the default geometry exercises
  * real fan-out without blowing up the expected output.
  */
object RangeJoinSmoke {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("N_EVENTS", "2000000").toLong
    val users = sys.env.getOrElse("N_USERS", "10000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dayUs = 86400000000L
    val events = spark.range(n).repartition(32)
      .select(col("id").as("event_id"),
        pmod(xxhash64(col("id"), lit(1)), lit(users)).as("user_id"),
        pmod(xxhash64(col("id"), lit(2)), lit(30L * dayUs)).as("tu"),
        (pmod(xxhash64(col("id"), lit(3)), lit(5)) === 0).as("is_probe"))
    val probes = events.filter(col("is_probe"))
      .select("event_id", "user_id", "tu")
    val build = events.filter(!col("is_probe"))
      .select(col("user_id"), col("tu").as("btu"))

    val bucketized =
      graft.operators.RelationalOps.recentCountBucketed(probes, build)
    val physical = bucketized.queryExecution.executedPlan.toString
    assert(!physical.contains("NestedLoop"),
      s"bucketized range join degraded to a nested loop:\n$physical")

    val t0 = System.nanoTime()
    val total = bucketized.agg(
      count(lit(1)).as("n_probes"), sum("n_recent_clicks").as("n_matches"))
      .collect()(0)
    val secs = (System.nanoTime() - t0) / 1e9

    // correctness parity on a deterministic ~50k-event subsample
    // (stride floored at 1 so a small N_EVENTS run keeps every probe
    // instead of dividing by zero)
    val sProbes = probes.filter(
      pmod(col("event_id"), lit(math.max(1L, n / 50000L))) === 0)
    val sBuild = build
    val sBucketized =
      graft.operators.RelationalOps.recentCountBucketed(sProbes, sBuild)
    val sNaive = sProbes.alias("a")
      .join(sBuild.alias("b"),
        col("b.user_id") === col("a.user_id") &&
          col("btu") >= col("tu") - graft.operators.RelationalOps.RangeBucketUs &&
          col("btu") < col("tu"), "left")
      .groupBy(col("a.event_id").as("event_id"))
      .agg(count(col("btu")).as("n_recent_clicks"))
    val diff = sBucketized.except(sNaive).count() +
      sNaive.except(sBucketized).count()

    println(f"RANGEJOIN events=$n%d users=$users%d " +
      f"probes=${total.getLong(0)}%d matches=${total.getLong(1)}%d " +
      f"${secs}%.2f s ${n / secs / 1e6}%.2f M events/s subsample_diff=$diff%d")
    assert(diff == 0, s"bucketized != naive on the subsample ($diff rows)")
    assert(total.getLong(1) > 0, "no matches — generator geometry broken")
    spark.stop()
  }
}
