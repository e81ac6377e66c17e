package graft

import org.apache.spark.sql.functions._
import graft.functions.LastBySeqAggregator
import graft.streaming.ScoreProcessor

/** Custom-aggregation extension points (§2.8): the typed Aggregator matches
  * the built-in max_by, and the transformWithState processor matches the
  * batch aggregation — state APIs and declarative plans agree.
  */
class AggregatorSpec extends SparkSuite {

  test("LastBySeqAggregator UDAF == max_by compaction") {
    import spark.implicits._
    spark.udf.register("graft_last_by_seq", udaf(LastBySeqAggregator))
    val game = operators.EventOps.gameView(spark, smokeDir)
    game.createOrReplaceTempView("game_v")
    val viaUdaf = spark.sql(
      """SELECT room, victim, graft_last_by_seq(seq, value) AS last_value
        |FROM game_v GROUP BY room, victim""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val viaMaxBy = game.groupBy("room", "victim")
      .agg(max_by(col("value"), col("seq")).as("last_value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(viaUdaf === viaMaxBy)
    assert(viaUdaf.nonEmpty)
  }

  test("UDAF plans with partial aggregation") {
    import spark.implicits._
    spark.udf.register("graft_last_by_seq", udaf(LastBySeqAggregator))
    operators.EventOps.gameView(spark, smokeDir).createOrReplaceTempView("game_v2")
    val plan = spark.sql(
      "SELECT room, graft_last_by_seq(seq, value) FROM game_v2 GROUP BY room")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_last_by_seq") ||
      "Aggregate".r.findAllIn(plan).size >= 2,
      s"expected two-phase aggregation:\n$plan")
  }

  test("transformWithState kill counts == batch aggregation") {
    import spark.implicits._
    // transformWithState needs the RocksDB provider (multiple column families)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = graft.streaming.EventStream.readEvents(spark, smokeDir)
    val deaths = operators.EventOps.gameColumns(stream)
      .filter(col("event_type") === "error")
      .filter(col("victim") =!= col("killer"))
      .select(col("room"), col("killer").as("killer"))
      .as[ScoreProcessor.Death]
    val out = ScoreProcessor.killCounts(deaths)
    val q = out.toDF().writeStream
      .outputMode("update").format("memory").queryName("tws_scores").start()
    q.processAllAvailable()
    q.stop()
    // update mode emits running totals; final per key = max
    val streamed = spark.table("tws_scores")
      .groupBy("room", "killer").agg(max("kills").as("kills"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = graft.streaming.EventStream
      .killCounts(Tables.events(spark, smokeDir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
