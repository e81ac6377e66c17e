package graft

import org.apache.spark.sql.functions._
import graft.game.{GameEvent, GameFold}

/** The DSV2 event-log source: schema, determinism, per-room partitioning,
  * ordering contract, and end-to-end integration with the fold.
  */
class GameEventsSourceSpec extends SparkSuite {

  private def log(rooms: Int = 4, n: Long = 500, seed: Long = 42) =
    spark.read.format("graft.sources.GameEventsProvider")
      .option("rooms", rooms).option("eventsPerRoom", n).option("seed", seed)
      .load()

  test("schema, row count, and per-room partitioning") {
    val df = log(rooms = 5, n = 200)
    assert(df.columns.toSeq === Seq("room", "seq", "event_type", "name",
      "bomb_name", "comment", "x", "y", "alive"))
    assert(df.count() === 1000)
    assert(df.rdd.getNumPartitions === 5, "one input partition per room")
    // each partition holds exactly one room (no shuffle needed for per-room ops)
    val mix = df.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(countDistinct("room").as("nrooms"))
      .agg(max("nrooms")).collect()(0).getLong(0)
    assert(mix === 1)
  }

  test("generation is deterministic and seed-sensitive") {
    val a = log().collect().map(_.toString).sorted.toSeq
    val b = log().collect().map(_.toString).sorted.toSeq
    val c = log(seed = 7).collect().map(_.toString).sorted.toSeq
    assert(a === b)
    assert(a !== c)
  }

  test("rows arrive in seq order within each partition") {
    val ordered = log().rdd.mapPartitions { it =>
      val seqs = it.map(_.getLong(1)).toSeq
      Iterator(seqs == seqs.sorted)
    }.collect()
    assert(ordered.forall(identity))
  }

  test("source output folds end to end") {
    import spark.implicits._
    val events = log(rooms = 3, n = 400)
      .withColumn("list", array().cast("array<int>"))
      .as[GameEvent]
    val summaries = GameFold.summarize(events).collect()
    assert(summaries.length === 3)
    assert(summaries.forall(_.n_events === 400))
    assert(summaries.forall(_.n_players > 0))
  }

  test("reported key-grouped partitioning eliminates the groupBy shuffle") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val agg = log(rooms = 6, n = 100)
        .groupBy("room").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"groupBy(room) still shuffles despite reported partitioning:\n$plan")
      assert(agg.collect().map(r => (r.getString(0), r.getLong(1))).toMap
        .values.forall(_ === 100L))
    } finally spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
  }

  test("presorted fold on the source == shuffling fold, with zero exchanges") {
    import spark.implicits._
    val events = log(rooms = 4, n = 300)
      .withColumn("list", array().cast("array<int>"))
      .as[GameEvent]
    val fast = GameFold.summarizePresorted(events)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"presorted fold still shuffles:\n$plan")
    assert(fast.collect().sortBy(_.room).toSeq ===
      GameFold.summarize(events).collect().sortBy(_.room).toSeq)
  }

  test("predicates and projections apply on top of the source") {
    val df = log(rooms = 4, n = 300)
      .filter(col("room") === "room2")
      .select("seq", "event_type")
    assert(df.count() === 300)
    assert(df.columns.toSeq === Seq("seq", "event_type"))
  }
}
