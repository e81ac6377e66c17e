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

  test("predicates and projections apply on top of the source") {
    val df = log(rooms = 4, n = 300)
      .filter(col("room") === "room2")
      .select("seq", "event_type")
    assert(df.count() === 300)
    assert(df.columns.toSeq === Seq("seq", "event_type"))
  }
}
