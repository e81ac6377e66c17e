package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream

/** The broker seam, EXECUTED: `readEvents` over captured broker frames
  * (EventSourceConfig.pulsarReplay) runs the same `pulsar` normalization
  * branch a live connector feeds — topic→room parse, MessageID→event_id,
  * publishTime→ts, JSON payload decode — end-to-end through micro-batches
  * into a sink, not just config-inspected.
  */
class PulsarSeamSpec extends SparkSuite {

  test("captured-frame replay executes the broker normalization end-to-end") {
    implicit val sqlCtx = spark.sqlContext
    val framesDir =
      java.nio.file.Files.createTempDirectory("graft_frames").toString

    // broker frames built from testbed events: 3 rooms keyed by user_id,
    // reference topic naming (one topic per room, "-event-topic" suffix)
    val ev = Tables.events(spark, smokeDir).orderBy("event_id").limit(90)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val frames = ev.select(
      concat(lit("persistent://public/default/room-"),
        pmod(col("user_id"), lit(3)), lit("-event-topic")).as("__topic"),
      col("event_id").as("__sequenceId"),
      col("ts").as("__publishTime"),
      to_json(struct(col("user_id"), col("event_type"), col("value"),
        col("props"))).cast("binary").as("value"))
    // 3 files → 3 micro-batches under maxFilesPerTrigger=1: the mapping
    // must hold across batch boundaries, not just on one drain
    frames.repartition(3).write.mode("overwrite").parquet(framesDir)

    val q = EventStream.readEvents(spark,
        EventStream.EventSourceConfig.pulsarReplay(framesDir))
      .writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName("pulsar_replay").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("pulsar_replay")
    // the broker contract shape: room column present, broker cols gone
    assert(got.columns.toSeq ===
      Seq("room", "event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(got.count() === 90)
    // row-for-row against the mapping computed batch-side
    val want = ev.select(
      concat(lit("room-"), pmod(col("user_id"), lit(3))).as("room"),
      col("event_id"), col("ts"), col("user_id"), col("event_type"),
      col("value"), col("props"))
    assert(got.except(want).count() === 0, "stream rows not in expectation")
    assert(want.except(got).count() === 0, "expected rows missing")
    // the "-event-topic" suffix strip actually executed
    assert(got.filter(col("room").rlike("event-topic")).count() === 0)
    assert(got.select("room").distinct().count() === 3)
  }

  test("topic→room parse edges: no slash, no suffix, doubled suffix, empty segment") {
    // pins the substring_index + anchored-replace formulation (9× the
    // negated-class/lazy-quantifier extract it replaced) on every
    // boundary shape. One DELIBERATE divergence from the old regex: a
    // suffix-only segment "-event-topic" parses as room "" here (the
    // TrimSuffix semantics of the reference's "{room}-event-topic"
    // naming), where the old lazy-group regex returned "-event-topic"
    // because its capture group could not be empty.
    val cases = Seq(
      ("persistent://public/default/room-1-event-topic", "room-1"), // normal
      ("room-2-event-topic", "room-2"),            // bare topic, no path
      ("persistent://t/ns/room-3", "room-3"),      // no suffix to strip
      ("a/b-event-topic-event-topic", "b-event-topic"), // strip ONE suffix
      ("a/", ""),                                  // empty last segment
      ("-event-topic", ""))                        // suffix-only segment: TrimSuffix semantics
    import spark.implicits._
    val got = EventStream.normalize(
      EventStream.EventSourceConfig.pulsarReplay("/nonexistent"),
      cases.map(_._1).toDF("__topic")
        .withColumn("__sequenceId", lit(1L))
        .withColumn("__publishTime", current_timestamp())
        .withColumn("value", to_json(struct(lit(1L).as("user_id"),
          lit("e").as("event_type"), lit(1.0).as("value"),
          lit("{}").as("props"))).cast("binary")))
      .select("room").as[String].collect().toSeq
    assert(got === cases.map(_._2), s"room parse drifted: $got")
  }
}
