package graft

import java.sql.Timestamp

import graft.streaming.{EventStream, StreamingTopK}
import graft.streaming.StreamingTopK.Scored
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Checkpoint-restart recovery (ST6's effectively-once claim rests on
  * this, and no prior round exercised it): each case runs a stateful
  * query over HALF the input, stops it, feeds the remainder, restarts
  * from the SAME checkpoint, and asserts the final state equals the
  * whole-input answer. Every scenario is built so a silently-reset state
  * store yields a DIFFERENT (wrong) answer — continuity is what's
  * asserted, not just liveness:
  *
  *  - kill-count (hash-aggregation state): a count that must carry the
  *    pre-restart partials;
  *  - last-per-key (mapGroupsWithState): the post-restart batch carries
  *    only STALE rows, so the right answer exists only in restored state;
  *  - streaming top-k (transformWithState / RocksDB): the post-restart
  *    candidate displaces one slot of a ranking whose other slots were
  *    learned before the restart.
  */
class StreamingRestartSpec extends SparkSuite {

  import spark.implicits._

  private def ckDir(): String =
    java.nio.file.Files.createTempDirectory("graft-restart-ck").toString

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  /** (event_id, ts, user_id, event_type, value, props) rows shaped like
    * the events table — what gameColumns expects. killer = u(props.k % 30),
    * victim = u(user_id), room = room(user_id % 8). */
  private type Ev = (Long, Timestamp, Long, String, Double, String)
  private def kill(id: Long, victimUid: Long, killerK: Long): Ev =
    (id, ts((id % 60).toInt), victimUid, "error", 1.0, s"""{"k": $killerK}""")

  private def eventsDF(input: MemoryStream[Ev]): DataFrame =
    input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("kill-count aggregation state survives a checkpoint restart") {
    implicit val sqlCtx = spark.sqlContext
    val ck = ckDir()
    val input = MemoryStream[Ev]
    def start(name: String) =
      EventStream.killCounts(eventsDF(input))
        .writeStream.outputMode(OutputMode.Complete)
        .option("checkpointLocation", ck)
        .format("memory").queryName(name).start()

    // first half: 3 kills by u5 (props k=5) on victim u1 in room1
    val q1 = start("restart_kills_1")
    input.addData(kill(1, 1, 5), kill(2, 1, 5), kill(3, 1, 5))
    q1.processAllAvailable()
    assert(spark.table("restart_kills_1")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet ===
      Set(("u5", 3L)))
    q1.stop()

    // fed while DOWN: 2 more by u5, plus a killer seen only post-restart
    input.addData(kill(4, 1, 5), kill(5, 1, 5), kill(6, 2, 7))
    val q2 = start("restart_kills_2")
    q2.processAllAvailable()
    q2.stop()
    val after = spark.table("restart_kills_2")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // 3 (pre-restart state) + 2 = 5: a reset store would report 2
    assert(after === Set(("room1", "u5", 5L), ("room2", "u7", 1L)))
  }

  // update-mode emissions land in a driver-side buffer via foreachBatch:
  // the memory sink refuses checkpoint recovery outside Complete mode,
  // and foreachBatch is exactly the recoverable sink shape a real
  // deployment uses for update-mode state (the kvSink pattern)
  private def collectRows(buf: scala.collection.mutable.Buffer[org.apache.spark.sql.Row])
  : (org.apache.spark.sql.DataFrame, Long) => Unit =
    (batch, _) => buf.synchronized { buf ++= batch.collect() }

  test("mapGroupsWithState last-per-key state survives a restart") {
    implicit val sqlCtx = spark.sqlContext
    val ck = ckDir()
    val input = MemoryStream[Ev]
    val emitted = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.Row]
    def start() =
      EventStream.lastPerKey(eventsDF(input)).toDF()
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ck)
        .foreachBatch(collectRows(emitted)).start()

    val q1 = start()
    input.addData((10L, ts(1), 1L, "click", 42.0, """{"k": 1}"""))
    q1.processAllAvailable()
    q1.stop()
    emitted.clear() // keep only post-restart emissions

    // post-restart batch carries ONLY a STALE row (seq 5 < 10): the
    // correct emission exists only if seq-10 state was restored
    input.addData((5L, ts(2), 1L, "click", 99.0, """{"k": 1}"""))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val rows = emitted.synchronized(
      emitted.map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq)
    assert(rows === Seq(("u1", 10L, 42.0)),
      s"stale row overrode restored state: $rows")
  }

  test("transformWithState top-k ranking survives a restart") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ck = ckDir()
    val input = MemoryStream[Scored]
    val emitted = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.Row]
    def start() =
      StreamingTopK.topkPerQuery(input.toDS(), k = 3).toDF()
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ck)
        .foreachBatch(collectRows(emitted)).start()

    val q1 = start()
    input.addData(Scored(0L, 10L, 0.5), Scored(0L, 11L, 0.9), Scored(0L, 12L, 0.7))
    q1.processAllAvailable()
    q1.stop()
    emitted.clear() // keep only the post-restart changelog

    // one new candidate displaces only rank 3; ranks 1-2 must come back
    // from the restored state (a reset store would rank 13 first, alone)
    input.addData(Scored(0L, 13L, 0.8))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val ranking = emitted.synchronized(
      emitted.map(r => (r.getInt(3), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq)
    assert(ranking === Seq((1, 11L, 0.9), (2, 13L, 0.8), (3, 12L, 0.7)),
      s"restored ranking wrong: $ranking")
  }
}
