package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}
import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders

/** S5/A1 on the Spark 4 arbitrary-state API: a StatefulProcessor keeping the
  * running kill count per (room, killer) in a ValueState — the direct analog
  * of the scoreboard function's BookKeeper counter
  * (ScoreboardFunction.java:41-45): read counter, add, write back, emit the
  * new total (A2 changelog semantics).
  *
  * transformWithState is the successor to flatMapGroupsWithState (RocksDB-
  * backed state, multiple typed state variables, first-class timers); the
  * engine ships both so callers can pick per Spark version.
  */
object ScoreProcessor {

  final case class Death(room: String, killer: String)
  final case class Score(room: String, killer: String, kills: Long)

  class Processor extends StatefulProcessor[(String, String), Death, Score] {
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("kills", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: (String, String),
        rows: Iterator[Death],
        timerValues: TimerValues): Iterator[Score] = {
      val prev = if (count.exists()) count.get() else 0L
      val next = prev + rows.size
      count.update(next)
      Iterator(Score(key._1, key._2, next))
    }
  }

  /** Streaming kill counts via transformWithState (update mode). */
  def killCounts(deaths: Dataset[Death]): Dataset[Score] = {
    val spark = deaths.sparkSession
    import spark.implicits._
    deaths
      .groupByKey(d => (d.room, d.killer))
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
