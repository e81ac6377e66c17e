package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming incremental ANN: per-query cosine top-k maintained as keyed
  * state over an unbounded stream of scored candidates — the streaming
  * sibling of the batch CosineTopKAggregate (same total order: score DESC,
  * id ASC). Each micro-batch merges new candidates into the query's
  * bounded k-list; when the list changes, the NEW full ranking is emitted
  * (changelog semantics, like the scoreboard's emit-on-update A2).
  *
  * Scale posture: state per query is exactly k (id, score) pairs — bytes,
  * not candidates; the shuffle key is query_id, identical to the batch
  * aggregate's grouping key. Requires the RocksDB state store
  * (transformWithState).
  */
object StreamingTopK {

  final case class Scored(query_id: Long, neighbor_id: Long, cos: Double)
  final case class RankedItem(neighbor_id: Long, cos: Double)
  final case class TopKState(items: List[RankedItem])
  final case class Ranked(query_id: Long, neighbor_id: Long, cos: Double, rank: Int)

  /** better-than order shared with CosineTopKAggregate. */
  private def better(a: RankedItem, b: RankedItem): Boolean = {
    val c = java.lang.Double.compare(a.cos, b.cos)
    c > 0 || (c == 0 && a.neighbor_id < b.neighbor_id)
  }

  class TopKProcessor(k: Int)
      extends StatefulProcessor[Long, Scored, Ranked] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[TopKState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopKState]("topk",
        Encoders.product[TopKState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[Scored],
        timerValues: TimerValues): Iterator[Ranked] = {
      val prev = Option(state.get()).map(_.items).getOrElse(Nil)
      // dedup by neighbor: keep the best score seen for each id
      val byId = scala.collection.mutable.LinkedHashMap.empty[Long, RankedItem]
      prev.foreach(i => byId(i.neighbor_id) = i)
      rows.foreach { r =>
        val cand = RankedItem(r.neighbor_id, r.cos)
        byId.get(r.neighbor_id) match {
          case Some(old) if !better(cand, old) => // keep old
          case _ => byId(r.neighbor_id) = cand
        }
      }
      val next = byId.values.toList.sortWith(better).take(k)
      // bit-level double compare: case-class == uses NaN != NaN, which
      // would re-emit an unchanged ranking forever once a NaN score
      // (zero-norm vector) enters the top-k
      val unchanged = next.size == prev.size &&
        next.zip(prev).forall { case (a, b) =>
          a.neighbor_id == b.neighbor_id &&
            java.lang.Double.compare(a.cos, b.cos) == 0
        }
      if (unchanged) Iterator.empty
      else {
        state.update(TopKState(next))
        next.iterator.zipWithIndex.map { case (i, idx) =>
          Ranked(key, i.neighbor_id, i.cos, idx + 1)
        }
      }
    }
  }

  /** scored candidate stream → changelog of per-query top-k rankings. */
  def topkPerQuery(scored: Dataset[Scored], k: Int): Dataset[Ranked] = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      .groupByKey(_.query_id)
      .transformWithState(new TopKProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }
}
