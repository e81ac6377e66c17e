package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Arrival-time twin of the batch burst detector
  * (operators/AnalyticsOps.anomalyBurst): per-user hour-bucket counts in
  * keyed state, with the all-integer 3σ test re-evaluated incrementally —
  * the emit-on-update CHANGELOG shape (the reference's A2 scoreboard
  * updates, ScoreboardFunction.java:77-101) applied to anomaly flags.
  *
  * The batch query tests every hour against the user's FULL-log moments,
  * so a flag is not monotone under arrival: an hour flagged early can
  * UN-flag once more hours raise the user's baseline (and vice versa).
  * The stream therefore emits flag TRANSITIONS — (user, hr, cnt,
  * flagged) whenever an hour's status differs from what was last
  * emitted — and the latest emission per (user, hr) always equals the
  * batch detector run on the data seen so far (StreamingSpec folds the
  * changelog and asserts exactly that).
  *
  * State per user = the (hour → count) map — bounded by the user's
  * ACTIVE hours, the same ≤720-per-month bound as the batch window
  * partition, plus the currently-flagged hour set (a subset). At 100 TB
  * a deployment ages closed hours out of the map with a retention
  * window; the testbed's 30-day span stays within the bound as-is.
  */
object StreamingAnomaly {

  case class HourEvent(user_id: Long, hr: Long)

  case class BurstState(
      counts: Map[Long, Long], flagged: Set[Long], seq: Long)

  /** One changelog row. `seq` is a per-user emission counter so a
    * consumer (and the parity spec) can fold "latest per (user, hr)"
    * without assuming sink ordering. */
  case class BurstFlag(
      user_id: Long, hr: Long, cnt: Long, flagged: Boolean, seq: Long)

  /** The batch predicate on one hour against full moments — shared
    * algebra: n·x − s > 0 ∧ (n·x − s)² > 9(n·q − s²). */
  private[graft] def isBurst(n: Long, s: Long, q: Long, x: Long): Boolean = {
    val d = n * x - s
    d > 0 && d * d > 9 * (n * q - s * s)
  }

  private[graft] def flagsOf(counts: Map[Long, Long]): Set[Long] = {
    val n = counts.size.toLong
    val s = counts.valuesIterator.sum
    val q = counts.valuesIterator.map(c => c * c).sum
    counts.collect { case (hr, x) if isBurst(n, s, q, x) => hr }.toSet
  }

  /** events (user_id, ts) → flag-transition changelog. */
  def bursts(events: DataFrame): Dataset[BurstFlag] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), expr(graft.operators.ExactSql.HourSpark).as("hr"))
      .as[HourEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BurstState, BurstFlag](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (uid, batch, state) =>
          val prev = state.getOption
            .getOrElse(BurstState(Map.empty, Set.empty, 0L))
          val counts = batch.foldLeft(prev.counts) { (m, e) =>
            m.updated(e.hr, m.getOrElse(e.hr, 0L) + 1L)
          }
          val now = flagsOf(counts)
          // transitions: newly flagged hours, un-flagged hours, and
          // flagged hours whose COUNT changed (the changelog consumer
          // must see the current count, not a stale one)
          val newly = now -- prev.flagged
          val cleared = prev.flagged -- now
          val recount = (now intersect prev.flagged)
            .filter(hr => counts(hr) != prev.counts.getOrElse(hr, 0L))
          val out = (newly.toSeq.sorted.map((_, true)) ++
            recount.toSeq.sorted.map((_, true)) ++
            cleared.toSeq.sorted.map((_, false)))
            .zipWithIndex.map { case ((hr, fl), i) =>
              BurstFlag(uid, hr, counts(hr), fl, prev.seq + 1 + i)
            }
          state.update(BurstState(counts, now, prev.seq + out.size))
          out.iterator
      }
  }
}
