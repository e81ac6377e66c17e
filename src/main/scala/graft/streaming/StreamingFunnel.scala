package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Arrival-time twin of the batch ordered funnel
  * (operators/AnalyticsOps.funnel): a per-user stage machine in keyed
  * state. The batch query computes each stage's earliest entry by joining
  * min-aggregates; the stream folds the same gates incrementally —
  * state per user is just the three stage-entry times (bounded,
  * cardinality = users, exactly the scoreboard-state shape of
  * function-code/src/main/java/.../ScoreboardFunction.java:77-101).
  *
  * Ordering contract: events are folded in `ts` order WITHIN each
  * micro-batch (sorted before the fold), and batches are assumed
  * time-ordered across the stream — the repo's replay-pacing assumption
  * (ST8; same contract as the GameFold's presorted path). Under it the
  * first qualifying event IS the earliest, so final stages equal the
  * batch funnel's membership exactly (StreamingSpec asserts this).
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, event_type: String, t: Long)

  /** Stage-entry times (micros); None = stage not reached. */
  case class FunnelState(
      viewT: Option[Long], clickT: Option[Long], purchaseT: Option[Long]) {
    def stage: Int =
      if (purchaseT.isDefined) 3
      else if (clickT.isDefined) 2
      else if (viewT.isDefined) 1
      else 0
  }

  case class FunnelStage(user_id: Long, stage: Int)

  private[graft] def fold(st: FunnelState, e: FunnelEvent): FunnelState =
    e.event_type match {
      case "view" if st.viewT.isEmpty =>
        st.copy(viewT = Some(e.t))
      case "click" if st.clickT.isEmpty &&
          st.viewT.exists(e.t > _) =>
        st.copy(clickT = Some(e.t))
      case "purchase" if st.purchaseT.isEmpty &&
          st.clickT.exists(e.t > _) =>
        st.copy(purchaseT = Some(e.t))
      case _ => st
    }

  case class LastEvent(event_type: String, t: Long, event_id: Long)
  case class Transition(prev_type: String, next_type: String)

  /** Arrival-time twin of the batch transition matrix
    * (AnalyticsOps.transitions): per-user state is ONE row — the last
    * event seen — and each micro-batch emits the (prev → next) steps it
    * completes, in append mode. Within a batch events sort by (t,
    * event_id) (the batch window's exact order); across batches the
    * carried last-event row stitches the sequence. Aggregating the
    * emitted steps reproduces the batch matrix counts row-for-row under
    * the replay-pacing contract (StreamingSpec asserts it).
    */
  def transitions(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("event_id"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, Transition](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (_, batch, state) =>
          val ordered = batch.toSeq.sortBy(e => (e._3, e._4))
            .map(e => LastEvent(e._2, e._3, e._4))
          if (ordered.isEmpty) Iterator.empty
          else {
            val chain = state.getOption.toSeq ++ ordered
            state.update(chain.last)
            chain.sliding(2).collect {
              case Seq(a, b) => Transition(a.event_type, b.event_type)
            }
          }
      }
  }

  case class RetentionState(cohortDay: String, seenOffsets: Seq[Long])
  case class RetentionCell(cohort_day: String, day_offset: Long)

  /** Arrival-time twin of the batch cohort-retention matrix
    * (AnalyticsOps.retention): per-user state is the cohort day plus the
    * set of day offsets already emitted — bounded by the user's distinct
    * ACTIVE DAYS (a few dozen), not their event count — and each
    * micro-batch appends only the newly-seen (cohort_day, day_offset)
    * cells, so `count(*)` over the emitted cells reproduces the batch
    * matrix exactly (StreamingSpec asserts it). The cohort day is fixed
    * by the user's first event under the replay-pacing in-order
    * contract; a later batch can only add offsets, never move the
    * cohort.
    */
  def retentionCells(events: DataFrame): Dataset[RetentionCell] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetentionState, RetentionCell](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        case (_, batch, state) =>
          val days = batch.map(_._2).toSeq.distinct.sorted
          if (days.isEmpty) Iterator.empty
          else {
            val st0 = state.getOption.getOrElse(
              RetentionState(days.head, Seq.empty))
            val cohort = java.time.LocalDate.parse(st0.cohortDay)
            val offsets = days.map(d =>
              java.time.temporal.ChronoUnit.DAYS.between(
                cohort, java.time.LocalDate.parse(d)))
            val fresh = offsets.filterNot(st0.seenOffsets.contains).distinct
            state.update(st0.copy(seenOffsets = st0.seenOffsets ++ fresh))
            fresh.iterator.map(RetentionCell(st0.cohortDay, _))
          }
      }
  }

  /** Update-mode stream of each user's current funnel stage; the latest
    * row per user is the live funnel membership.
    */
  def stages(events: DataFrame): Dataset[FunnelStage] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelStage](GroupStateTimeout.NoTimeout) {
        case (user, batch, state) =>
          val st0 = state.getOption.getOrElse(FunnelState(None, None, None))
          val next = batch.toSeq.sortBy(_.t).foldLeft(st0)(fold)
          state.update(next)
          FunnelStage(user, next.stage)
      }
  }
}
