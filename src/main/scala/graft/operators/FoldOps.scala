package graft.operators

import graft.GQuery
import graft.game.{GameFold, GameLog}

/** ST1 registry entries. The fold is order-sensitive and therefore not
  * SQL-expressible — no DuckDB oracle (driver records a rows-only check);
  * correctness is carried by GameFoldSpec: a hand-computed golden scenario,
  * guard-gauntlet no-ops, local-vs-distributed cross-check, and partitioning
  * invariance.
  */
object FoldOps {

  /** Q:replay_final_state — fold the derived multi-room event log to its
    * per-room final-state digest (SURVEY §2.7 ST1; replay semantics
    * watch.go:43-85).
    */
  val replayFinalState = GQuery(
    "replay_final_state",
    (s, d) => GameFold.summarize(GameLog.derive(s, d)).toDF(),
    oracle = None,
    bench = true)

  /** Q:replay_alive_status — a projection of the ACTUAL fold output that IS
    * SQL-reconstructible: final alive status per player, restricted to
    * players with at least one UNCONDITIONAL creation event (join or
    * revive — reference upserts both, event.go:63-66/75-77). For that
    * cohort, alive = (last join/dead/revive event ≠ dead): a dead event
    * that is last necessarily follows some join/revive, so the player
    * existed and the flip applied; move-created players are excluded
    * because their existence depends on non-SQL-expressible guards.
    */
  val replayAliveStatus = GQuery(
    "replay_alive_status",
    (s, d) => {
      import org.apache.spark.sql.functions._
      // one materialized derivation feeds both DAG branches (fold + cohort);
      // Materialize.stage picks localCheckpoint or a reliable checkpoint
      // dir from spark.graft.checkpoint.dir (the 100 TB posture)
      val log = graft.Materialize.stage(GameLog.derive(s, d))
      val states = GameFold.playerStates(log).toDF()
      val creators = log.toDF()
        .filter(col("event_type").isin("UserJoinEvent", "UserReviveEvent"))
        .select("room", "name").distinct()
      states
        .join(creators, Seq("room", "name"), "left_semi")
        .select("room", "name", "alive")
    },
    oracle = Some(
      """WITH ev AS (
        |  SELECT user_id, event_id AS seq,
        |         CASE WHEN event_type = 'signup' THEN 'join'
        |              WHEN event_type = 'error'
        |                   AND CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 4 = 0
        |                THEN 'revive'
        |              ELSE 'dead' END AS act
        |  FROM events WHERE event_type IN ('signup', 'error')),
        |cohort AS (
        |  SELECT DISTINCT user_id FROM ev WHERE act IN ('join', 'revive')),
        |last AS (
        |  SELECT e.user_id, max_by(e.act, e.seq) AS last_act
        |  FROM ev e JOIN cohort c ON e.user_id = c.user_id
        |  GROUP BY e.user_id)
        |SELECT 'room' || CAST(user_id % 8 AS VARCHAR) AS room,
        |       'u' || CAST(user_id AS VARCHAR) AS name,
        |       (last_act <> 'dead') AS alive
        |FROM last""".stripMargin))

  val queries: Seq[GQuery] = Seq(replayFinalState, replayAliveStatus)
}
