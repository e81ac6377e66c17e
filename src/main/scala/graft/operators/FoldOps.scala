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
    * SQL-reconstructible: final alive status per player. The oracle
    * replays the join/dead/revive semantics relationally (a player exists
    * after their first join; alive = last join/dead/revive event at or
    * after it), so the fold's ordering and liveness handlers are
    * hash-checked by DuckDB, not just row-counted.
    */
  val replayAliveStatus = GQuery(
    "replay_alive_status",
    (s, d) =>
      GameFold.playerStates(GameLog.derive(s, d)).toDF()
        .select("room", "name", "alive"),
    oracle = Some(
      """WITH ev AS (
        |  SELECT user_id, event_id AS seq,
        |         CASE WHEN event_type = 'signup' THEN 'join'
        |              WHEN event_type = 'error'
        |                   AND CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 4 = 0
        |                THEN 'revive'
        |              ELSE 'dead' END AS act
        |  FROM events WHERE event_type IN ('signup', 'error')),
        |j AS (
        |  SELECT user_id, min(seq) FILTER (act = 'join') AS fj
        |  FROM ev GROUP BY user_id),
        |last AS (
        |  SELECT e.user_id, max_by(e.act, e.seq) AS last_act
        |  FROM ev e JOIN j ON e.user_id = j.user_id
        |  WHERE j.fj IS NOT NULL AND e.seq >= j.fj
        |  GROUP BY e.user_id)
        |SELECT 'room' || CAST(user_id % 8 AS VARCHAR) AS room,
        |       'u' || CAST(user_id AS VARCHAR) AS name,
        |       (last_act <> 'dead') AS alive
        |FROM last""".stripMargin))

  val queries: Seq[GQuery] = Seq(replayFinalState, replayAliveStatus)
}
