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

  val queries: Seq[GQuery] = Seq(replayFinalState)
}
