package graft

import graft.game.{GameEvent, GameFold, GameLog, RoomSummary}

/** ST1 correctness: golden scenario, reference-guard semantics, and the
  * distributed-plumbing invariants SURVEY §7.4 requires asserting (the
  * repartition+sortWithinPartitions+mapPartitions contract).
  */
class GameFoldSpec extends SparkSuite {

  private def ev(
      seq: Long, tpe: String, room: String = "r1", name: String = "",
      bomb: String = "", comment: String = "", x: Int = 0, y: Int = 0,
      list: Seq[Int] = Nil): GameEvent =
    GameEvent(room, seq, tpe, name, bomb, comment, x, y, alive = true, list)

  // obstacle codes use the +1-shifted sign encoding: cell(2,1)=32 → 33
  // indestructible; cell(5,5)=155 → -156 destructible
  private val mapCodes = Seq(33, -156)

  private val kill = Seq(
    ev(1, "UserJoinEvent", name = "A", x = 1, y = 1),
    ev(2, "UserJoinEvent", name = "B", x = 3, y = 1),
    ev(3, "UpdateMapEvent", list = mapCodes),
    ev(4, "UserMoveEvent", name = "A", x = 2, y = 1), // into obstacle: no-op
    ev(5, "SetBombEvent", bomb = "A-b1", x = 2, y = 2),
    ev(6, "ExplodeEvent", bomb = "A-b1"),
    ev(7, "UserDeadEvent", name = "B", comment = "A"))

  test("golden two-player-kill scenario") {
    val Seq(s) = GameFold.foldLocal(kill)
    // flames: center(2,2) + right 6 + left 2 (border) + down 6 + up 0
    // (blocked at d=1 by indestructible (2,1)) = 15
    assert(s === RoomSummary("r1", 7, 2, 1, 0, 15, 1, 1, 7))
  }

  test("undo-explode is keyed by position and clears recomputed flames") {
    val Seq(s) = GameFold.foldLocal(
      kill :+ ev(8, "UndoExplodeEvent", x = 2, y = 2))
    assert(s.n_flames === 0)
    assert(s.n_destructible === 1 && s.n_indestructible === 1)
    // undo at the WRONG position is a no-op (reference deletes
    // explodingBombs[pos], event.go:184)
    val Seq(s2) = GameFold.foldLocal(
      kill :+ ev(8, "UndoExplodeEvent", x = 9, y = 9))
    assert(s2.n_flames === 15)
  }

  test("destructible is destroyed and the ray CONTINUES through it") {
    // reference destroy pass (event.go:141-151) deletes destructibles and
    // keeps walking; only indestructibles stop the ray. Bomb at (7,5),
    // destructible at (5,5): left ray reaches the full 6 cells.
    val evs = Seq(
      ev(1, "UpdateMapEvent", list = mapCodes),
      ev(2, "SetBombEvent", bomb = "X-b1", x = 7, y = 5),
      ev(3, "ExplodeEvent", bomb = "X-b1"))
    val Seq(s) = GameFold.foldLocal(evs)
    assert(s.n_destructible === 0, "destructible at (5,5) must be destroyed")
    // flames: center + left 6 + right 6 + up 5 (border) + down 6 = 24
    assert(s.n_flames === 24)
  }

  test("out-of-grid bomb still destroys in-grid cells via its rays") {
    // SetBomb at x==30 stores without indexing the grid (store-only
    // branch); the reference runs the destroy pass UNGUARDED on explode
    // (event.go:141-151), so the left ray from (30,5) walks in-grid cells
    // x=29..24 and destroys the destructible at (26,5) (cell 176 → code
    // -177). All other rays die immediately: their first cell (30,4),
    // (30,5), (31,5) is out of grid. Flames = the 6 left-ray cells.
    val evs = Seq(
      ev(1, "UpdateMapEvent", list = Seq(-177)),
      ev(2, "SetBombEvent", bomb = "X-b1", x = 30, y = 5),
      ev(3, "ExplodeEvent", bomb = "X-b1"))
    val Seq(s) = GameFold.foldLocal(evs)
    assert(s.n_destructible === 0,
      "destructible at (26,5) must be destroyed by the out-of-grid bomb's left ray")
    assert(s.n_flames === 6)
  }

  test("guard gauntlet: reference guards and upserts") {
    val base = Seq(
      ev(1, "UserJoinEvent", name = "A", x = 1, y = 1),
      ev(2, "UpdateMapEvent", list = Seq(33)))
    val gauntlet = Seq(
      ev(3, "UserMoveEvent", name = "A", x = 30, y = 1), // out of bounds
      ev(4, "UserMoveEvent", name = "A", x = 2, y = 1), // onto obstacle
      ev(5, "UserMoveEvent", name = "ghost", x = 5, y = 5), // CREATES ghost (ref upsert)
      ev(6, "SetBombEvent", bomb = "A-b1", x = 2, y = 1), // bomb on obstacle
      ev(7, "ExplodeEvent", bomb = "no-such-bomb"), // dangling explode
      ev(8, "BombMoveEvent", bomb = "no-such-bomb", x = 4, y = 4), // dangling
      ev(9, "UserDeadEvent", name = "A"),
      ev(10, "UserMoveEvent", name = "A", x = 3, y = 3)) // dead can't move
    val Seq(s) = GameFold.foldLocal(base ++ gauntlet)
    // A (dead) + ghost (created by the move upsert, event.go:45-46)
    assert(s.n_players === 2 && s.n_alive === 1)
    assert(s.n_bombs === 0 && s.n_flames === 0)
    assert(s.n_indestructible === 1)
  }

  test("out-of-grid obstacle codes are kept, counted, and block bombs") {
    // genObstacleMapFromList has NO bounds check (event.go:227-251): code
    // 752 → +1-shifted cell 751 = (1, 25), below the grid, stays in the
    // reference's obstacleMap — and SetBomb's only guard is the map
    // lookup (event.go:92-95), so a bomb at (1, 25) is blocked
    val st = new GameFold.RoomState("r")
    st.apply(ev(1, "UpdateMapEvent", list = Seq(752, -755)))
    assert(st.summary.n_indestructible === 1)
    assert(st.summary.n_destructible === 1)
    assert(st.obstacles((1, 25)) === false) // indestructible
    assert(st.obstacles((4, 25)) === true)  // destructible
    st.apply(ev(2, "SetBombEvent", bomb = "b1", x = 1, y = 25)) // blocked
    st.apply(ev(3, "SetBombEvent", bomb = "b2", x = 2, y = 25)) // clear cell
    assert(st.summary.n_bombs === 1)
  }

  test("join stores the wire alive flag verbatim (reference playerInfo)") {
    // the reference stores msg.Alive untouched on join (pulsar.go:383-397,
    // event.go:79) — a replayed join with alive=false is a dead player
    val st = new GameFold.RoomState("r")
    st.apply(GameEvent("r", 1, "UserJoinEvent", "A", "", "", 1, 1,
      alive = false, Nil))
    assert(st.players("A") === GameFold.Player(1, 1, alive = false))
    st.apply(GameEvent("r", 2, "UserJoinEvent", "A", "", "", 2, 2,
      alive = true, Nil))
    assert(st.players("A") === GameFold.Player(2, 2, alive = true))
  }

  test("dead player stays put (position-level guard check)") {
    val st = new GameFold.RoomState("r")
    st.apply(ev(1, "UserJoinEvent", name = "A", x = 1, y = 1))
    st.apply(ev(2, "UserDeadEvent", name = "A"))
    st.apply(ev(3, "UserMoveEvent", name = "A", x = 3, y = 3))
    assert(st.players("A") === GameFold.Player(1, 1, alive = false))
    st.apply(ev(4, "UserReviveEvent", name = "A", x = 4, y = 4))
    assert(st.players("A") === GameFold.Player(4, 4, alive = true))
  }

  test("duplicate SetBomb overwrites (reference setBombWithTrigger)") {
    val st = new GameFold.RoomState("r")
    st.apply(ev(1, "SetBombEvent", bomb = "A-b1", x = 2, y = 2))
    st.apply(ev(2, "SetBombEvent", bomb = "A-b1", x = 9, y = 9))
    assert(st.bombs("A-b1") === ((9, 9)))
    // the reference leaves the old posToBombs entry stale — mirrored
    assert(st.posToBombs.contains((2, 2)) && st.posToBombs.contains((9, 9)))
  }

  test("distributed fold == local reference fold on the derived log") {
    import spark.implicits._
    val log = GameLog.derive(spark, smokeDir)
    val distributed = GameFold.summarize(log).collect().sortBy(_.room)
    val local = GameFold.foldLocal(log.collect().toSeq)
    assert(distributed.toSeq === local)
  }

  test("fold is invariant to partitioning") {
    import spark.implicits._
    val log = GameLog.derive(spark, smokeDir)
    val a = GameFold.summarize(log).collect().sortBy(_.room).toSeq
    val b = GameFold.summarize(log.repartition(7)).collect().sortBy(_.room).toSeq
    val c = GameFold.summarize(log.repartition(1)).collect().sortBy(_.room).toSeq
    assert(a === b)
    assert(a === c)
  }

  test("multi-room interleave: rooms fold independently") {
    val r1 = kill
    val r2 = kill.map(e => e.copy(room = "r2", seq = e.seq + 100))
    // interleave the two rooms' events in shuffled global order
    val interleaved = (r1 ++ r2).sortBy(e => (e.seq % 3, e.seq))
    val folded = GameFold.foldLocal(interleaved)
    assert(folded.map(_.copy(room = "x", last_seq = 0)).distinct.size === 1,
      "per-room summaries must be identical regardless of interleave")
  }
}
