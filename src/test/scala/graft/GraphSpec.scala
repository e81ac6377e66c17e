package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Temporal-adjacency edges + integer PageRank: a hand-built interaction
  * log pins the edge derivation (first-touch ordering, chain direction,
  * dedup) and the full three-iteration rank arithmetic against
  * hand-computed values, so a both-engines-wrong oracle replay cannot
  * pass silently.
  */
class GraphSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, Long, String)]) =
    rows.map { case (u, k, at) => (u, s"""{"k": $k}""", ts(at)) }
      .toDF("user_id", "props", "ts")

  test("edges: per-item first-touch chains, directed, deduplicated") {
    val e = eventsDf(Seq(
      // item 1: u1 (twice — first touch wins), then u2, then u3
      (1L, 1L, "2024-01-01 10:00:00"),
      (1L, 1L, "2024-01-01 12:00:00"),
      (2L, 1L, "2024-01-01 10:30:00"),
      (3L, 1L, "2024-01-01 11:00:00"),
      // item 2: u2 first, then u1 → the reverse edge of item 1's 1→2
      (2L, 2L, "2024-01-02 09:00:00"),
      (1L, 2L, "2024-01-02 10:00:00"),
      // item 3: repeats the 1→2 adjacency → must dedup
      (1L, 3L, "2024-01-03 08:00:00"),
      (2L, 3L, "2024-01-03 09:00:00")))
    val got = GraphOps.temporalEdges(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (2L, 3L), (2L, 1L)))
  }

  test("pagerank: three iterations match hand-computed integer ranks") {
    // Edges {1→2, 2→1, 2→3}: outdeg(1)=1, outdeg(2)=2, node 3 is a sink.
    val e = eventsDf(Seq(
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 11:00:00"),
      (3L, 1L, "2024-01-01 12:00:00"),
      (2L, 2L, "2024-01-02 09:00:00"),
      (1L, 2L, "2024-01-02 10:00:00")))
    val got = GraphOps.pagerank(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    // r1: u1=575000, u2=1000000, u3=575000
    // r2: u1=575000, u2=638750,  u3=575000
    // r3: u1=150000+271468=421468, u2=150000+488750=638750, u3=421468
    // order: rank DESC then user_id ASC (u1/u3 tie)
    assert(got === List((2L, 638750L), (1L, 421468L), (3L, 421468L)))
  }

  test("components: two disjoint interaction chains label separately") {
    // item 1 links u1→u2→u3; item 9 links u10→u11; no cross edges
    val e = eventsDf(Seq(
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 11:00:00"),
      (3L, 1L, "2024-01-01 12:00:00"),
      (10L, 9L, "2024-01-02 10:00:00"),
      (11L, 9L, "2024-01-02 11:00:00")))
    val labels = GraphOps.components(e)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(labels === Map(
      1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 3L -> ((1L, 3L)),
      10L -> ((10L, 2L)), 11L -> ((10L, 2L))))
  }

  test("registry wiring: pagerank runs on the smoke testbed") {
    val out = GraphOps.graphPagerank.run(spark, smokeDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length === 10)
    // ranks are emitted best-first with the deterministic tiebreak
    val ranks = out.map(_._2)
    assert(ranks === ranks.sorted(Ordering[Long].reverse))
  }

  test("triangles: hand-counted K4 plus a pendant node") {
    // K4 on {1,2,3,4} (4 triangles, every wedge closed) + pendant 5—1.
    // Degrees: 1→4, 2/3/4→3, 5→1; wedges = C(4,2) + 3·C(3,2) = 15;
    // gcc = 3·4·10⁶ div 15 = 800000.
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L)).toDF("u", "v")
    val got = GraphOps.triangleStats(und).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4)) === ((5L, 7L, 15L, 4L, 800000L)))
  }

  test("lcc: K4 members are perfect cliques, the pendant-edge hub is half") {
    // Same K4 + pendant 5—1 fixture. tri(1)=3 of C(4,2)=6 possible pairs
    // among its 4 neighbors → lcc 500000 ppm; tri(2/3/4)=3 of C(3,2)=3 →
    // 10⁶; node 5 (degree 1) is excluded. Ties break by user_id.
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 5L)).toDF("u", "v")
    val got = GraphOps.lccFromEdges(und).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toList
    assert(got === List(
      (2L, 3L, 3L, 1000000L), (3L, 3L, 3L, 1000000L),
      (4L, 3L, 3L, 1000000L), (1L, 3L, 4L, 500000L)))
  }

  test("lcc: degree-2 node with no closure ranks with lcc 0") {
    // path 1—2—3: node 2 has a wedge but no triangle → present at 0
    val und = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val got = GraphOps.lccFromEdges(und).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toList
    assert(got === List((2L, 0L)))
  }

  test("bfs: shortest path wins on a cycle, beyond-horizon nodes are absent") {
    // square 1-2-4-3-1 with a tail 4—5—6—7—8: hops(1)=0, 2/3=1, 4=2,
    // 5=3, 6=4; 7 and 8 are past BfsMaxHops=4 → absent
    val und = Seq(
      (1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L)).toDF("u", "v")
    val got = GraphOps.bfsFromEdges(und).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got === List(
      (1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 3L), (6L, 4L)))
  }

  test("bfs: disconnected component is never reached") {
    val und = Seq((1L, 2L), (5L, 6L)).toDF("u", "v")
    val got = GraphOps.bfsFromEdges(und).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got === List((1L, 0L), (2L, 1L)))
  }

  test("triangles: triangle-free graph reports zero with nonzero wedges") {
    // a star: wedges exist, no closures
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val got = GraphOps.triangleStats(und).collect().head
    assert((got.getLong(3), got.getLong(4)) === ((0L, 0L)))
    assert(got.getLong(2) === 3L) // C(3,2) wedges at the hub
  }

  test("co-occurrence edges: shared items pair users; hubs are BOUNDED, not dropped") {
    val cap = GraphOps.TriItemCap
    val hubUsers = (100L until 100L + cap + 1).toSeq
    val e = eventsDf(
      // item 1: three users → the full C(3,2) pair set
      Seq((1L, 1L, "2024-01-01 10:00:00"),
        (2L, 1L, "2024-01-01 11:00:00"),
        (3L, 1L, "2024-01-01 12:00:00")) ++
        // hub item 99: cap+1 users → the cap SMALLEST ids contribute
        // their full pair set; the (cap+1)-th user is excluded (the
        // old drop-the-hub form emptied the whole projection on dense
        // domains — the sf0.1 vacuous-bench lesson)
        hubUsers.map(u => (u, 99L, "2024-01-02 10:00:00")))
    val got = GraphOps.cooccurrenceEdges(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val keptHub = hubUsers.sorted.take(cap.toInt)
    val hubPairs = (for {
      a <- keptHub; b <- keptHub if a < b
    } yield (a, b)).toSet
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L)) ++ hubPairs)
    val overflow = 100L + cap
    assert(!got.exists(p => p._1 == overflow || p._2 == overflow),
      "the user past the cap must not appear in any pair")
  }

  test("registry wiring: triangle stats are internally consistent") {
    val got = GraphOps.graphTriangles.run(spark, smokeDir).collect().head
    val (nodes, edges, wedges, tri, gcc) =
      (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
        got.getLong(4))
    assert(nodes > 0 && edges > 0 && wedges > 0)
    // every triangle closes three wedges; the coefficient is the declared
    // integer formula
    assert(tri * 3 <= wedges)
    assert(gcc === tri * 3 * 1000000L / math.max(wedges, 1L))
  }

  test("sssp: min-plus beats the direct edge; horizon and islands hold") {
    // w = 1 + 64 div cnt: cnt 64 → w 2, cnt 32 → w 3, cnt 1 → w 65.
    // 1—2 (2), 2—3 (2), 1—3 (3), 3—4 (2), 1—4 (65): d(4) improves from
    // the 65-cost direct edge (round 1) to the 5-cost 1→3→4 path
    // (round 2) — the delta update. Tail 4—5—6—7 (w 2): 6 settles on the
    // cheap 4-edge path (cost 9) in the LAST round, while 7 at 4 edges is
    // stuck with the expensive 1→4→5→6→7 = 71 (its cheap path needs 5
    // edges — past the horizon, exactly the ≤-H-hops semantics).
    // Island 10—11: never reached, absent.
    val wund = Seq(
      (1L, 2L, 64L), (2L, 3L, 64L), (1L, 3L, 32L), (3L, 4L, 64L),
      (1L, 4L, 1L), (4L, 5L, 64L), (5L, 6L, 64L), (6L, 7L, 64L),
      (10L, 11L, 64L)).toDF("u", "v", "cnt")
    val got = GraphOps.ssspFromEdges(wund).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got === List(
      (1L, 0L), (2L, 2L), (3L, 3L), (4L, 5L), (5L, 7L), (6L, 9L),
      (7L, 71L)))
  }

  test("weighted co-occurrence: shared-item counts become edge weights") {
    val e = eventsDf(Seq(
      (1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 11:00:00"),
      (3L, 1L, "2024-01-01 12:00:00"),
      (1L, 2L, "2024-01-02 10:00:00"), (2L, 2L, "2024-01-02 11:00:00")))
    val got = GraphOps.weightedCoocEdges(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("registry wiring: components labels every interaction-graph user") {
    val labels = GraphOps.graphComponents.run(spark, smokeDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(labels.nonEmpty)
    // every rep is itself a labeled node carrying its own component size,
    // and csize actually counts the label's members
    val byRep = labels.groupBy(_._2)
    for ((rep, members) <- byRep) {
      assert(members.exists(_._1 == rep), s"rep $rep not in its component")
      assert(members.forall(_._3 == members.length.toLong), s"rep $rep csize")
    }
  }
}
