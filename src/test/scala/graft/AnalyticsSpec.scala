package graft

import java.sql.Timestamp

import graft.operators.{AnalyticsOps, EventOps}

/** funnel_stages / cohort_retention: hand-built event logs pin the ordered
  * semantics (a later-stage event BEFORE the earlier stage's first entry
  * does not convert) and the cohort arithmetic, so a both-engines-wrong
  * oracle mirror cannot pass silently.
  */
class AnalyticsSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def eventsDf(rows: Seq[(Long, String, String)]) =
    rows.map { case (u, t, at) => (u, t, ts(at)) }
      .toDF("user_id", "event_type", "ts")

  test("funnel: ordered conversion only — pre-view clicks do not count") {
    val e = eventsDf(Seq(
      // u1 converts fully in order
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // u2 clicked BEFORE their first view: stops at view
      (2L, "click", "2024-01-02 09:00:00"),
      (2L, "view", "2024-01-02 10:00:00"),
      // u3 views and clicks, purchase precedes the click: stops at click
      (3L, "view", "2024-01-03 08:00:00"),
      (3L, "purchase", "2024-01-03 08:30:00"),
      (3L, "click", "2024-01-03 09:00:00"),
      // u4 never views: contributes nowhere
      (4L, "click", "2024-01-04 12:00:00"),
      (4L, "purchase", "2024-01-04 13:00:00")))
    val got = AnalyticsOps.funnel(e)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("funnel: strict ordering — same-instant next stage does not convert") {
    val e = eventsDf(Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00")))
    val got = AnalyticsOps.funnel(e)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got === Map("view" -> 1L, "click" -> 0L, "purchase" -> 0L))
  }

  test("funnel: gate uses the EARLIEST earlier-stage entry") {
    // u1's second view precedes the click, but the FIRST view is the gate,
    // so the 09:00 click (after the 08:00 first view) converts.
    val e = eventsDf(Seq(
      (1L, "view", "2024-01-01 08:00:00"),
      (1L, "click", "2024-01-01 09:00:00"),
      (1L, "view", "2024-01-01 10:00:00")))
    val got = AnalyticsOps.funnel(e)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got("click") === 1L)
  }

  test("cohort retention: matrix counts and offsets") {
    val e = eventsDf(Seq(
      // u1 first active Jan 1, returns Jan 2 and Jan 4 (twice-in-a-day
      // collapses via the distinct)
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-02 11:00:00"),
      (1L, "view", "2024-01-04 09:00:00"),
      (1L, "view", "2024-01-04 21:00:00"),
      // u2 also cohort Jan 1, only day-0 active
      (2L, "view", "2024-01-01 23:59:59"),
      // u3 cohort Jan 2, returns Jan 3
      (3L, "view", "2024-01-02 00:00:00"),
      (3L, "view", "2024-01-03 00:00:00")))
    val got = AnalyticsOps.retention(e)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === Map(
      ("2024-01-01", 0L) -> 2L,
      ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 3L) -> 1L,
      ("2024-01-02", 0L) -> 1L,
      ("2024-01-02", 1L) -> 1L))
  }

  test("windowed funnel: a click after the window expires does not convert") {
    val e = eventsDf(Seq(
      // u1 clicks 1 day after the view: inside the 3-day window
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-02 10:00:00"),
      // u2 clicks 5 days after the view: expired
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-06 10:00:00"),
      // u3 clicks exactly AT the 3-day boundary: inclusive, converts
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "click", "2024-01-04 10:00:00")))
    val got = AnalyticsOps.funnelWindowed(e)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got === Map("view" -> 3L, "click" -> 2L, "purchase" -> 0L))
  }

  test("transition matrix: counts and probabilities from a hand log") {
    val e = Seq(
      // u1: view → click → view ; u2: view → view
      (1L, "view", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 10:05:00"), 2L),
      (1L, "view", ts("2024-01-01 10:10:00"), 3L),
      (2L, "view", ts("2024-01-02 09:00:00"), 4L),
      (2L, "view", ts("2024-01-02 09:30:00"), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = AnalyticsOps.transitions(e)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // from view: 1× click, 1× view (5000 each); from click: 1× view (10000)
    assert(got === Map(
      ("view", "click") -> ((1L, 5000L)),
      ("view", "view") -> ((1L, 5000L)),
      ("click", "view") -> ((1L, 10000L))))
  }

  test("transition ordering ties break on event_id deterministically") {
    val t0 = ts("2024-01-01 10:00:00")
    val e = Seq(
      (1L, "view", t0, 2L),
      (1L, "click", t0, 1L)) // same instant: event_id 1 comes first
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = AnalyticsOps.transitions(e)
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(got === List(("click", "view")))
  }

  test("anomaly burst: only >3σ-above-own-mean hours flag; flat and singleton users never do") {
    def at(day: Int, hour: Int, m: Int) =
      f"2024-01-$day%02d $hour%02d:$m%02d:00"
    val rows =
      // u1: ten 1-event hours + one 10-event hour.
      // n=11, s=20, q=110; x=10: (110−20)² = 8100 > 9·(1210−400) = 7290 ✓
      (0 until 10).map(h => (1L, "view", at(1, h, 0))) ++
        (0 until 10).map(m => (1L, "view", at(1, 12, m))) ++
        // u2: perfectly flat rate → zero variance, nothing flags
        (0 until 5).flatMap(h => Seq(
          (2L, "view", at(2, h, 0)), (2L, "view", at(2, h, 30)))) ++
        // u3: a single active hour → n=1 self-excludes
        Seq((3L, "view", at(3, 9, 0))) ++
        // u4: mild outlier below 3σ: hours [1,1,1,3] → 6² = 36 ≤ 9·12
        (0 until 3).map(h => (4L, "view", at(4, h, 0))) ++
        (0 until 3).map(m => (4L, "view", at(4, 6, m)))
    val got = AnalyticsOps.anomalyBurst(eventsDf(rows))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toList === List((1L, 10L)))
  }

  test("assoc lift: hand-computed staged-integer lift; never-co-occurring pairs are absent") {
    // baskets: {a,b}, {a,b}, {a}, {c} → N=4, n_a=3, n_b=2, n_c=1, n_ab=2
    // lift(a,b) = (2·10⁶ div 3)·4 div 2 = 1333332 (true 4/3, floor-staged)
    val e = eventsDf(Seq(
      (1L, "a", "2024-01-01 10:00:00"), (1L, "b", "2024-01-01 11:00:00"),
      (1L, "a", "2024-01-01 12:00:00"), // duplicate membership — distinct'd
      (2L, "a", "2024-01-01 10:00:00"), (2L, "b", "2024-01-01 10:30:00"),
      (3L, "a", "2024-01-01 09:00:00"),
      (4L, "c", "2024-01-01 08:00:00"),
      // user 1 again on ANOTHER day: a separate basket, a-only
      (1L, "a", "2024-01-02 10:00:00")))
    // the extra day-2 basket shifts N to 5 and n_a to 4:
    // lift(a,b) = (2·10⁶ div 4)·5 div 2 = 1250000
    val got = AnalyticsOps.assocLiftDaily(e)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(("a", "b") -> ((2L, 1250000L))))
  }

  test("scd2 snapshot: picks the version straddling the cutoff; ties supersede by event_id") {
    val rows = Seq(
      // u1: three versions; the 01-14 one is active at the cutoff
      (1L, 1L, "2024-01-10 00:00:00", 1.0),
      (1L, 2L, "2024-01-14 00:00:00", 2.0),
      (1L, 3L, "2024-01-20 00:00:00", 3.0),
      // u2: single open-ended version
      (2L, 4L, "2024-01-01 00:00:00", 5.0),
      // u3: born after the cutoff → no version
      (3L, 5L, "2024-01-16 00:00:00", 6.0),
      // u4: two writes at the SAME instant — higher event_id supersedes;
      // the superseded write's validity interval is EMPTY so it never
      // matches any cutoff
      (4L, 7L, "2024-01-12 10:00:00", 7.0),
      (4L, 8L, "2024-01-12 10:00:00", 8.0))
    val e = rows.map { case (u, id, at, v) => (u, id, ts(at), v) }
      .toDF("user_id", "event_id", "ts", "value")
    def ep(at: String): Long = ts(at).getTime / 1000
    val got = EventOps.scd2Snapshot(e)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((2.0, ep("2024-01-14 00:00:00"), ep("2024-01-20 00:00:00"))),
      2L -> ((5.0, ep("2024-01-01 00:00:00"), -1L)),
      4L -> ((8.0, ep("2024-01-12 10:00:00"), -1L))))
  }

  test("dau: returning users do not re-count as new; cumulative is first-touch") {
    // day 1: u1, u2 (both new).  day 2: u1 returns + u3 new → dau 2,
    // new 1, cum 3.  day 3: only returning users → new 0, cum stays 3.
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-01 12:00:00")), // same-day repeat: dau counts once
      (1L, ts("2024-01-02 09:00:00")), (3L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-03 08:00:00")), (3L, ts("2024-01-03 09:00:00")))
      .toDF("user_id", "ts")
    def ep(d: String): Long = ts(d + " 00:00:00").getTime / 1000
    val got = AnalyticsOps.dauCumulative(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toList
    assert(got === List(
      (ep("2024-01-01"), 2L, 2L, 2L),
      (ep("2024-01-02"), 2L, 1L, 3L),
      (ep("2024-01-03"), 2L, 0L, 3L)))
  }

  test("ohlc: open/close follow event_id order, not row order") {
    // rows arrive shuffled; event_id 1 holds the open, 4 the close
    val e = Seq(
      (3L, ts("2024-01-01 12:00:00"), "click", 30.0),
      (1L, ts("2024-01-01 09:00:00"), "click", 10.5),
      (4L, ts("2024-01-01 16:00:00"), "click", 20.0),
      (2L, ts("2024-01-01 10:00:00"), "click", 45.25),
      (5L, ts("2024-01-02 09:00:00"), "click", 7.0))
      .toDF("event_id", "ts", "event_type", "value")
    val got = AnalyticsOps.ohlcDaily(e).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1).toList
    def ep(d: String): Long = ts(d).getTime / 1000
    assert(got === List(
      (ep("2024-01-01 00:00:00"), 10.5, 45.25, 10.5, 20.0, 4L, 10575L),
      (ep("2024-01-02 00:00:00"), 7.0, 7.0, 7.0, 7.0, 1L, 700L)))
  }

  test("trend moments: hand-computed sufficient statistics") {
    // click: (x=0, y=100), (x=1, y=300) → n=2, Σx=1, Σy=400, Σxy=300,
    // Σx²=1; num = 2·300 − 1·400 = 200 (slope 2.00/day), den = 2·1 − 1 = 1
    val e = Seq(
      (ts("1970-01-01 08:00:00"), "click", 1.0),
      (ts("1970-01-02 20:00:00"), "click", 3.0))
      .toDF("ts", "event_type", "value")
    val got = AnalyticsOps.trendMoments(e).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toList
    assert(got === List(("click", 2L, 1L, 400L, 200L, 1L)))
  }

  test("cdc diff: added and changed emit, unchanged drops, ties supersede") {
    val rows = Seq(
      // u1 changes between the cutoffs (T1 = Jan 1 noon, T2 = Jan 20)
      (1L, 1L, "2024-01-01 08:00:00", 1.0),
      (1L, 2L, "2024-01-15 00:00:00", 2.0),
      // u2 exists only after T1 → added
      (2L, 3L, "2024-01-12 00:00:00", 5.0),
      // u3 unchanged (writes only before T1) → absent
      (3L, 4L, "2024-01-01 07:00:00", 7.0),
      // u4 same-instant rewrite before T1: higher event_id wins both
      // snapshots → unchanged → absent
      (4L, 5L, "2024-01-01 09:00:00", 8.0),
      (4L, 6L, "2024-01-01 09:00:00", 9.0),
      // u5 rewritten to the SAME value → unchanged → absent
      (5L, 7L, "2024-01-01 08:00:00", 3.0),
      (5L, 8L, "2024-01-15 00:00:00", 3.0))
    val e = rows.map { case (u, id, at, v) => (u, id, ts(at), v) }
      .toDF("user_id", "event_id", "ts", "value")
    val got = EventOps.cdcSnapshotDiff(e).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2), r.getDouble(3))).toSet
    assert(got === Set(
      (1L, "changed", 1.0, 2.0),
      (2L, "added", -1.0, 5.0)))
  }

  test("stickiness: dau over the month's distinct users, ppm truncated") {
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 09:00:00")),
      (3L, ts("2024-01-20 10:00:00")),
      (1L, ts("2024-02-01 10:00:00"))) // second month: mau resets
      .toDF("user_id", "ts")
    def ep(d: String): Long = ts(d + " 00:00:00").getTime / 1000
    val got = AnalyticsOps.stickiness(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toList
    assert(got === List(
      (ep("2024-01-01"), 2L, 3L, 666666L),
      (ep("2024-01-02"), 1L, 3L, 333333L),
      (ep("2024-01-20"), 1L, 3L, 333333L),
      (ep("2024-02-01"), 1L, 1L, 1000000L)))
  }

  test("churn ledger: gap days lose no churn; last day right-censored") {
    // d1: {u1,u2}  d2: {u1,u3}  d3: {u2,u3}  d4: ∅ (gap)  d5: {u1}
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 09:00:00")), (3L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-03 08:00:00")), (3L, ts("2024-01-03 09:00:00")),
      (1L, ts("2024-01-05 12:00:00")))
      .toDF("user_id", "ts")
    def ep(d: String): Long = ts(d + " 00:00:00").getTime / 1000
    val got = AnalyticsOps.churnAccounting(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1).toList
    assert(got === List(
      // (day, dau, retained, inflow, churned_next)
      (ep("2024-01-01"), 2L, 0L, 2L, 1L), // u2 not seen on d2
      (ep("2024-01-02"), 2L, 1L, 1L, 1L), // u1 retained in, u1 absent d3
      (ep("2024-01-03"), 2L, 1L, 1L, 2L), // nobody survives into the d4 gap
      (ep("2024-01-05"), 1L, 0L, 1L, 1L))) // resurrected u1; horizon-censored
  }

  test("tombstone compaction: a trailing tombstone erases the key") {
    val rows = Seq(
      // u1: write then tombstone → absent
      (1L, 1L, "2024-01-01 10:00:00", "purchase", 1.0),
      (1L, 2L, "2024-01-02 10:00:00", "error", 0.0),
      // u2: tombstone then write → present with the later value
      (2L, 3L, "2024-01-01 10:00:00", "error", 0.0),
      (2L, 4L, "2024-01-02 10:00:00", "view", 5.0),
      // u3: same-instant write+tombstone — higher event_id (tombstone)
      // wins → absent
      (3L, 5L, "2024-01-03 10:00:00", "view", 7.0),
      (3L, 6L, "2024-01-03 10:00:00", "error", 0.0))
    val e = rows.map { case (u, id, at, t, v) => (u, id, ts(at), t, v) }
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = EventOps.tombstoneCompaction(e).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((2L, 5.0)))
  }

  test("gapfill: missing hours appear with cnt 0 and carry the last value forward") {
    import spark.implicits._
    // series a: events in hours H, H+1, H+3 (H+2 is the gap); hour H+1
    // has two events — the later (ts, event_id) one must be carried
    val rows = Seq(
      (1L, ts("2024-01-01 10:05:00"), "a", 1.00),
      (2L, ts("2024-01-01 11:10:00"), "a", 2.00),
      (3L, ts("2024-01-01 11:20:00"), "a", 3.00), // last of hour H+1
      (4L, ts("2024-01-01 13:40:00"), "a", 4.00))
      .toDF("event_id", "ts", "event_type", "value")
    val got = AnalyticsOps.timeseriesGapfill(rows).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    val h = got.head._1
    assert(got.map { case (hr, c, v) => (hr - h, c, v) }.toSeq === Seq(
      (0L, 1L, 100L),  // hour H: value 1.00
      (1L, 2L, 300L),  // hour H+1: TWO events, later one (3.00) wins
      (2L, 0L, 300L),  // the gap: cnt 0, forward-filled
      (3L, 1L, 400L)))
  }

  test("registry wiring: all queries run on the smoke testbed") {
    for (q <- AnalyticsOps.queries) {
      val out = q.run(spark, smokeDir)
      assert(out.count() > 0, q.name)
    }
  }
}
