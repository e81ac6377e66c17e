package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the `events` stream table: the staged
  * conversion funnel and the cohort-retention matrix — the two classic
  * product-analytics readouts of any event log (the reference's scoreboard
  * is the per-key aggregate member of the same family,
  * function-code/src/main/java/.../ScoreboardFunction.java:77-101).
  *
  * Scale posture (100 TB of events): every stage is keyed on `user_id` —
  * per-user aggregates are map-side combinable, and each stage join puts
  * the aggregate side on the partitioning its own groupBy already
  * produced, so EnsureRequirements inserts no extra exchange for it. No
  * window over an unbounded partition, no driver-side state. Per-user
  * skew (a bot firing millions of events): AQE's skew split does NOT
  * engage on these joins — they are aggregate-fed, the exact shape
  * AqeSkewSpec's discovery case pins as unsplittable — so a mega-user's
  * events land on one reducer, bounded by that user's own log size: the
  * same per-log sequential assumption as the room windows (PLANS.md
  * header). That bound is inherent to the semantics (every event must
  * meet its user's gate time); a pipeline expecting adversarial bots
  * rate-caps them upstream (`EventStream.admitLossy` is that operator).
  */
object AnalyticsOps {

  /** Funnel stage definitions: ordered (index, name, event_type). The
    * strict `ts` ordering between stages means a user converts only if the
    * later-stage event happens AFTER their earliest earlier-stage event —
    * the standard ordered-funnel semantics (not "did both ever happen").
    */
  final val FunnelStages: Seq[(Int, String)] =
    Seq(1 -> "view", 2 -> "click", 3 -> "purchase")

  /** Per-user earliest stage-entry times, one DataFrame per stage.
    * Stage k+1 joins stage k's (user_id, t_k) co-keyed and keeps only
    * events strictly after t_k, so each frame's rows are exactly the users
    * who reached that stage in order.
    */
  def stageTimes(events: DataFrame,
                 windowDays: Option[Int] = None): Seq[DataFrame] = {
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    FunnelStages.foldLeft(Vector.empty[DataFrame]) { case (acc, (_, etype)) =>
      val entered = e.filter(col("event_type") === etype)
      val gated = acc.lastOption match {
        case None => entered
        case Some(prev) =>
          val ordered = entered
            .join(prev.select(col("user_id"), col("t").as("t_prev")), "user_id")
            .filter(col("ts") > col("t_prev"))
          // the windowed funnel is the SAME fold with one extra gate
          // predicate — parameterized here so the two funnels cannot
          // drift (stage order, tie-breaking, and the min-entry
          // aggregate have exactly one implementation)
          windowDays.fold(ordered)(days =>
            ordered.filter(col("ts") <= col("t_prev") + expr(s"INTERVAL $days DAYS")))
      }
      acc :+ gated.groupBy("user_id").agg(min("ts").as("t"))
    }
  }

  /** Per-stage user counts over any [[stageTimes]] result. r20 (guide
    * §2.3, the dq_referential tagged-aggregate pattern): the three 1-row
    * final aggregates + union (three scheduled aggregate jobs) fold into
    * ONE tagged, map-side-combinable aggregate over the stage-tagged
    * union — ≤3 partial rows per task cross the tag shuffle at any scale.
    * A stage that no user reached still reports (the r19 objection that
    * kept the three-count shape): the 3-row stage dimension is built
    * driver-side from [[FunnelStages]] (schema constants, not data) and
    * left-joined against the counts, coalescing to 0 — one broadcast of
    * three literal rows, no extra pass. */
  private def stageCounts(stages: Seq[DataFrame]): DataFrame = {
    val spark = stages.head.sparkSession
    val tagged = stages.zipWithIndex.map { case (df, i) =>
      df.select(lit(FunnelStages(i)._1).as("stage_idx"))
    }.reduce(_ union _)
    val counts = tagged.groupBy("stage_idx").agg(count(lit(1)).as("n"))
    val dim = spark.createDataFrame(FunnelStages).toDF("stage_idx", "stage")
    dim.join(counts, Seq("stage_idx"), "left")
      .select(col("stage_idx"), col("stage"),
        coalesce(col("n"), lit(0L)).as("n_users"))
  }

  /** Ordered-funnel conversion counts: one row per stage with the number
    * of users who reached it (view → click after their first view →
    * purchase after that click).
    */
  def funnel(events: DataFrame): DataFrame = stageCounts(stageTimes(events))

  val funnelStages = GQuery(
    "funnel_stages",
    (s, d) => funnel(Tables.events(s, d)),
    oracle = Some(
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT 2, 'click', count(*) FROM c
        |UNION ALL SELECT 3, 'purchase', count(*) FROM p""".stripMargin),
    bench = true)

  /** Cohort-retention matrix: users bucketed by first-active DATE, then
    * for each (cohort_day, day_offset) the number of cohort members active
    * that day. After the (user, day) distinct, each user contributes at
    * most one row per day and `day = cohort_day + day_offset`, so the
    * final count is a plain `count(*)` — no count-distinct expansion.
    * The cohort day is emitted as an ISO string: a cross-engine-stable
    * representation (DATE round-trips through the two engines' result
    * readers with different in-memory types).
    */
  def retention(events: DataFrame): DataFrame = {
    val active = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val first = active.groupBy("user_id").agg(min("day").as("cohort_day"))
    active.join(first, "user_id")
      .select(
        col("cohort_day").cast("string").as("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  val cohortRetention = GQuery(
    "cohort_retention",
    (s, d) => retention(Tables.events(s, d)),
    oracle = Some(
      """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
        |       CAST(datediff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
        |       count(*) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin),
    bench = true)

  /** Conversion window for [[funnelWindowed]]: a later-stage event
    * converts only within this many days of the gating stage's entry —
    * mid-range against the testbed's 30-day span so both converting and
    * expiring users exist. */
  final val FunnelWindowDays = 3

  /** The windowed ordered funnel: stage k+1 must land STRICTLY after the
    * stage-k entry AND within [[FunnelWindowDays]] — "clicked within 3
    * days of the first view". Same per-stage min-aggregate/co-keyed-join
    * shape (and scale posture) as [[funnel]]; only the gate predicate
    * widens, so the two funnels are directly comparable.
    */
  def funnelWindowed(events: DataFrame): DataFrame =
    stageCounts(stageTimes(events, Some(FunnelWindowDays)))

  val funnelWindowedQ = GQuery(
    "funnel_windowed",
    (s, d) => funnelWindowed(Tables.events(s, d)),
    oracle = Some(
      s"""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1
        |        AND e.ts <= v.t1 + INTERVAL $FunnelWindowDays DAY
        |      GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |        AND e.ts <= c.t2 + INTERVAL $FunnelWindowDays DAY
        |      GROUP BY 1)
        |SELECT 1 AS stage_idx, 'view' AS stage, count(*) AS n_users FROM v
        |UNION ALL SELECT 2, 'click', count(*) FROM c
        |UNION ALL SELECT 3, 'purchase', count(*) FROM p""".stripMargin),
    bench = true)

  /** Event-path analysis: the first-order Markov transition matrix of
    * per-user event sequences — counts and scaled-integer probabilities
    * for every (prev_type → next_type) step, the "what do users do next"
    * readout that generalizes the funnel's fixed stage order.
    *
    * Scale shape: ONE user-keyed shuffle for the sequence window (each
    * partition bounded by a user's own activity; a bot's mega-sequence is
    * the same per-log assumption as the room windows, PLANS.md header),
    * then a (prev, next) aggregate whose cardinality is the TYPE
    * cross-product — schema-bounded, so the row-count total per prev_type
    * rides a trivial window over that tiny frame. Ordering ties broken by
    * event_id, so the matrix is deterministic.
    */
  def transitions(events: DataFrame): DataFrame = {
    val seqW = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tr = events
      // an un-timestamped event has no sequence position (and its spot
      // under ORDER BY ts is engine-defined: Spark NULLS FIRST, DuckDB
      // NULLS LAST — it would rewrite its neighbors' transitions)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead("event_type", 1).over(seqW))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    tr.withColumn("tot",
        sum("n_trans").over(Window.partitionBy("prev_type")))
      .select(col("prev_type"), col("next_type"), col("n_trans"),
        expr("n_trans * 10000 div tot").as("p_e4"))
  }

  val eventTransitions = GQuery(
    "event_transitions",
    (s, d) => transitions(Tables.events(s, d)),
    oracle = Some(
      """WITH tr AS (SELECT event_type AS prev_type,
        |                  lead(event_type) OVER (PARTITION BY user_id
        |                                         ORDER BY ts, event_id) AS next_type
        |           FROM events WHERE ts IS NOT NULL),
        |c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n_trans
        |      FROM tr WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n_trans) AS BIGINT) AS tot
        |      FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, c.n_trans,
        |       c.n_trans * 10000 // t.tot AS p_e4
        |-- null-safe join: a NULL prev_type is a real matrix row (the
        |-- engine window PARTITION BY groups NULLs); plain = drops it
        |FROM c JOIN t ON c.prev_type IS NOT DISTINCT FROM t.prev_type""".stripMargin),
    bench = true)

  /** Q:anomaly_burst — per-user activity-burst detection: hour buckets
    * whose event count sits more than 3 standard deviations ABOVE that
    * user's own mean hourly rate (over their active hours). The z-test is
    * done in ALL-INTEGER algebra — z > 3 with x̄ = s/n and σ² = q/n −
    * (s/n)² is equivalent to
    *   n·x − s > 0  AND  (n·x − s)² > 9·(n·q − s²)
    * (multiply through by n²) — so there is no floating-point mean or
    * stddev anywhere and the flagged set hash-matches exactly. n = 1
    * self-excludes (n·x = s). Scale shape: one map-side-combinable
    * (user, hour) count, then the per-user moment sums ride a window over
    * the COUNT frame (≤ 720 rows per user-month, never raw events), same
    * two-shuffle posture as the funnel family. Overflow bound: the
    * squares stay under 2⁶³ while a user's per-hour count × their hour
    * count stays under ~3·10⁹ — beyond any real per-user log; a global
    * (not per-user) variant would widen to DECIMAL first.
    */
  def anomalyBurst(events: DataFrame): DataFrame = {
    val hourly = events
      .select(col("user_id"),
        expr(ExactSql.HourSpark).as("hr"))
      .groupBy("user_id", "hr")
      .agg(count(lit(1)).as("cnt"))
    val byUser = Window.partitionBy("user_id")
    hourly
      .withColumn("n", count(lit(1)).over(byUser))
      .withColumn("s", sum("cnt").over(byUser))
      .withColumn("q", sum(expr("cnt * cnt")).over(byUser))
      .filter(expr(
        "n * cnt - s > 0 AND " +
          "(n * cnt - s) * (n * cnt - s) > 9 * (n * q - s * s)"))
      .select(col("user_id"), col("hr"), col("cnt"))
  }

  val anomalyBurstQ = GQuery(
    "anomaly_burst",
    (s, d) => anomalyBurst(Tables.events(s, d)),
    oracle = Some(
      s"""WITH h AS (SELECT user_id,
        |                 ${ExactSql.HourDuck} AS hr,
        |                 CAST(count(*) AS BIGINT) AS cnt
        |          FROM events GROUP BY 1, 2),
        |st AS (SELECT user_id, hr, cnt,
        |              CAST(count(*) OVER w AS BIGINT) AS n,
        |              CAST(sum(cnt) OVER w AS BIGINT) AS s,
        |              CAST(sum(cnt * cnt) OVER w AS BIGINT) AS q
        |       FROM h WINDOW w AS (PARTITION BY user_id))
        |SELECT user_id, hr, cnt
        |FROM st
        |WHERE n * cnt - s > 0
        |  AND (n * cnt - s) * (n * cnt - s) > 9 * (n * q - s * s)""".stripMargin),
    bench = true)

  /** Q:assoc_lift_daily — market-basket association between event types
    * over (user, day) baskets: lift(A,B) = P(A∧B) / (P(A)·P(B)), the
    * exact-set complement of `sketch_kmv_jaccard`'s sketch estimates
    * (daily baskets rather than all-time presence, so the testbed's
    * everyone-does-everything degeneracy disappears). Scale shape: the
    * basket distinct is ONE map-side-combinable shuffle; the pair
    * self-join is co-keyed on basket, bounded per basket by the type
    * VOCABULARY (not basket size — the distinct ran first), so Σ|types|²
    * per basket can never go quadratic in the corpus; per-type counts
    * broadcast (vocabulary-sized). Lift is emitted as a staged integer
    * floor division (n_ab·10⁶ div n_a, then ·N div n_b) — each stage
    * keeps every intermediate below n_baskets·10⁶, so there is no
    * overflow at any corpus size; the staging's floor error is < 1 ppm
    * of a confidence step and both engines replay it verbatim.
    */
  def assocLiftDaily(events: DataFrame): DataFrame = {
    // The basket frame feeds FOUR consumers (nb, na, both pair-join
    // sides); built inline, per-branch column pruning makes the
    // subtrees canonically distinct, so nothing reuses and the plan
    // re-scans events and re-shuffles the basket FIVE times (the r18
    // pin: 9 exchanges). Staged once via LAZY local checkpoint (r19 —
    // supersedes the r18 persist(): the checkpointed LogicalRDD carries
    // the hashpartitioning(user_id, day) that InMemoryRelation lost, so
    // the self-join sides and nb's distinct are satisfied WITHOUT
    // re-exchanging the cached frame, and the lazy variant pays no
    // separate materialization job — the objection that ruled out the
    // eager checkpoint in r18. Measured: 17 jobs/327 tasks (persist) →
    // 10 jobs/10 tasks at sf0.1.) Repartitioned on (user_id, day) first
    // so the basket distinct runs exchange-free and the clustering is
    // what the checkpoint preserves. At 100 TB this is the difference
    // between scanning the event log once and five times.
    val b = graft.Materialize.stageLazy(events
      .select(col("user_id"), expr("CAST(ts AS DATE)").as("day"),
        col("event_type"))
      .repartition(col("user_id"), col("day"))
      .distinct())
    val nb = b.select("user_id", "day").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val na = b.groupBy("event_type").agg(count(lit(1)).as("n"))
    val pairs = b.as("a")
      .join(b.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.day") === col("b.day") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(na.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), "type_a")
      .join(broadcast(na.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), "type_b")
      .crossJoin(broadcast(nb))
      .select(col("type_a"), col("type_b"), col("n_ab"),
        expr("(n_ab * 1000000 div n_a) * n_baskets div n_b").as("lift_ppm"))
  }

  val assocLiftDailyQ = GQuery(
    "assoc_lift_daily",
    (s, d) => assocLiftDaily(Tables.events(s, d)),
    oracle = Some(
      """WITH b AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
        |                 event_type
        |          FROM events),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_baskets
        |       FROM (SELECT DISTINCT user_id, day FROM b)),
        |na AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |       FROM b GROUP BY 1),
        |p AS (SELECT l.event_type AS type_a, r.event_type AS type_b,
        |             CAST(count(*) AS BIGINT) AS n_ab
        |      FROM b l JOIN b r ON l.user_id = r.user_id AND l.day = r.day
        |                       AND l.event_type < r.event_type
        |      GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.n_ab,
        |       (p.n_ab * 1000000 // x.n) * nb.n_baskets // y.n AS lift_ppm
        |FROM p
        |JOIN na x ON p.type_a = x.event_type
        |JOIN na y ON p.type_b = y.event_type
        |CROSS JOIN nb""".stripMargin),
    bench = true)

  /** Q:dau_cumulative — daily active users + cumulative distinct users to
    * date, the growth-dashboard pair. Exact DAU is the easy half (groupBy
    * day with a distinct on (day, user) — both map-side combinable). The
    * cumulative half is the interesting one at scale: the naive
    * "count(DISTINCT user) over days ≤ d" recomputes an O(users) distinct
    * per day (O(days · users) total). The linear trick: cumulative
    * distinct-to-date ≡ running SUM of first-seen counts — aggregate each
    * user to their min(day) (ONE pass over the per-(day,user) frame the
    * DAU leg already built), count first-sightings per day, and a running
    * sum over the tiny day-grain frame (≤ #days rows — a single-partition
    * window on purpose) finishes it. Days where every active user is
    * returning get new_users = 0 via the left join from the DAU frame
    * (dau ≥ 1 on every present day, so no day is lost).
    */
  def dauCumulative(events: DataFrame): DataFrame = {
    val dayUser = events
      // a dateless event belongs to no day: left in, the NULL day group's
      // position under the cumulative ORDER BY day is engine-defined
      // (Spark NULLS FIRST vs DuckDB NULLS LAST) and its join behavior
      // fabricates a zero-new-users day
      .filter(col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val dau = dayUser.groupBy("day").agg(count(lit(1)).as("dau"))
    val firstSeen = dayUser.groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val wCum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dau.join(firstSeen, Seq("day"), "left")
      .na.fill(0L, Seq("new_users"))
      .withColumn("cum_users", sum("new_users").over(wCum))
      .select(expr("unix_timestamp(day)").as("day_epoch"),
        col("dau"), col("new_users"), col("cum_users"))
  }

  val dauCumulativeQ = GQuery(
    "dau_cumulative",
    (s, d) => dauCumulative(Tables.events(s, d)),
    oracle = Some(
      """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
        |            FROM events WHERE ts IS NOT NULL),
        |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
        |fs AS (SELECT min(day) AS day FROM du GROUP BY user_id),
        |nu AS (SELECT day, count(*) AS new_users FROM fs GROUP BY day)
        |SELECT CAST(floor(epoch(dau.day)) AS BIGINT) AS day_epoch, dau,
        |       coalesce(new_users, 0) AS new_users,
        |       CAST(sum(coalesce(new_users, 0))
        |            OVER (ORDER BY dau.day ROWS UNBOUNDED PRECEDING)
        |            AS BIGINT) AS cum_users
        |FROM dau LEFT JOIN nu ON dau.day = nu.day""".stripMargin),
    bench = true)

  /** Q:ohlc_daily — per-(day, event_type) OHLC candlestick bars, the
    * metrics-engine downsampling primitive: open/close by min_by/max_by
    * over the UNIQUE event_id order (deterministic — no first()/last()
    * nondeterminism), high/low as plain min/max, and the day's traded
    * value as a scaled integer (2-decimal inputs are the round()-unsafe
    * regime). ONE map-side-combinable hash aggregate: min_by/max_by
    * partials carry a single (value, id) pair each, so a day's millions
    * of ticks reduce locally and only per-(day,type) candles cross the
    * shuffle — no window, no sort.
    */
  def ohlcDaily(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(
        expr("min_by(value, event_id)").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        expr("max_by(value, event_id)").as("close"),
        count(lit(1)).as("volume"),
        // scale each 2-decimal value to an exact integer BEFORE summing:
        // the sum is then exact at any group size and in any partial-
        // aggregation order (summing raw doubles and scaling after could
        // flip the floored integer on very large groups)
        sum(expr(ExactSql.ValueE2)).as("traded_e2"))
      .select(expr("unix_timestamp(day)").as("day_epoch"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("traded_e2"))

  val ohlcDailyQ = GQuery(
    "ohlc_daily",
    (s, d) => ohlcDaily(Tables.events(s, d)),
    oracle = Some(
      """SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_epoch,
        |       event_type,
        |       arg_min(value, event_id) AS open,
        |       max(value) AS high,
        |       min(value) AS low,
        |       arg_max(value, event_id) AS close,
        |       count(*) AS volume,
        |       CAST(sum(TRY_CAST(floor(CASE WHEN isnan(value) OR abs(value) >= 9.0e16 THEN NULL ELSE value END * 100 + 0.5) AS BIGINT)) AS BIGINT) AS traded_e2
        |FROM events
        |GROUP BY 1, 2""".stripMargin),
    bench = true)

  /** Q:trend_slope_moments — per-series OLS trend (value vs day) via the
    * SUFFICIENT-STATISTICS decomposition that makes regression a
    * one-pass distributed aggregate (what regr_slope computes
    * internally): n, Σx, Σy, Σxy, Σx² reduce map-side and combine
    * associatively; the slope is num/den with num = n·Σxy − Σx·Σy and
    * den = n·Σx² − (Σx)². Everything is INTEGER — x is the epoch day, y
    * the 2-decimal value scaled ×100 — so the moments are exact and the
    * numerator/denominator hash-match (the division is left to the
    * consumer: a slope QUOTIENT is a float whose rounding would need a
    * cross-engine policy, and emitting the exact integer pair lets the
    * consumer pick precision — note both engines' integer division
    * truncates toward zero, `div` and `//` alike, verified empirically:
    * an earlier revision of this comment wrongly claimed DuckDB floors).
    * Magnitudes: n·Σxy ≲ n²·x·y — fine in long through ~10⁹ rows
    * per group; beyond that the same aggregate runs on decimal(38,0).
    * Per-row domain: |value| ≲ 10¹¹ (y = cents ≤ 10¹³, x ≤ ~10⁵ days ⇒
    * x·y ≤ 10¹⁸ < 2⁶³) — established by a hostile-gate probe at 10¹⁵,
    * where Spark's long Σxy overflows under ANSI while DuckDB silently
    * widens to HUGEINT; a money column beyond that bound needs the
    * decimal variant, not a bigger long.
    */
  def trendMoments(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("x"),
        expr(ExactSql.ValueE2).as("y"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sum_x"),
        sum("y").as("sum_y_e2"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n"), col("sum_x"), col("sum_y_e2"),
        (col("n") * col("sxy") - col("sum_x") * col("sum_y_e2"))
          .as("slope_num_e2"),
        (col("n") * col("sxx") - col("sum_x") * col("sum_x"))
          .as("slope_den"))

  val trendMomentsQ = GQuery(
    "trend_slope_moments",
    (s, d) => trendMoments(Tables.events(s, d)),
    oracle = Some(
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sum_x,
        |         CAST(sum(y) AS BIGINT) AS sum_y_e2,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM (SELECT event_type,
        |               CAST(datediff('day', DATE '1970-01-01',
        |                             CAST(ts AS DATE)) AS BIGINT) AS x,
        |               TRY_CAST(floor(CASE WHEN isnan(value) OR abs(value) >= 9.0e16 THEN NULL ELSE value END * 100 + 0.5) AS BIGINT) AS y
        |        FROM events)
        |  GROUP BY event_type)
        |SELECT event_type, n, sum_x, sum_y_e2,
        |       n * sxy - sum_x * sum_y_e2 AS slope_num_e2,
        |       n * sxx - sum_x * sum_x AS slope_den
        |FROM m""".stripMargin))

  /** Q:window_drawdown — maximum drawdown per series (the risk metric:
    * deepest drop from a running peak), in event_id order. One window
    * shuffle keyed on the series builds the running peak; peak − value
    * is row-local and the final max is map-side-combinable. Integer
    * throughout (2-decimal values ×100), so the result hash-matches.
    * Scale: the per-series window is the per-log sequential bound the
    * PLANS.md header documents — parallel across series, sequential
    * within one, inherent to running-peak semantics.
    */
  def maxDrawdown(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("event_type"), col("event_id"),
        expr(ExactSql.ValueE2).as("v"))
      .withColumn("peak", max("v").over(w))
      .groupBy("event_type")
      .agg(max(col("peak") - col("v")).as("max_drawdown_e2"))
  }

  val maxDrawdownQ = GQuery(
    "window_drawdown",
    (s, d) => maxDrawdown(Tables.events(s, d)),
    oracle = Some(
      """WITH y AS (SELECT event_type, event_id,
        |                  TRY_CAST(floor(CASE WHEN isnan(value) OR abs(value) >= 9.0e16 THEN NULL ELSE value END * 100 + 0.5) AS BIGINT) AS v
        |           FROM events),
        |p AS (SELECT event_type, v,
        |             max(v) OVER (PARTITION BY event_type ORDER BY event_id
        |                          ROWS UNBOUNDED PRECEDING) AS peak
        |      FROM y)
        |SELECT event_type, max(peak - v) AS max_drawdown_e2
        |FROM p GROUP BY 1""".stripMargin))

  /** Trailing RANGE-frame width, seconds (24 h). */
  final val TrailRangeSec = 86400L

  /** Q:window_trailing_range — per-user trailing-24-hour value sum at
    * every event: the time-window aggregate that neither a rows-frame
    * (counts rows, not time) nor a tumbling window (aligns to grid
    * boundaries, not to each row) expresses — `RANGE BETWEEN <interval>
    * PRECEDING AND CURRENT ROW` over the event time. ONE user-keyed
    * window exchange; the frame is evaluated by a sliding two-pointer
    * pass inside each partition, O(rows) not O(rows·frame). The order
    * key is epoch SECONDS on both engines (ts carries microseconds, so
    * the truncation must be mirrored, not implied), and the summand is
    * the per-row-scaled e2 integer, so every trailing sum is exact.
    * Scale: parallel across users, sequential within one — the same
    * per-log bound as every ordered window here.
    */
  def windowTrailingRange(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_sec")
      .rangeBetween(-TrailRangeSec, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"),
        expr(ExactSql.TsSecSpark).as("ts_sec"),
        expr(ExactSql.ValueE2).as("v"))
      .withColumn("trail24h_e2", sum("v").over(w))
      .select("user_id", "event_id", "ts_sec", "trail24h_e2")
  }

  val windowTrailingRangeQ = GQuery(
    "window_trailing_range",
    (s, d) => windowTrailingRange(Tables.events(s, d)),
    oracle = Some(
      s"""WITH y AS (SELECT user_id, event_id,
        |                  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
        |                  TRY_CAST(floor(CASE WHEN isnan(value) OR abs(value) >= 9.0e16 THEN NULL ELSE value END * 100 + 0.5) AS BIGINT) AS v
        |           FROM events)
        |SELECT user_id, event_id, ts_sec,
        |       CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts_sec
        |                         RANGE BETWEEN $TrailRangeSec PRECEDING
        |                         AND CURRENT ROW) AS BIGINT) AS trail24h_e2
        |FROM y""".stripMargin),
    bench = true)

  /** Q:timeseries_gapfill — resample each event-type series onto a
    * regular hourly grid with forward-fill: hours with no events appear
    * with cnt = 0 and the last observed value carried forward — the
    * metrics-engine densification every dashboard and every
    * join-against-a-regular-grid consumer needs, which no plain
    * aggregate produces (missing groups simply don't exist). Scale
    * shape: the ONLY data-sized shuffle is the (type, hour) aggregate
    * (map-side combinable; "last in hour" rides the same partial state
    * as a max_by under the (ts, event_id) changelog order); the grid
    * explodes from per-type [min, max] hour spans — bounded by
    * calendar time × type count, not by row count — and the
    * forward-fill window runs over those bounded spans. All integers
    * (hour index, e2 values), so the filled series hash-matches.
    */
  def timeseriesGapfill(events: DataFrame): DataFrame = {
    // STAGED: the hourly aggregate feeds two consumers (the span/grid
    // derivation and the grid join), and their different column needs
    // make the two copies non-canonical — exchange reuse cannot serve
    // them (unlike q15's identical twins), so without staging the raw
    // events would be scanned and aggregated twice. The staged frame is
    // bounded by types × hours, not by row count. (stage, not share:
    // PlanSpec pins the final plan free of raw-events scans, which the
    // checkpoint's lineage truncation is what guarantees.)
    val b = graft.Materialize.stageLazy(events
      .groupBy(col("event_type"),
        expr(ExactSql.HourSpark).as("hr"))
      .agg(count(lit(1)).as("cnt"),
        expr("max_by(TRY_CAST(floor(CASE WHEN isnan(value) OR abs(value) >= 9.0e16 THEN NULL ELSE value END * 100 + 0.5) AS BIGINT), struct(ts, event_id))")
          .as("last_e2")))
    val grid = b.groupBy("event_type")
      .agg(min("hr").as("h0"), max("hr").as("h1"))
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hr"))
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b, Seq("event_type", "hr"), "left_outer")
      .select(col("event_type"), col("hr"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        last("last_e2", ignoreNulls = true).over(w).as("filled_e2"))
  }

  val timeseriesGapfillQ = GQuery(
    "timeseries_gapfill",
    (s, d) => timeseriesGapfill(Tables.events(s, d)),
    oracle = Some(
      s"""WITH e AS (
        |  SELECT event_type,
        |         ${ExactSql.HourDuck} AS hr,
        |         TRY_CAST(floor(CASE WHEN isnan(value) OR abs(value) >= 9.0e16 THEN NULL ELSE value END * 100 + 0.5) AS BIGINT) AS v_e2,
        |         row_number() OVER (
        |           PARTITION BY event_type, ${ExactSql.HourDuck}
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |b AS (SELECT event_type, hr, count(*) AS cnt,
        |             max(CASE WHEN rn = 1 THEN v_e2 END) AS last_e2
        |      FROM e GROUP BY 1, 2),
        |span AS (SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM b GROUP BY 1),
        |grid AS (SELECT event_type, unnest(generate_series(h0, h1)) AS hr FROM span),
        |j AS (SELECT g.event_type, g.hr, coalesce(b.cnt, 0) AS cnt, b.last_e2
        |      FROM grid g LEFT JOIN b ON g.event_type = b.event_type AND g.hr = b.hr)
        |SELECT event_type, hr, CAST(cnt AS BIGINT) AS cnt,
        |       last_value(last_e2 IGNORE NULLS) OVER (PARTITION BY event_type
        |                                              ORDER BY hr) AS filled_e2
        |FROM j""".stripMargin),
    bench = true)

  /** Session gap for [[sessionPathTopk]], minutes — matches the
    * `window_session` gap so the two sessionizations agree. */
  final val PathSessionGapMin = 30L

  /** Q:session_path_topk — sequence mining: the 10 most common 3-step
    * event-type paths WITHIN a session (30-min-gap sessionization, the
    * same rule as `window_session`). Two windows share one user-keyed
    * shuffle: the gap-flag/running-sum pair assigns session ids, then
    * lead×2 within (user, session) forms trigrams — all subsequent work
    * is a path-keyed count whose partials combine map-side, and the
    * top-10 is TakeOrderedAndProject with a (n DESC, path) total order.
    * Gap arithmetic runs on exact epoch MICROseconds (unix_micros /
    * epoch_us) so the two engines compare identical integers.
    */
  def sessionPathTopk(events: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("brk",
        when(col("us") - lag("us", 1).over(wOrd) >=
          PathSessionGapMin * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(wRun))
    val wSess = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    marked
      .withColumn("t2", lead("event_type", 1).over(wSess))
      .withColumn("t3", lead("event_type", 2).over(wSess))
      .filter(col("t3").isNotNull)
      .select(concat_ws("->", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("path")).limit(10)
  }

  val sessionPathTopkQ = GQuery(
    "session_path_topk",
    (s, d) => sessionPathTopk(Tables.events(s, d)),
    oracle = Some(
      s"""WITH e AS (SELECT user_id, event_type, ts, event_id,
        |                  epoch_us(ts) AS us
        |           FROM events),
        |m AS (SELECT user_id, event_type, ts, event_id,
        |             CASE WHEN us - lag(us) OVER
        |                    (PARTITION BY user_id ORDER BY ts, event_id)
        |                  >= ${PathSessionGapMin * 60L * 1000000L}
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |s AS (SELECT user_id, event_type, ts, event_id,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                            ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m),
        |t AS (SELECT event_type,
        |             lead(event_type, 1) OVER
        |               (PARTITION BY user_id, sid ORDER BY ts, event_id) AS t2,
        |             lead(event_type, 2) OVER
        |               (PARTITION BY user_id, sid ORDER BY ts, event_id) AS t3
        |      FROM s)
        |SELECT event_type || '->' || t2 || '->' || t3 AS path,
        |       count(*) AS n
        |FROM t WHERE t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin),
    bench = true)

  /** Q:stickiness_ratio — DAU/MAU stickiness, the engagement headline:
    * what share of a month's users show up on a given day. Reuses the
    * (day, user) distinct frame shape of [[dauCumulative]]; the MAU frame
    * is one more distinct+count at month grain (tiny — #months rows) and
    * broadcasts into the day frame. The ratio is emitted ppm via integer
    * division, which is cross-engine-safe HERE because both operands are
    * strictly positive (every month with a day row has mau ≥ dau ≥ 1 —
    * truncation and floor agree on non-negatives; contrast
    * `trend_slope_moments` where signed operands forbid the quotient).
    */
  def stickiness(events: DataFrame): DataFrame = {
    val dayUser = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val dau = dayUser.groupBy("day").agg(count(lit(1)).as("dau"))
    val mau = dayUser
      .select(trunc(col("day"), "month").as("month"), col("user_id"))
      .distinct()
      .groupBy("month").agg(count(lit(1)).as("mau"))
    dau
      .withColumn("month", trunc(col("day"), "month"))
      .join(broadcast(mau), Seq("month"))
      .select(expr("unix_timestamp(day)").as("day_epoch"),
        col("dau"), col("mau"),
        expr("dau * 1000000 div mau").as("stickiness_ppm"))
  }

  val stickinessQ = GQuery(
    "stickiness_ratio",
    (s, d) => stickiness(Tables.events(s, d)),
    oracle = Some(
      """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
        |            FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
        |mu AS (SELECT DISTINCT date_trunc('month', day) AS month, user_id
        |       FROM du),
        |mau AS (SELECT month, count(*) AS mau FROM mu GROUP BY 1)
        |SELECT CAST(floor(epoch(dau.day)) AS BIGINT) AS day_epoch, dau, mau,
        |       dau * 1000000 // mau AS stickiness_ppm
        |FROM dau JOIN mau ON date_trunc('month', dau.day) = mau.month""".stripMargin))

  /** Followup window for [[followupPairs]], minutes — 60 rather than the
    * intuitive 10 because the smoke testbed has ZERO purchase→error pairs
    * inside 10 minutes (the vacuous-check lesson, third occurrence: Q7,
    * CDC, now this); 60 gives pairs at every scale factor. */
  final val FollowupWindowMin = 60L

  /** The raw followup PAIRS (purchase, error-within-window) — the seam
    * the streaming twin's parity test compares against, before the
    * per-user rollup. */
  def followupPairFrame(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("t_p"), col("event_id").as("id_p"))
    val e = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("t_e"))
    p.join(e, Seq("user_id"))
      .filter(col("t_e") > col("t_p") &&
        col("t_e") <= col("t_p") + expr(s"INTERVAL $FollowupWindowMin MINUTES"))
  }

  /** Q:join_followup_window — the temporal followup join ("error within
    * the window after a purchase"), the batch face of a stream-stream
    * interval join. Both filtered legs shuffle once on the shared
    * user_id; the window predicate is row-local after the co-keyed join,
    * and per-user pair fan-out is bounded by that user's own activity in
    * the window (the per-log bound every user-keyed operator documents).
    * The rollup counts followup pairs and the distinct purchases that
    * got one.
    */
  def followupPairs(events: DataFrame): DataFrame =
    followupPairFrame(events)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_followups"),
        countDistinct(col("id_p")).as("n_purchases_hit"))

  val followupPairsQ = GQuery(
    "join_followup_window",
    (s, d) => followupPairs(Tables.events(s, d)),
    oracle = Some(
      s"""SELECT p.user_id, count(*) AS n_followups,
        |       count(DISTINCT p.event_id) AS n_purchases_hit
        |FROM events p JOIN events e
        |  ON p.user_id = e.user_id
        | AND p.event_type = 'purchase' AND e.event_type = 'error'
        | AND e.ts > p.ts
        | AND e.ts <= p.ts + INTERVAL $FollowupWindowMin MINUTE
        |GROUP BY 1""".stripMargin),
    bench = true)

  /** Q:churn_accounting — the daily growth ledger: for each day, active
    * users split into retained (also active the day before) vs inflow
    * (new or resurrected), plus `churned_next` — users active today and
    * NOT tomorrow, attached to the day they were LAST SEEN. That
    * attachment is what makes the ledger gap-proof: if nobody at all is
    * active on d+1, churned_next(d) = dau(d) − 0 reports every user as
    * churned even though no d+1 row exists (a prev-day formulation
    * silently loses churn across fully-inactive days). The final day is
    * right-censored: no tomorrow exists, so its churned_next reads as
    * full churn — the standard horizon caveat of any churn readout. One
    * (user, day) distinct feeds everything; "active tomorrow" is a
    * SELF-JOIN of that frame shifted by one day, co-keyed on
    * (user, day); the day-grain rollup joins (≤ #days rows) broadcast.
    */
  def churnAccounting(events: DataFrame): DataFrame = {
    val dayUser = events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val dau = dayUser.groupBy("day").agg(count(lit(1)).as("dau"))
    // retained INTO day t (present on t and t−1), keyed by t
    val retained = dayUser.as("t")
      .join(dayUser.as("y"),
        col("t.user_id") === col("y.user_id") &&
          col("t.day") === date_add(col("y.day"), 1))
      .groupBy(col("t.day").as("day"))
      .agg(count(lit(1)).as("retained"))
    // the same frame re-keyed by t−1 = "survived into tomorrow"
    val survived = retained.select(date_add(col("day"), -1).as("day"),
      col("retained").as("survived_next"))
    dau
      .join(broadcast(retained), Seq("day"), "left")
      .join(broadcast(survived), Seq("day"), "left")
      .na.fill(0L, Seq("retained", "survived_next"))
      .select(expr("unix_timestamp(day)").as("day_epoch"), col("dau"),
        col("retained"),
        (col("dau") - col("retained")).as("inflow"),
        (col("dau") - col("survived_next")).as("churned_next"))
  }

  val churnAccountingQ = GQuery(
    "churn_accounting",
    (s, d) => churnAccounting(Tables.events(s, d)),
    oracle = Some(
      """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id
        |            FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM du GROUP BY 1),
        |ret AS (SELECT t.day, count(*) AS retained
        |        FROM du t JOIN du y
        |          ON t.user_id = y.user_id
        |         AND t.day = y.day + INTERVAL 1 DAY
        |        GROUP BY 1)
        |SELECT CAST(floor(epoch(dau.day)) AS BIGINT) AS day_epoch, dau.dau,
        |       coalesce(ret.retained, 0) AS retained,
        |       dau.dau - coalesce(ret.retained, 0) AS inflow,
        |       dau.dau - coalesce(nxt.retained, 0) AS churned_next
        |FROM dau
        |LEFT JOIN ret ON dau.day = ret.day
        |LEFT JOIN ret nxt ON nxt.day = dau.day + INTERVAL 1 DAY""".stripMargin))

  /** Latency bin width for [[conversionLatency]], minutes. */
  final val LatencyBinMin = 60L

  /** Q:conversion_latency_histogram — how long conversion takes: the
    * distribution of first-view→first-purchase latency (through the
    * ordered funnel's gates, so it is the latency of ACTUAL conversions,
    * not of any view/purchase pair), bucketed into hour bins. Reuses
    * [[stageTimes]]' per-stage min-entry frames — co-keyed user joins —
    * then ONE (bin) count whose shuffle is bounded by the bin count, the
    * same scale argument as `quantile_histogram` (exact latency
    * percentiles would sort every converting user). Bin arithmetic on
    * exact epoch-µs integer division.
    */
  def conversionLatency(events: DataFrame): DataFrame = {
    val stages = stageTimes(events)
    val first = stages.head.select(col("user_id"), col("t").as("t_view"))
    val last = stages.last.select(col("user_id"), col("t").as("t_purchase"))
    last.join(first, Seq("user_id"))
      .select(expr(
        s"(unix_micros(t_purchase) - unix_micros(t_view)) div ${LatencyBinMin * 60000000L}")
        .as("latency_bin"))
      .groupBy("latency_bin").agg(count(lit(1)).as("n_users"))
  }

  val conversionLatencyQ = GQuery(
    "conversion_latency_histogram",
    (s, d) => conversionLatency(Tables.events(s, d)),
    oracle = Some(
      s"""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |      JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |      JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
        |SELECT (epoch_us(p.t3) - epoch_us(v.t1))
        |         // ${LatencyBinMin * 60000000L} AS latency_bin,
        |       count(*) AS n_users
        |FROM p JOIN v ON p.user_id = v.user_id
        |GROUP BY 1""".stripMargin))

  /** Q:agg_mode_exact — exact per-group mode (the aggregate SQL lacks):
    * each series' most frequent hour-of-day, via DOUBLE aggregation —
    * count per (group, value), then argmax per group. Both stages are
    * map-side combinable and the second one's input is bounded by the
    * value domain (24 hours), so the mode of billions of events costs
    * one bounded shuffle — the same domain-bounding argument as
    * `quantile_histogram`. Determinism under ties: max_by over the
    * (n, −hour) struct picks the EARLIEST hour among tied counts,
    * mirrored by the oracle's (n DESC, hour) rank.
    */
  def modeExact(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        expr("CAST(hour(ts) AS BIGINT)").as("hr"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(expr("max_by(hr, struct(n, -hr))").as("modal_hour"),
        expr("max(struct(n, -hr)).n").as("modal_n"))

  val modeExactQ = GQuery(
    "agg_mode_exact",
    (s, d) => modeExact(Tables.events(s, d)),
    oracle = Some(
      """WITH c AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
        |                 count(*) AS n
        |          FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, hr, n,
        |             row_number() OVER (PARTITION BY event_type
        |                                ORDER BY n DESC, hr) AS rk
        |      FROM c)
        |SELECT event_type, hr AS modal_hour, n AS modal_n
        |FROM r WHERE rk = 1""".stripMargin))

  /** Q:dq_value_domain — the ingest-validation monitor paired with
    * [[ExactSql.ValueE2]]'s TRY_CAST tolerance: per event type, how many
    * value doubles are NULL, NaN, ±Inf, or finite-but-outside the
    * documented money domain (|value| > 10¹¹, the x·y BIGINT bound from
    * [[trendMoments]]). Tolerant aggregates skip those rows as NULL;
    * this is the standing count an operator alerts on, so the tolerance
    * can never become silent data loss. ONE map-side-combinable hash
    * aggregate on the (event_type) key — the cheapest possible monitor
    * at any scale. Non-finite tests are spelled with isnan + explicit
    * ±Infinity equality because both dialects parse them identically
    * (Spark has no isinf).
    */
  def dqValueDomain(events: DataFrame): DataFrame = {
    val inf = lit(Double.PositiveInfinity)
    val ninf = lit(Double.NegativeInfinity)
    val v = col("value")
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        count(when(v.isNull, 1)).as("n_null"),
        count(when(isnan(v), 1)).as("n_nan"),
        count(when(v === inf || v === ninf, 1)).as("n_inf"),
        count(when(!isnan(v) && v =!= inf && v =!= ninf && abs(v) > 1e11, 1))
          .as("n_out_of_domain"))
  }

  val dqValueDomainQ = GQuery(
    "dq_value_domain",
    (s, d) => dqValueDomain(Tables.events(s, d)),
    oracle = Some(
      """SELECT event_type,
        |       count(*) AS n,
        |       count(*) FILTER (value IS NULL) AS n_null,
        |       count(*) FILTER (isnan(value)) AS n_nan,
        |       count(*) FILTER (value = CAST('Infinity' AS DOUBLE)
        |                        OR value = CAST('-Infinity' AS DOUBLE)) AS n_inf,
        |       count(*) FILTER (NOT isnan(value)
        |                        AND value <> CAST('Infinity' AS DOUBLE)
        |                        AND value <> CAST('-Infinity' AS DOUBLE)
        |                        AND abs(value) > 1e11) AS n_out_of_domain
        |FROM events GROUP BY event_type""".stripMargin))

  val queries: Seq[GQuery] =
    Seq(funnelStages, funnelWindowedQ, cohortRetention, eventTransitions,
      anomalyBurstQ, assocLiftDailyQ, dauCumulativeQ, ohlcDailyQ,
      trendMomentsQ, maxDrawdownQ, sessionPathTopkQ, stickinessQ,
      followupPairsQ, churnAccountingQ, conversionLatencyQ, modeExactQ,
      windowTrailingRangeQ, timeseriesGapfillQ, dqValueDomainQ)
}
