package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximation operators: the bounded-memory summaries a
  * 100 TB pipeline reaches for when exact answers would shuffle the whole
  * key set — KMV distinct-count estimation and count-min-sketch heavy
  * hitters. Both use the repo's explicit Knuth multiplicative hash
  * (never an engine-private hash), so the ESTIMATES themselves are
  * bit-identical in the DuckDB oracle — unlike approx_count_distinct /
  * approx_percentile, whose sketches are engine-internal and
  * uncheckable across engines.
  *
  * Reference anchor: the scoreboard family's exact aggregates
  * (function-code/src/main/java/.../ScoreboardFunction.java:77-101) are
  * the small-data members; these are their bounded-memory analogs for
  * cardinalities where exact state no longer fits.
  */
object SketchOps {

  /** KMV sketch size: kept values per group. With k=32 the estimator's
    * relative stderr is ~1/√(k−2) ≈ 18% — coarse, but the point is the
    * bounded-state plan shape; k scales the precision without changing it.
    */
  final val KmvK = 32

  /** Knuth multiplicative hash of a BIGINT key onto [0, 2³²) — exact in
    * both engines. Shared with the streaming twin so the two sketches
    * cannot drift. The pre-mod prime is 2³¹−1, which bounds the worst
    * product at (2³¹−2)·2654435761 ≈ 5.7·10¹⁸ < 2⁶³−1 (no wrap in either
    * engine) while giving the hash a ~2.1·10⁹-value image. The image
    * width matters for two distinct reasons: (a) KMV's NDV estimate
    * saturates at the image size, so a 10⁶ image (the old `% 1000003`
    * pre-mod) silently capped every NDV readout at ~10⁶ — useless for a
    * 150M-orderkey stats job at sf100; (b) the qsketch bottom-k sample
    * is uniform only while rows-per-hash-class ≈ 1 — beyond ~10⁶ rows
    * per group the old boundary class dominated and the "sample"
    * collapsed toward one residue class's smallest values. 2³¹ distinct
    * images push both failure modes past any per-group cardinality this
    * engine will meet (a 100 TB table has < 2³¹ rows per aggregate group
    * long before memory does). The multiplier is odd, so x → x·M mod 2³²
    * is injective on the pre-mod residues — the pre-mod is the only
    * collision source. Estimation over domains wider than 2³¹ uses
    * RewriteApproxDistinct's full xxhash64 mix (which DuckDB cannot
    * replay, hence the split).
    */
  private[graft] def knuthHash(c: String): String =
    s"(($c % 2147483647) * 2654435761) % 4294967296"

  private[graft] val UserHash = knuthHash("user_id")

  /** The KMV estimate SQL over a `mins` column named `c`: exact size
    * below k, else (k−1)·2³² div kth-min. One definition for batch and
    * streaming. The `greatest(…, 1)` guard (same as
    * RewriteApproxDistinct.estimate) makes a non-positive kth-min — which
    * a NEGATIVE input id produces, since Spark's `%` keeps the dividend's
    * sign — yield a saturated finite estimate instead of a divide-by-zero
    * or a negative count; the testbed ids are non-negative so the guard
    * is inert there, and both oracles mirror it. */
  private[graft] def kmvEstimateSql(c: String): String =
    s"""CASE WHEN size($c) < $KmvK THEN CAST(size($c) AS BIGINT)
       |ELSE (${KmvK - 1} * 4294967296) div greatest(element_at($c, $KmvK), 1)
       |END""".stripMargin

  /** Per-event-type distinct-user estimate via the graft_kmv aggregate.
    * Scale shape: ONE hash aggregate — ≤ k longs per group cross the
    * shuffle regardless of user cardinality. The exact branch (fewer than
    * k kept ⇒ sketch saw every distinct hash) and the estimator branch
    * are both integer arithmetic, mirrored by a rank window over distinct
    * hashes in DuckDB.
    */
  val sketchDistinctKmv = GQuery(
    "sketch_distinct_kmv",
    (s, d) =>
      perTypeSketch(s, d)
        .select(
          col("event_type"),
          size(col("mins")).cast("long").as("n_kept"),
          expr(kmvEstimateSql("mins")).as("kmv_est")),
    oracle = Some(
      s"""WITH h AS (SELECT DISTINCT event_type,
        |                  $UserHash AS h
        |           FROM events
        |           WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, h,
        |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        |      FROM h),
        |s AS (SELECT event_type,
        |             CAST(least(count(*), $KmvK) AS BIGINT) AS n_kept,
        |             max(CASE WHEN rk <= $KmvK THEN h END) AS kth
        |      FROM r GROUP BY 1)
        |SELECT event_type, n_kept,
        |       CASE WHEN n_kept < $KmvK THEN n_kept
        |            ELSE (${KmvK - 1} * 4294967296) // greatest(kth, 1) END AS kmv_est
        |FROM s""".stripMargin),
    bench = true)

  /** Count-min geometry: depth × width counters total, whatever the
    * corpus size. */
  final val CmsDepth = 3
  /** 1024 buckets per row: the width must EXCEED the inverse of the
    * reporting threshold (total/128) or the sketch reports everything —
    * the average bucket already carries total/width, so with width 64
    * every user's estimate passed a total/128 bar (verified empirically:
    * all 1500 users "heavy" at sf0.1 where 0 truly were). At 1024 the
    * N/width error bound is 8× below the threshold and the candidate
    * set is genuinely selective. 3×1024 counters is still corpus-
    * independent. */
  final val CmsWidth = 1024

  /** Row-j bucket of user_id: Knuth-style product with a DIFFERENT odd
    * multiplier per row, HIGH bits (2³² div 2²² = 1024 buckets) per the
    * repo's high-bits convention — the low bits of a multiplicative hash
    * are a bijection of the input's low bits. The multiplier (not the
    * pre-mod prime) must vary per row: the earlier prime-only variation
    * was the IDENTITY below the smallest prime, so all three "independent"
    * rows computed the same bucket for every realistic id and the depth-3
    * sketch silently degenerated to depth 1 (verified: zero rows differed
    * on the whole testbed). The pre-mod prime is 2³¹−1 (same width as
    * [[knuthHash]]): a narrower pre-mod is a SHARED collision source —
    * users u and u+p alias in every row at once, which depth cannot
    * repair, so past ~10⁶ distinct users a `% 1000003` pre-mod would
    * systematically inflate the aliased users' estimates. Product bound:
    * (2³¹−2)·3266489917 ≈ 7.0·10¹⁸ < 2⁶³−1, exact in both engines.
    */
  private val CmsMults = Seq(2654435761L, 2246822519L, 3266489917L)
  private[graft] def bucketSql(j: Int): String =
    s"((user_id % 2147483647) * ${CmsMults(j)}) % 4294967296 div ${4294967296L / CmsWidth}"

  /** Count-min-sketch heavy hitters: per-user event-count estimates from
    * a 3×1024 counter matrix, reporting users whose estimate reaches
    * total/128. Scale shape: the WHOLE counter matrix builds in ONE
    * corpus scan — the d bucket ids explode row-locally and a single
    * map-side-combinable (row, bucket) aggregate yields the counter
    * matrix (3072 rows), staged once and re-sliced per row (its broadcast is
    * by construction: the matrix size is corpus-independent, and the
    * total falls out of row 0 rather than a second scan). A user's
    * estimate is row-independent, so the threshold filter runs row-local
    * BEFORE the candidate distinct — the only key-cardinality shuffle
    * covers heavy-hitter CANDIDATES, never the full user set. Two corpus
    * scans total: matrix build + probe.
    */
  val sketchHeavyHittersCms = GQuery(
    "sketch_heavy_hitters_cms",
    (s, d) => {
      val ev = Tables.events(s, d)
      val bk = ev.select(
        col("user_id"),
        expr(bucketSql(0)).as("b0"),
        expr(bucketSql(1)).as("b1"),
        expr(bucketSql(2)).as("b2"))
      val sketch = graft.Materialize.stageLazy(
        bk.select(explode(array(
            struct(lit(0).as("j"), col("b0").as("b")),
            struct(lit(1).as("j"), col("b1").as("b")),
            struct(lit(2).as("j"), col("b2").as("b")))).as("jb"))
          .groupBy(col("jb.j").as("j"), col("jb.b").as("b"))
          .agg(count(lit(1)).as("c")))
      def counter(j: Int): DataFrame =
        sketch.filter(col("j") === j).select(col("b"), col("c").as(s"c$j"))
      val total = sketch.filter(col("j") === 0).agg(sum("c").as("n"))
      bk
        .join(broadcast(counter(0)), col("b0") === col("b"))
        .drop("b")
        .join(broadcast(counter(1)), col("b1") === col("b"))
        .drop("b")
        .join(broadcast(counter(2)), col("b2") === col("b"))
        .drop("b")
        .crossJoin(broadcast(total))
        .filter(least(col("c0"), col("c1"), col("c2")) >= expr("n div 128"))
        .select(col("user_id"),
          least(col("c0"), col("c1"), col("c2")).as("est_count"))
        .distinct()
    },
    oracle = Some(
      s"""WITH bk AS (SELECT user_id,
        |                  ${bucketSql(0).replace(" div ", " // ")} AS b0,
        |                  ${bucketSql(1).replace(" div ", " // ")} AS b1,
        |                  ${bucketSql(2).replace(" div ", " // ")} AS b2
        |           FROM events),
        |c0 AS (SELECT b0 AS b, CAST(count(*) AS BIGINT) AS c FROM bk GROUP BY 1),
        |c1 AS (SELECT b1 AS b, CAST(count(*) AS BIGINT) AS c FROM bk GROUP BY 1),
        |c2 AS (SELECT b2 AS b, CAST(count(*) AS BIGINT) AS c FROM bk GROUP BY 1),
        |cand AS (SELECT DISTINCT user_id, b0, b1, b2 FROM bk),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
        |SELECT cand.user_id, least(c0.c, c1.c, c2.c) AS est_count
        |FROM cand
        |JOIN c0 ON cand.b0 = c0.b
        |JOIN c1 ON cand.b1 = c1.b
        |JOIN c2 ON cand.b2 = c2.b
        |CROSS JOIN t
        |WHERE least(c0.c, c1.c, c2.c) >= n // 128""".stripMargin),
    bench = true)

  /** Histogram-based approximate quantiles: p50/p95/p99 of `value` per
    * event type from a fixed unit-width bin histogram — the scale path
    * that complements exact `agg_percentiles` the way KMV complements
    * count(DISTINCT). An exact quantile sorts every group row; here ONE
    * map-side-combinable (type, bin) count bounds the shuffle at the bin
    * count (~500 per type at any corpus size), and the cumulative window
    * runs over BINS, not rows. Error ≤ one bin width by construction
    * (SketchSpec asserts it against the exact quantiles).
    *
    * Bin arithmetic: `floor(value·100) div 100` — both engines evaluate
    * the same IEEE double product then integer-divide, so bins are
    * bit-identical; the quantile pick `cum·100 ≥ p·n` is all-integer.
    */
  val quantileHistogram = GQuery(
    "quantile_histogram",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val h = Tables.events(s, d)
        // null AND non-finite values carry no quantile information; left
        // in they diverge the engines (NULL bins sort NULLS FIRST in
        // Spark but LAST in DuckDB; Spark floor saturates NaN/Inf where
        // DuckDB conversion-errors) — ExactSql.ValueFinite on both sides
        .filter(expr(ExactSql.ValueFinite))
        .select(col("event_type"),
          expr("CAST(floor(value * 100) AS BIGINT) div 100").as("bin"))
        .groupBy("event_type", "bin")
        .agg(count(lit(1)).as("c"))
      val byType = Window.partitionBy("event_type")
      val cw = h
        .withColumn("cum", sum("c").over(byType.orderBy("bin")))
        .withColumn("n", sum("c").over(byType))
      cw.groupBy("event_type")
        .agg(
          min(when(expr("cum * 100 >= 50 * n"), col("bin"))).as("p50_bin"),
          min(when(expr("cum * 100 >= 95 * n"), col("bin"))).as("p95_bin"),
          min(when(expr("cum * 100 >= 99 * n"), col("bin"))).as("p99_bin"))
    },
    oracle = Some(
      s"""WITH h AS (SELECT event_type,
        |                 CAST(floor(value * 100) AS BIGINT) // 100 AS bin,
        |                 CAST(count(*) AS BIGINT) AS c
        |          FROM events WHERE ${ExactSql.ValueFinite} GROUP BY 1, 2),
        |cw AS (SELECT event_type, bin,
        |              CAST(sum(c) OVER (PARTITION BY event_type
        |                                ORDER BY bin) AS BIGINT) AS cum,
        |              CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |       FROM h)
        |SELECT event_type,
        |       min(CASE WHEN cum * 100 >= 50 * n THEN bin END) AS p50_bin,
        |       min(CASE WHEN cum * 100 >= 95 * n THEN bin END) AS p95_bin,
        |       min(CASE WHEN cum * 100 >= 99 * n THEN bin END) AS p99_bin
        |FROM cw GROUP BY 1""".stripMargin),
    bench = true)

  /** Rank-sketch sample size: kept (hash, value) pairs per group. The
    * empirical-quantile error is O(1/√k); k scales precision without
    * changing the bounded-state plan shape. */
  final val QsK = 64

  /** Knuth multiplicative row hash of event_id (the unique row key) —
    * same BIGINT-exact construction as [[UserHash]], so the sample
    * membership is replayable in DuckDB. */
  private[graft] val EventIdHash = knuthHash("event_id")

  /** Quantile q = num/den over a value-sorted kept array `c`: the value
    * at 1-indexed rank ⌈q·n⌉, computed in pure integer arithmetic
    * ((num·n + den − 1) div den, floored at 1) so both engines select
    * the identical element. */
  private[graft] def rankSql(c: String, num: Int, den: Int): String =
    s"element_at($c, CAST(greatest(($num * size($c) + ${den - 1}) div $den, 1) AS INT))"

  /** Per-event-type p50/p90/p99 via the graft_qsketch mergeable rank
    * sketch — the unbounded-domain sibling of [[quantileHistogram]],
    * which is exact but needs the value range known up front to bin.
    * Scale shape: ONE hash aggregate; ≤ k (long, long) pairs per group
    * cross the shuffle regardless of group size (a bottom-k-by-row-hash
    * uniform sample — merge-order independent, unlike a KLL compactor,
    * so the estimates themselves hash-match the DuckDB rank-window
    * replay; see QuantileSketchAggregate's scaladoc for the trade).
    * Values are per-row-scaled e2 integers BEFORE sketching, so every
    * kept value and every selected quantile is integer-exact.
    */
  val sketchQuantileRank = GQuery(
    "sketch_quantile_rank",
    (s, d) => {
      graft.functions.QuantileSketchAggregate.ensureRegistered(s)
      Tables.events(s, d)
        // mirror the oracle's null guard BEFORE grouping: an event_type
        // whose rows are all null would otherwise still emit a group with
        // an EMPTY kept array — which the oracle lacks, and whose
        // element_at(…, 1) throws under ANSI mode
        .filter(col("event_id").isNotNull && expr(ExactSql.ValueFinite))
        .select(col("event_type"), expr(EventIdHash).as("h"),
          expr("TRY_CAST(floor(CASE WHEN isnan(value) OR abs(value) >= 9.0e16 THEN NULL ELSE value END * 100 + 0.5) AS BIGINT)").as("v"))
        .groupBy("event_type")
        .agg(expr(s"graft_qsketch(h, v, $QsK)").as("vs"))
        .select(col("event_type"),
          size(col("vs")).cast("long").as("n_kept"),
          expr(rankSql("vs", 1, 2)).as("p50_e2"),
          expr(rankSql("vs", 9, 10)).as("p90_e2"),
          expr(rankSql("vs", 99, 100)).as("p99_e2"))
    },
    oracle = Some(
      s"""WITH b AS (SELECT DISTINCT event_type,
        |                  $EventIdHash AS h,
        |                  TRY_CAST(floor(CASE WHEN isnan(value) OR abs(value) >= 9.0e16 THEN NULL ELSE value END * 100 + 0.5) AS BIGINT) AS v
        |           FROM events
        |           WHERE event_id IS NOT NULL AND ${ExactSql.ValueFinite}),
        |r AS (SELECT event_type, v,
        |             row_number() OVER (PARTITION BY event_type
        |                                ORDER BY h, v) AS rk
        |      FROM b),
        |kept AS (SELECT event_type, v FROM r WHERE rk <= $QsK),
        |ranked AS (SELECT event_type, v,
        |                  row_number() OVER (PARTITION BY event_type
        |                                     ORDER BY v) AS vr,
        |                  count(*) OVER (PARTITION BY event_type) AS n
        |           FROM kept)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS n_kept,
        |       max(CASE WHEN vr = greatest((1 * n + 1) // 2, 1) THEN v END) AS p50_e2,
        |       max(CASE WHEN vr = greatest((9 * n + 9) // 10, 1) THEN v END) AS p90_e2,
        |       max(CASE WHEN vr = greatest((99 * n + 99) // 100, 1) THEN v END) AS p99_e2
        |FROM ranked GROUP BY 1""".stripMargin),
    bench = true)

  /** The integral lineitem columns profiled by [[statsColumns]]. */
  private val StatCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")

  private def statHash(c: String): String = knuthHash(c)

  /** ANALYZE-style column statistics in ONE pass: per-column min / max /
    * null count / NDV estimate over the integral lineitem columns — the
    * stats-collection job that feeds a cost-based optimizer at 100 TB,
    * where a per-column `count(DISTINCT)` pass is exactly what you
    * cannot afford. All 16 aggregates (4 per column, the NDV via the
    * bounded graft_kmv buffer) ride ONE scan and one single-row
    * aggregation; the melt to (col_name, …) rows is driver-free.
    *
    * The NDV hash is the oracle-mirrorable Knuth form — exact below k,
    * estimator-accurate up to its 2³¹ hash image (covers sf100's 150M
    * orderkeys with 14× headroom; a stats job on domains past 2³¹ uses
    * the rule's xxhash64 variant, which DuckDB cannot replay).
    */
  val statsColumns = GQuery(
    "stats_columns",
    (s, d) => {
      graft.functions.KmvSketchAggregate.ensureRegistered(s)
      val li = Tables.lineitem(s, d)
      val aggs = StatCols.flatMap { c =>
        Seq(
          min(col(c)).cast("long").as(s"min_$c"),
          max(col(c)).cast("long").as(s"max_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
          expr(s"graft_kmv(${statHash(c)}, $KmvK)").as(s"mins_$c"))
      }
      val one = li.agg(aggs.head, aggs.tail: _*)
      val rows = StatCols.map { c =>
        struct(
          lit(c).as("col_name"),
          col(s"min_$c").as("min_v"),
          col(s"max_$c").as("max_v"),
          col(s"nn_$c").as("n_nulls"),
          expr(kmvEstimateSql(s"mins_$c")).as("ndv_est"))
      }
      one.select(explode(array(rows: _*)).as("s")).select(col("s.*"))
    },
    oracle = Some(
      StatCols.map { c =>
        s"""SELECT '$c' AS col_name,
           |       CAST(min($c) AS BIGINT) AS min_v,
           |       CAST(max($c) AS BIGINT) AS max_v,
           |       CAST(count(*) FILTER (WHERE $c IS NULL) AS BIGINT) AS n_nulls,
           |       (SELECT CASE WHEN least(count(*), $KmvK) < $KmvK
           |                    THEN CAST(count(*) AS BIGINT)
           |                    ELSE (${KmvK - 1} * 4294967296) //
           |                         greatest(max(CASE WHEN rk <= $KmvK THEN h END), 1) END
           |        FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk
           |              FROM (SELECT DISTINCT ${statHash(c)} AS h
           |                    FROM lineitem WHERE $c IS NOT NULL))) AS ndv_est
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")),
    bench = true)

  /** Per-event-type KMV sketches (event_type, mins) — the shared first
    * stage of the set-algebra queries. */
  private def perTypeSketch(s: org.apache.spark.sql.SparkSession,
                            d: String): DataFrame = {
    graft.functions.KmvSketchAggregate.ensureRegistered(s)
    Tables.events(s, d)
      // mirror every oracle's null guard: a type whose rows are ALL null
      // users would otherwise emit an empty sketch (and phantom pairs in
      // the jaccard self-join) that the oracles lack
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), expr(UserHash).as("h"))
      .groupBy("event_type")
      .agg(expr(s"graft_kmv(h, $KmvK)").as("mins"))
  }

  /** Q:sketch_kmv_union — the MERGEABILITY story: per-group sketches
    * re-aggregated into a global distinct-user estimate WITHOUT rescanning
    * the input. The global k smallest distinct hashes are all inside the
    * union of the per-group k-smallest sets (any hash among the global k
    * smallest is ≤ the global kth, hence ≤ its own group's kth), so
    * re-sketching the exploded per-group mins is EXACTLY the sketch of the
    * whole corpus — the identity SketchSpec asserts, and the reason a
    * 100 TB deployment stores per-partition sketches (k longs each) and
    * answers union cardinality from metadata. The merge input is
    * n_groups·k longs, corpus-size-independent.
    */
  val sketchKmvUnion = GQuery(
    "sketch_kmv_union",
    (s, d) =>
      perTypeSketch(s, d)
        .select(col("event_type"), explode(col("mins")).as("h"))
        .agg(
          expr("CAST(count(DISTINCT event_type) AS BIGINT)").as("n_groups"),
          expr(s"graft_kmv(h, $KmvK)").as("mins"))
        .select(
          col("n_groups"),
          size(col("mins")).cast("long").as("n_kept"),
          expr(kmvEstimateSql("mins")).as("union_est")),
    oracle = Some(
      s"""WITH h AS (SELECT DISTINCT event_type, $UserHash AS h
        |           FROM events
        |           WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, h,
        |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        |      FROM h),
        |u AS (SELECT DISTINCT h FROM r WHERE rk <= $KmvK),
        |ur AS (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM u),
        |s AS (SELECT CAST(least(count(*), $KmvK) AS BIGINT) AS n_kept,
        |             max(CASE WHEN rk <= $KmvK THEN h END) AS kth
        |      FROM ur)
        |SELECT (SELECT CAST(count(DISTINCT event_type) AS BIGINT)
        |        FROM events WHERE user_id IS NOT NULL) AS n_groups,
        |       n_kept,
        |       CASE WHEN n_kept < $KmvK THEN n_kept
        |            ELSE (${KmvK - 1} * 4294967296) // greatest(kth, 1) END AS union_est
        |FROM s""".stripMargin),
    bench = true)

  /** Q:sketch_kmv_jaccard — pairwise set overlap between event types from
    * their KMV sketches alone (Beyer et al.'s k-minimum-values set
    * operations): merge the two sketches, keep the k smallest distinct
    * hashes of the union, and count how many of those appear in BOTH
    * input sketches — jaccard ≈ that fraction, intersection ≈ jaccard ×
    * union estimate. Everything after the per-type aggregate is row-local
    * integer arithmetic over ≤ 2k-element arrays on a handful of rows
    * (one per type pair — the n_types² "join" is a broadcast of k longs
    * per side, never a data shuffle), so the estimates hash-match the
    * oracle's relational replay exactly.
    */
  val sketchKmvJaccard = GQuery(
    "sketch_kmv_jaccard",
    (s, d) => {
      // staged: BOTH self-join sides consume it — unstaged, Catalyst
      // duplicates the subplan and the corpus scan + KMV aggregation run
      // twice for a frame of k longs per type
      val sk = graft.Materialize.stageLazy(perTypeSketch(s, d))
      sk.as("a")
        .join(sk.as("b"), col("a.event_type") < col("b.event_type"))
        .select(
          col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          expr(s"slice(array_sort(array_distinct(concat(a.mins, b.mins))), 1, $KmvK)")
            .as("merged"),
          col("a.mins").as("ma"), col("b.mins").as("mb"))
        .select(
          col("type_a"), col("type_b"),
          expr(kmvEstimateSql("merged")).as("union_est"),
          expr("CAST(size(filter(merged, h -> array_contains(ma, h) AND array_contains(mb, h))) AS BIGINT) * 1000000 div greatest(size(merged), 1)")
            .as("jaccard_ppm"))
        .withColumn("inter_est",
          expr("jaccard_ppm * union_est div 1000000"))
    },
    oracle = Some(
      s"""WITH h AS (SELECT DISTINCT event_type, $UserHash AS h
        |           FROM events
        |           WHERE user_id IS NOT NULL),
        |r AS (SELECT event_type, h,
        |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        |      FROM h),
        |kept AS (SELECT event_type, h FROM r WHERE rk <= $KmvK),
        |ty AS (SELECT DISTINCT event_type FROM kept),
        |pr AS (SELECT a.event_type AS ta, b.event_type AS tb
        |       FROM ty a JOIN ty b ON a.event_type < b.event_type),
        |ph AS (SELECT pr.ta, pr.tb, k.h,
        |              max(CASE WHEN k.event_type = pr.ta THEN 1 ELSE 0 END) AS in_a,
        |              max(CASE WHEN k.event_type = pr.tb THEN 1 ELSE 0 END) AS in_b
        |       FROM pr JOIN kept k
        |         ON k.event_type = pr.ta OR k.event_type = pr.tb
        |       GROUP BY 1, 2, 3),
        |m AS (SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS urk
        |      FROM ph),
        |st AS (SELECT ta, tb,
        |              CAST(count(*) FILTER (WHERE urk <= $KmvK) AS BIGINT) AS n_merged,
        |              CAST(count(*) FILTER (WHERE urk <= $KmvK
        |                    AND in_a = 1 AND in_b = 1) AS BIGINT) AS inter_k,
        |              max(CASE WHEN urk = $KmvK THEN h END) AS kth
        |       FROM m GROUP BY 1, 2),
        |est AS (SELECT ta, tb,
        |               CASE WHEN n_merged < $KmvK THEN n_merged
        |                    ELSE (${KmvK - 1} * 4294967296) // greatest(kth, 1) END AS union_est,
        |               inter_k * 1000000 // greatest(n_merged, 1) AS jaccard_ppm
        |        FROM st)
        |SELECT ta AS type_a, tb AS type_b, union_est, jaccard_ppm,
        |       jaccard_ppm * union_est // 1000000 AS inter_est
        |FROM est""".stripMargin),
    bench = true)

  val queries: Seq[GQuery] =
    Seq(sketchDistinctKmv, sketchHeavyHittersCms, quantileHistogram,
      statsColumns, sketchKmvUnion, sketchKmvJaccard, sketchQuantileRank)
}
