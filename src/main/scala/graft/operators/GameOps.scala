package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Game-grid operators (SURVEY §2.2-2.6): the reference's 30×25 grid
  * (game.go:25-32), cell codes (utils.go:87-93), flame generator
  * (utils.go:132-175), obstacle semantics (event.go:227-251) and position
  * arithmetic (utils.go:35-63), re-expressed as relational queries over
  * deterministic derivations of the testbed so every one is DuckDB-checkable.
  *
  * Derivations (shared with the oracle CTEs below, kept in lockstep):
  *   bomb       := purchase events; cell = event_id % 750; owner = 'u'||(k%30)
  *   player     := distinct user_id; px = user_id % 30, py = (user_id*7) % 25
  *   obstacle   := cells c in [0,750) with c % 7 = 3; destructible ⇔ c % 2 = 0
  *   directions := R(+1,0) L(-1,0) D(0,+1) U(0,-1); ray length 6 (game.go:34)
  */
object GameOps {

  private val W = 30L // grid width  (game.go:25-29)
  private val H = 25L // grid height
  private val Cells = W * H // 750 (game.go:30-32)
  private val RayLen = 6L // bombLength (game.go:34)

  // try_cast like EventOps.propK: a malformed payload (no match → '',
  // or 20+ digits → BIGINT overflow) must yield NULL, not crash the query
  private def propK(c: Column): Column =
    regexp_extract(c, "\"k\": (\\d+)", 1).try_cast("long")

  /** Bomb placements derived from purchase events (SetBombEvent analog,
    * event.go:85-109). bomb_name follows the reference's `{owner}-{suffix}`
    * convention (game.go:194) so C11 owner-parsing is exercised.
    */
  private def bombs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("bomb_seq"),
        concat(lit("u"), propK(col("props")) % 30).as("owner"),
        (col("event_id") % Cells).as("cell"))
      .withColumn("bomb_name", concat(col("owner"), lit("-b"), col("bomb_seq")))
      .withColumn("bx", col("cell") % W)
      .withColumn("by", expr(s"cell div $W"))

  /** The obstacle map (game.go:213-238): a deterministic ~107-cell subset. */
  private def obstacles(s: SparkSession): DataFrame =
    s.range(Cells)
      .filter(col("id") % 7 === 3)
      .select(col("id").as("ocell"), (col("id") % 2 === 0).as("destructible"))

  private def players(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id")).distinct()
      .select(
        concat(lit("u"), col("user_id")).as("player"),
        (col("user_id") % W).as("px"),
        (((col("user_id") % H) * 7) % H).as("py"))

  /** Direction table — always broadcast (4 rows). */
  /** The four rays with their per-direction start distance: the reference's
    * right/down loops start AT the bomb cell (utils.go:144,164 — dist 0..6),
    * left/up start one off (utils.go:134,154 — dist 1..6). The bomb cell is
    * therefore emitted twice (once by R, once by D), exactly as the
    * reference appends it twice.
    */
  private def dirs(s: SparkSession): DataFrame = {
    import s.implicits._
    broadcast(
      Seq(("R", 1L, 0L, 0L), ("L", -1L, 0L, 1L), ("D", 0L, 1L, 0L), ("U", 0L, -1L, 1L))
        .toDF("dir", "dx", "dy", "d0"))
  }

  /** Shared oracle CTE prefix mirroring the derivations above. */
  private val GridCte =
    """WITH bombs AS (
      |  SELECT event_id AS bomb_seq,
      |         'u' || CAST(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 30 AS VARCHAR) AS owner,
      |         event_id % 750 AS cell
      |  FROM events WHERE event_type = 'purchase'),
      |b2 AS (
      |  SELECT *, owner || '-b' || CAST(bomb_seq AS VARCHAR) AS bomb_name,
      |         cell % 30 AS bx, cell // 30 AS by FROM bombs),
      |dirs AS (
      |  SELECT dir, CAST(dx AS BIGINT) AS dx, CAST(dy AS BIGINT) AS dy, CAST(d0 AS BIGINT) AS d0
      |  FROM (VALUES ('R', 1, 0, 0), ('L', -1, 0, 1), ('D', 0, 1, 0), ('U', 0, -1, 1)) AS d(dir, dx, dy, d0)),
      |obstacles AS (
      |  SELECT r AS ocell, (r % 2 = 0) AS destructible
      |  FROM range(750) t(r) WHERE r % 7 = 3),
      |players AS (
      |  SELECT 'u' || CAST(user_id AS VARCHAR) AS player,
      |         user_id % 30 AS px, ((user_id % 25) * 7) % 25 AS py
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |cand AS (
      |  SELECT b.bomb_name, b.owner, d.dir, g.dist,
      |         b.bx + d.dx * g.dist AS fx, b.by + d.dy * g.dist AS fy
      |  FROM b2 b CROSS JOIN dirs d CROSS JOIN generate_series(0, 6) g(dist)
      |  WHERE g.dist >= d.d0
      |    AND b.bx + d.dx * g.dist BETWEEN 0 AND 29
      |    AND b.by + d.dy * g.dist BETWEEN 0 AND 24),
      |withobs AS (
      |  SELECT c.*, c.fy * 30 + c.fx AS fcell,
      |         (o.ocell IS NOT NULL AND NOT coalesce(o.destructible, false)) AS indestr
      |  FROM cand c LEFT JOIN obstacles o ON c.fy * 30 + c.fx = o.ocell),
      |blocked AS (
      |  SELECT *, min(CASE WHEN indestr THEN dist END)
      |              OVER (PARTITION BY bomb_name, dir) AS block_dist
      |  FROM withobs),
      |flame AS (
      |  SELECT * FROM blocked
      |  WHERE dist < coalesce(block_dist, 99))""".stripMargin

  /** Flame-ray candidates: bombs × 4 directions × dist d0..6 (d0 = 0 for
    * R/D, 1 for L/U), border-clamped (F4 bounds predicate). The generator
    * half of G1 (utils.go:132-175), asymmetric rays reference-exact.
    */
  private def flameCandidates(s: SparkSession, d: String): DataFrame =
    bombs(s, d)
      .crossJoin(dirs(s))
      .withColumn("dist", explode(sequence(col("d0"), lit(RayLen))))
      .withColumn("fx", col("bx") + col("dx") * col("dist"))
      .withColumn("fy", col("by") + col("dy") * col("dist"))
      .filter(col("fx").between(0, W - 1) && col("fy").between(0, H - 1))

  /** Flame cells after obstacle blocking — the full G1+J4+W2 pipeline:
    * left-join candidates to the obstacle map, per-(bomb,dir) window computes
    * the first INDESTRUCTIBLE distance, rays keep strictly-closer cells.
    * Reference semantics (event.go:141-163): the destroy pass deletes
    * destructibles along the ray and CONTINUES, then the flame pass blocks
    * only on indestructibles — so for a single explosion, destructibles
    * never block the flame at all.
    */
  private def flameCells(s: SparkSession, d: String): DataFrame = {
    val cand = flameCandidates(s, d)
      .withColumn("fcell", col("fy") * W + col("fx"))
    val withObs = cand
      .join(broadcast(obstacles(s)), col("fcell") === col("ocell"), "left")
      .withColumn("indestr",
        col("ocell").isNotNull && !coalesce(col("destructible"), lit(false)))
    val w = Window.partitionBy(col("bomb_name"), col("dir"))
    withObs
      .withColumn("block_dist",
        min(when(col("indestr"), col("dist"))).over(w))
      .filter(col("dist") < coalesce(col("block_dist"), lit(99L)))
  }

  /** Q:flame_cells — unblocked ray coverage per cell (pure generator G1). */
  val flameCellsQ = GQuery(
    "flame_cells",
    (s, d) =>
      flameCandidates(s, d)
        .withColumn("fcell", col("fy") * W + col("fx"))
        .groupBy("fcell")
        .agg(count(lit(1)).as("n_rays"),
             countDistinct(col("bomb_name")).as("n_bombs"))
        .withColumn("x", col("fcell") % W)
        .withColumn("y", expr(s"fcell div $W"))
        .select("fcell", "x", "y", "n_rays", "n_bombs"),
    oracle = Some(
      s"""$GridCte
         |SELECT fcell, fcell % 30 AS x, fcell // 30 AS y,
         |       count(*) AS n_rays, count(DISTINCT bomb_name) AS n_bombs
         |FROM (SELECT c.*, c.fy * 30 + c.fx AS fcell FROM cand c)
         |GROUP BY fcell""".stripMargin),
    bench = true)

  /** Q:flame_blocking — blocked ray coverage (J4 + W2 prefix window). */
  val flameBlockingQ = GQuery(
    "flame_blocking",
    (s, d) =>
      flameCells(s, d)
        .groupBy("fcell")
        .agg(count(lit(1)).as("n_rays"),
             countDistinct(col("bomb_name")).as("n_bombs"))
        .withColumn("x", col("fcell") % W)
        .withColumn("y", expr(s"fcell div $W"))
        .select("fcell", "x", "y", "n_rays", "n_bombs"),
    oracle = Some(
      s"""$GridCte
         |SELECT fcell, fcell % 30 AS x, fcell // 30 AS y,
         |       count(*) AS n_rays, count(DISTINCT bomb_name) AS n_bombs
         |FROM flame GROUP BY fcell""".stripMargin),
    bench = true)

  /** Q:join_death_attribution (J1+J3): players standing in blocked flame →
    * (victim, killer) pairs; self-kills excluded (F2); killer parsed from
    * bomb_name via substring_index (C11, game.go:244). Flame side is the
    * small derived set → broadcast; at scale the players side streams.
    */
  val joinDeathAttribution = GQuery(
    "join_death_attribution",
    (s, d) => {
      val flame = flameCells(s, d)
        .select(col("fx"), col("fy"),
          substring_index(col("bomb_name"), "-", 1).as("killer"))
        .distinct()
      players(s, d)
        .join(flame, col("px") === col("fx") && col("py") === col("fy"))
        .filter(col("player") =!= col("killer"))
        .groupBy("killer")
        .agg(countDistinct(col("player")).as("n_victims"))
    },
    oracle = Some(
      s"""$GridCte
         |SELECT killer, count(DISTINCT player) AS n_victims FROM (
         |  SELECT p.player, f.killer FROM players p
         |  JOIN (SELECT DISTINCT fx, fy, string_split(bomb_name, '-')[1] AS killer
         |        FROM flame) f
         |    ON p.px = f.fx AND p.py = f.fy
         |  WHERE p.player <> f.killer)
         |GROUP BY killer""".stripMargin))

  /** Q:anti_join_spawn_clear (J5): obstacle candidates minus the 5-cell cross
    * around every player (game.go:225-236). Offsets and players broadcast.
    */
  val antiJoinSpawnClear = GQuery(
    "anti_join_spawn_clear",
    (s, d) => {
      import s.implicits._
      val offsets = broadcast(
        Seq((0L, 0L), (1L, 0L), (-1L, 0L), (0L, 1L), (0L, -1L))
          .toDF("ox", "oy"))
      val protectedCells = players(s, d)
        .crossJoin(offsets)
        .select(((col("py") + col("oy")) * W + col("px") + col("ox")).as("pcell"))
        .distinct()
      obstacles(s)
        .join(protectedCells, col("ocell") === col("pcell"), "left_anti")
        .select(col("ocell").as("cell"),
          (col("ocell") % W).as("x"), expr(s"ocell div $W").as("y"),
          col("destructible"))
    },
    oracle = Some(
      s"""$GridCte
         |SELECT ocell AS cell, ocell % 30 AS x, ocell // 30 AS y, destructible
         |FROM obstacles
         |WHERE ocell NOT IN (
         |  -- the IS NOT NULL guard matters: one NULL protected cell (null
         |  -- user_id player) would turn NOT IN into all-UNKNOWN and empty
         |  -- the result, where the engine left_anti correctly ignores it
         |  SELECT pcell FROM (
         |    SELECT (py + oy) * 30 + px + ox AS pcell FROM players
         |    CROSS JOIN (VALUES (0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)) o(ox, oy))
         |  WHERE pcell IS NOT NULL)""".stripMargin))

  /** Q:anti_join_occupied (F5): bombs may not land on obstacle cells
    * (event.go:92-95) — anti-join of bomb placements against the obstacle map.
    */
  val antiJoinOccupied = GQuery(
    "anti_join_occupied",
    (s, d) =>
      bombs(s, d)
        .join(broadcast(obstacles(s)), col("cell") === col("ocell"), "left_anti")
        .groupBy("owner")
        .agg(count(lit(1)).as("n_legal_bombs")),
    oracle = Some(
      s"""$GridCte
         |SELECT owner, count(*) AS n_legal_bombs FROM bombs
         |WHERE cell NOT IN (SELECT ocell FROM obstacles)
         |GROUP BY owner""".stripMargin))

  /** Q:encode_decode_roundtrip (C1/C2/C3): cell-code encode/decode plus the
    * sign-encoded destructibility convention (codes shifted by +1 so cell 0
    * keeps its sign, cf. event.go:229-246 where codes are nonzero).
    */
  val encodeDecodeRoundtrip = GQuery(
    "encode_decode_roundtrip",
    (s, d) =>
      Tables.events(s, d)
        .select((col("event_id") % Cells).as("cell")).distinct()
        .withColumn("x", col("cell") % W)
        .withColumn("y", expr(s"cell div $W"))
        .withColumn("recoded", col("y") * W + col("x"))
        .withColumn("signed",
          when(col("cell") % 2 === 0, -(col("cell") + 1))
            .otherwise(col("cell") + 1))
        .withColumn("destructible", col("signed") < 0)
        .withColumn("restored", abs(col("signed")) - 1)
        .select("cell", "x", "y", "recoded", "signed", "destructible", "restored"),
    oracle = Some(
      """SELECT cell, cell % 30 AS x, cell // 30 AS y,
        |       (cell // 30) * 30 + (cell % 30) AS recoded,
        |       CASE WHEN cell % 2 = 0 THEN -(cell + 1) ELSE cell + 1 END AS signed,
        |       (CASE WHEN cell % 2 = 0 THEN -(cell + 1) ELSE cell + 1 END) < 0 AS destructible,
        |       abs(CASE WHEN cell % 2 = 0 THEN -(cell + 1) ELSE cell + 1 END) - 1 AS restored
        |FROM (SELECT DISTINCT event_id % 750 AS cell FROM events)""".stripMargin))

  /** Q:gen_id_suffix (C5, deterministic analog): the reference suffixes
    * client/topic ids with 5 random letters (randStringRunes,
    * utils.go:78-86). Randomness is hostile to both the oracle contract
    * and log-replay determinism, so the engine restates it as a SEEDED
    * hash: the 5 low base-52 digits of graft_polyhash(name || '-' || seq)
    * over the same 52-letter alphabet — same shape and distribution,
    * reproducible on every engine and every replay.
    */
  val genIdSuffix = GQuery(
    "gen_id_suffix",
    (s, d) => {
      graft.functions.VectorExpressions.ensureRegistered(s)
      val A = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
      val digits = (0 until 5).map { i =>
        val div = math.pow(52, i).toLong
        expr(s"substring('$A', CAST((h div $div) % 52 AS INT) + 1, 1)")
      }
      Tables.events(s, d)
        .select(col("event_id").as("seq"),
          concat(lit("u"), col("user_id")).as("name"))
        .withColumn("h", expr("graft_polyhash(concat(name, '-', CAST(seq AS STRING)))"))
        .withColumn("suffix", concat(digits: _*))
        .select(col("seq"), col("name"),
          concat(col("name"), lit("-"), col("suffix")).as("suffixed_id"))
    },
    oracle = Some {
      // code-point fold is byte-exact HERE because the hashed key is
      // ASCII by construction ('u' + digits + '-' + digits); arbitrary
      // text must use DuckUtf8.polyFold instead (see DedupOps.tkDuck)
      val poly = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, length(k)), " +
        "i -> CAST(ascii(substr(k, i, 1)) AS BIGINT))), " +
        "(acc, x) -> (acc * 131 + x) % 2147483647)"
      val A = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
      val digits = (0 until 5).map { i =>
        val div = math.pow(52, i).toLong
        s"substr('$A', CAST((h // $div) % 52 AS INT) + 1, 1)"
      }.mkString(" || ")
      s"""WITH base AS (
         |  SELECT event_id AS seq, 'u' || CAST(user_id AS VARCHAR) AS name,
         |         'u' || CAST(user_id AS VARCHAR) || '-' || CAST(event_id AS VARCHAR) AS k
         |  FROM events),
         |hashed AS (SELECT seq, name, $poly AS h FROM base)
         |SELECT seq, name, name || '-' || ($digits) AS suffixed_id
         |FROM hashed""".stripMargin
    })

  /** Q:next_position (C4): direction step with border clamp (utils.go:35-59).
    * Direction derived from event_type; greatest/least implement the clamp.
    */
  val nextPosition = GQuery(
    "next_position",
    (s, d) => {
      val e = Tables.events(s, d).select(
        col("event_id").as("seq"),
        (col("user_id") % W).as("x"),
        (((col("user_id") % H) * 7) % H).as("y"),
        when(col("event_type") === "click", "L")
          .when(col("event_type") === "view", "R")
          .when(col("event_type") === "purchase", "U")
          .when(col("event_type") === "signup", "D")
          .otherwise("N").as("dir"))
      e.withColumn("nx",
          greatest(lit(0L), least(lit(W - 1),
            col("x") + when(col("dir") === "R", 1L)
              .when(col("dir") === "L", -1L).otherwise(0L))))
        .withColumn("ny",
          greatest(lit(0L), least(lit(H - 1),
            col("y") + when(col("dir") === "D", 1L)
              .when(col("dir") === "U", -1L).otherwise(0L))))
    },
    oracle = Some(
      """SELECT seq, x, y, dir,
        |       greatest(0, least(29, x + CASE dir WHEN 'R' THEN 1 WHEN 'L' THEN -1 ELSE 0 END)) AS nx,
        |       greatest(0, least(24, y + CASE dir WHEN 'D' THEN 1 WHEN 'U' THEN -1 ELSE 0 END)) AS ny
        |FROM (
        |  SELECT event_id AS seq, user_id % 30 AS x, ((user_id % 25) * 7) % 25 AS y,
        |         CASE event_type WHEN 'click' THEN 'L' WHEN 'view' THEN 'R'
        |              WHEN 'purchase' THEN 'U' WHEN 'signup' THEN 'D' ELSE 'N' END AS dir
        |  FROM events)""".stripMargin))

  /** Q:filter_bounds (F4): reject out-of-grid positions (utils.go:61-63) —
    * some derived coordinates intentionally fall outside [0,30)×[0,25).
    */
  val filterBounds = GQuery(
    "filter_bounds",
    (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id").as("seq"),
          (propK(col("props")) % 40 - 5).as("x"),
          (col("user_id") % 30).as("y"))
        .filter(col("x").between(0, W - 1) && col("y").between(0, H - 1)),
    oracle = Some(
      """SELECT seq, x, y FROM (
        |  SELECT event_id AS seq,
        |         TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 40 - 5 AS x,
        |         user_id % 30 AS y
        |  FROM events)
        |WHERE x BETWEEN 0 AND 29 AND y BETWEEN 0 AND 24""".stripMargin))

  /** Q:obstacle_density (A8): grid occupancy by destructibility
    * (game.go:34-37 constants generalized to a measured density).
    */
  val obstacleDensity = GQuery(
    "obstacle_density",
    (s, _) =>
      obstacles(s)
        .groupBy("destructible")
        .agg(count(lit(1)).as("n"),
             round(count(lit(1)) / lit(Cells.toDouble), 4).as("density")),
    oracle = Some(
      """SELECT destructible, count(*) AS n, round(count(*) / 750.0, 4) AS density
        |FROM (SELECT r AS ocell, (r % 2 = 0) AS destructible
        |      FROM range(750) t(r) WHERE r % 7 = 3)
        |GROUP BY destructible""".stripMargin))

  /** Q:obstacle_list_explode (C16): per-room signed obstacle lists built with
    * collect_set, sorted, then exploded back and decoded — the list⇄map round
    * trip (event.go:227-251), with the +1-shifted sign encoding.
    */
  val obstacleListExplode = GQuery(
    "obstacle_list_explode",
    (s, d) => {
      val signedPerRoom = Tables.events(s, d)
        .filter(col("event_type") === "view")
        .select(
          concat(lit("room"), col("user_id") % 8).as("room"),
          (col("event_id") % Cells).as("cell"))
        .distinct()
        .withColumn("signed",
          when(col("cell") % 3 === 0, -(col("cell") + 1))
            .otherwise(col("cell") + 1))
      signedPerRoom
        .groupBy("room")
        .agg(sort_array(collect_set(col("signed"))).as("codes"))
        .select(col("room"), explode(col("codes")).as("code"))
        .withColumn("cell", abs(col("code")) - 1)
        .withColumn("x", col("cell") % W)
        .withColumn("y", expr(s"cell div $W"))
        .withColumn("destructible", col("code") < 0)
        .select("room", "code", "cell", "x", "y", "destructible")
    },
    oracle = Some(
      """SELECT room, code, abs(code) - 1 AS cell,
        |       (abs(code) - 1) % 30 AS x, (abs(code) - 1) // 30 AS y,
        |       code < 0 AS destructible
        |FROM (
        |  SELECT DISTINCT 'room' || CAST(user_id % 8 AS VARCHAR) AS room,
        |         CASE WHEN (event_id % 750) % 3 = 0 THEN -(event_id % 750 + 1)
        |              ELSE event_id % 750 + 1 END AS code
        |  FROM events WHERE event_type = 'view')""".stripMargin))

  /** Q:sample_hash_bernoulli (C6 analog): deterministic hash-based ~5% sample
    * — the scale-safe replacement for orderBy(rand()) sampling: no shuffle,
    * no sort, reproducible across engines (Knuth multiplicative hash).
    * event_id is reduced mod the prime 1000003 before the multiply so the
    * product (< 2.7e15) never wraps Long for any BIGINT id — unreduced, the
    * Spark side would silently wrap past id ≈ 3.5e9 while DuckDB widens,
    * diverging exactly at production scale.
    */
  val sampleHashBernoulli = GQuery(
    "sample_hash_bernoulli",
    (s, d) =>
      Tables.events(s, d)
        .filter((col("event_id") % 1000003L) * 2654435761L % 97 < 5)
        .select(col("event_id").as("seq"), col("user_id"), col("event_type")),
    oracle = Some(
      """SELECT event_id AS seq, user_id, event_type FROM events
        |WHERE ((event_id % 1000003) * 2654435761) % 97 < 5""".stripMargin))

  /** Q:array_membership (C7/C8): array_contains / array_remove over document
    * token arrays (sliceContains utils.go:110-117; sliceRemove's *intended*
    * semantics, utils.go:119-130 — the reference version drops its result).
    */
  val arrayMembership = GQuery(
    "array_membership",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          filter(split(col("text"), " "), w => w =!= "").as("tokens"))
      toks.select(
        col("doc_id"),
        array_contains(col("tokens"), "spark").as("has_spark"),
        // array_size, not size: size(NULL) flips -1/NULL with the ANSI
        // conf; array_size null-propagates either way (= oracle len())
        array_size(col("tokens")).as("n_tokens"),
        array_size(array_remove(col("tokens"), "the")).as("n_after_remove"))
    },
    oracle = Some(
      """SELECT doc_id, list_contains(toks, 'spark') AS has_spark,
        |       len(toks) AS n_tokens,
        |       len(list_filter(toks, w -> w <> 'the')) AS n_after_remove
        |FROM (SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS toks
        |      FROM documents)""".stripMargin))

  /** Q:prefix_filter (C12/F7): startswith-based ownership dedup
    * (event.go:97-98,165-166) — bombs whose name carries the random- prefix
    * convention vs. owned bombs.
    */
  val prefixFilter = GQuery(
    "prefix_filter",
    (s, d) =>
      bombs(s, d)
        .withColumn("display_name",
          when(col("bomb_seq") % 5 === 0,
            concat(lit("random-"), col("bomb_name"))).otherwise(col("bomb_name")))
        .filter(col("display_name").startsWith("random-"))
        .select(col("display_name"), col("owner"), col("cell")),
    oracle = Some(
      s"""$GridCte
         |SELECT 'random-' || bomb_name AS display_name, owner, cell
         |FROM b2 WHERE bomb_seq % 5 = 0""".stripMargin))

  /** Q:join_killer_owner (J3/C11): killer attribution by parsing the bomb
    * owner out of `{owner}-{suffix}` (game.go:244) and joining back to the
    * player roster — the lookup the reference does against nameToPlayers.
    */
  val joinKillerOwner = GQuery(
    "join_killer_owner",
    (s, d) => {
      val bombOwners = bombs(s, d)
        .select(substring_index(col("bomb_name"), "-", 1).as("owner_parsed"))
      players(s, d)
        .join(bombOwners, col("player") === col("owner_parsed"))
        .groupBy("player", "px", "py")
        .agg(count(lit(1)).as("n_bombs"))
    },
    oracle = Some(
      s"""$GridCte
         |SELECT p.player, p.px, p.py, count(*) AS n_bombs
         |FROM players p
         |JOIN (SELECT string_split(bomb_name, '-')[1] AS owner_parsed FROM b2) b
         |  ON p.player = b.owner_parsed
         |GROUP BY p.player, p.px, p.py""".stripMargin))

  /** Q:map_regen_grid (ST3's derivation, driver-checked): the periodic
    * map-regen job's deterministic obstacle grids for the first 16 firings
    * of a 5-tick interval, exploded to one row per (tick, slot). Runs the
    * SAME generator the streaming job uses (EventStream.mapRegenEvents —
    * polyhash-derived codes, +1-shifted sign encoding), so the oracle pins
    * the production derivation, not a test twin.
    */
  val mapRegenGrid = GQuery(
    "map_regen_grid",
    (s, _) => {
      val ticks = s.range(0, 80, 5).toDF("value")
      graft.streaming.EventStream.mapRegenEvents(ticks)
        .select(col("tick"),
          posexplode(col("list")).as(Seq("pos", "code")))
        .select(col("tick"), col("pos").cast("long").as("pos"),
          col("code").cast("long").as("code"))
    },
    oracle = Some {
      val h1 = DedupOps.tkDuck("CAST(tick AS VARCHAR) || ':' || CAST(pos AS VARCHAR)")
      val h2 = DedupOps.tkDuck("CAST(tick AS VARCHAR) || ':' || CAST(pos AS VARCHAR) || ':d'")
      s"""WITH g AS (
         |  SELECT t.tick, i.pos, $h1 AS h1, $h2 AS h2
         |  FROM (SELECT unnest(generate_series(0, 75, 5)) AS tick) t
         |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS pos) i)
         |SELECT CAST(tick AS BIGINT) AS tick, CAST(pos AS BIGINT) AS pos,
         |       CAST(CASE WHEN h2 % 2 = 0 THEN h1 % 750 + 1
         |                 ELSE -(h1 % 750 + 1) END AS BIGINT) AS code
         |FROM g""".stripMargin
    })

  val queries: Seq[GQuery] = Seq(
    flameCellsQ, flameBlockingQ, joinDeathAttribution, antiJoinSpawnClear,
    antiJoinOccupied, encodeDecodeRoundtrip, nextPosition, filterBounds,
    obstacleDensity, obstacleListExplode, sampleHashBernoulli, arrayMembership,
    prefixFilter, joinKillerOwner, genIdSuffix, mapRegenGrid)
}
