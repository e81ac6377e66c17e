package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the event log's user-interaction structure. The
  * dedup family already covers undirected connected components
  * (DedupOps large-star/small-star); this adds the other classic
  * iterative graph computation — PageRank — over a directed graph derived
  * from the events table, with EVERY intermediate in integer arithmetic
  * so three full iterations replay bit-identically in DuckDB.
  *
  * Edge derivation (temporal adjacency): per item `k` (the props key each
  * event touches), order that item's distinct users by first-touch time
  * and link each user to the NEXT one — the "who follows whom onto an
  * item" chain. Edge count is Σ_items (distinct_users − 1): LINEAR in the
  * interaction log, unlike a co-occurrence projection whose hot items
  * explode quadratically (the same reason the LSH family caps buckets).
  */
object GraphOps {

  /** Fixed iteration count — enough for rank mass to propagate two hops
    * past the damping base, small enough that the unrolled oracle CTE
    * chain stays readable. */
  final val PrIters = 3

  /** Scaled-integer PageRank constants: ranks carry [[PrUnit]] units; the
    * damping split is (1−d)·PrUnit base + d of in-flow with
    * d = [[PrDampNum]]/[[PrDampDen]]. Per-edge contribution
    * `(r · PrDampNum) div (outdeg · PrDampDen)` floor-divides BEFORE the
    * sum, so the total is a sum of integers — order-independent, hence
    * reproducible across engines and partitionings. Everything downstream
    * (the engine loop, the unrolled oracle, SketchScaleSmoke) derives from
    * these three constants, so changing one cannot desynchronize them. */
  final val PrUnit = 1000000L
  final val PrDampNum = 85L
  final val PrDampDen = 100L

  /** Damping base (1−d)·PrUnit, derived — 150000 at the defaults. */
  final val PrBase = PrUnit * (PrDampDen - PrDampNum) / PrDampDen

  /** Directed temporal-adjacency edges (src, dst), deduplicated. The
    * first-touch aggregate is map-side combinable on (item, user); the
    * per-item chain window's partition is bounded by the item's distinct
    * users (items parallelize across the corpus; a single pathologically
    * hot item is the same declared sequential-log assumption as the
    * per-room running windows, PLANS.md header). */
  def temporalEdges(events: DataFrame): DataFrame = {
    val iu = events
      .select(get_json_object(col("props"), "$.k").cast("long").as("item"),
        col("user_id"), col("ts"))
      .groupBy("item", "user_id")
      .agg(min("ts").as("t0"))
    iu.withColumn("dst",
        lead("user_id", 1).over(
          Window.partitionBy("item").orderBy("t0", "user_id")))
      .filter(col("dst").isNotNull)
      .select(col("user_id").as("src"), col("dst"))
      .distinct()
  }

  /** [[PrIters]] PageRank iterations over [[temporalEdges]]. Each
    * iteration is one user-keyed join (ranks onto edge sources) and one
    * map-side-combinable sum onto destinations; nodes with no in-edges
    * keep the damping base via the left join. The edge frame is
    * materialized ONCE (localCheckpoint — executor-local storage, no
    * driver collect), exactly what a 100 TB run does: without it every
    * iteration re-derives the first-touch aggregate and chain window,
    * tripling the shuffle count of the unrolled plan.
    */
  def pagerank(events: DataFrame): DataFrame =
    ranks(temporalEdges(events).localCheckpoint())
      .orderBy(col("r").desc, col("u"))
      .limit(10)
      .select(col("u").as("user_id"), col("r").as("rank_e6"))

  /** Full rank frame (u, r) after [[PrIters]] iterations over an edge
    * frame (src, dst) — the distributed loop, separated from the edge
    * derivation and the final top-k so properties can check it
    * differentially on arbitrary graphs. */
  private[graft] def ranks(ed: DataFrame): DataFrame = {
    val nodes = ed.select(col("src").as("u"))
      .union(ed.select(col("dst").as("u"))).distinct()
    val od = ed.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var r = nodes.withColumn("r", lit(PrUnit))
    for (_ <- 1 to PrIters) {
      val contrib = ed.join(od, "src")
        .join(r.withColumnRenamed("u", "src"), "src")
        .select(col("dst").as("u"),
          expr(s"(r * $PrDampNum) div (outdeg * $PrDampDen)").as("c"))
        .groupBy("u").agg(sum("c").as("c"))
      r = nodes.join(contrib, Seq("u"), "left")
        .select(col("u"),
          (lit(PrBase) + coalesce(col("c"), lit(0L))).as("r"))
    }
    r
  }

  /** The temporal-adjacency edge derivation as a CTE prefix — shared
    * VERBATIM by both graph oracles so they can never describe different
    * edge sets. */
  private val EdgeCte =
    """iu AS (SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item,
      |                  user_id, min(ts) AS t0
      |           FROM events GROUP BY 1, 2),
      |ch AS (SELECT item, user_id AS src,
      |              lead(user_id) OVER (PARTITION BY item
      |                                  ORDER BY t0, user_id) AS dst
      |       FROM iu),
      |ed AS (SELECT DISTINCT src, dst FROM ch WHERE dst IS NOT NULL)""".stripMargin

  /** The [[PrIters]] iterations unrolled as CTE pairs (cᵢ, rᵢ), generated
    * from the SAME constants the engine loop uses — iteration count, the
    * damping fraction, and the base can no longer drift between the two
    * engines. */
  private def iterCtes: String = (1 to PrIters).map { i =>
    s"""c$i AS (SELECT ed.dst AS u,
       |              CAST(sum((r${i - 1}.r * $PrDampNum) // (od.outdeg * $PrDampDen)) AS BIGINT) AS c
       |       FROM ed JOIN od ON ed.src = od.src JOIN r${i - 1} ON r${i - 1}.u = ed.src
       |       GROUP BY 1),
       |r$i AS (SELECT n.u, $PrBase + COALESCE(c$i.c, 0) AS r
       |       FROM nodes n LEFT JOIN c$i ON c$i.u = n.u)""".stripMargin
  }.mkString(",\n")

  val graphPagerank = GQuery(
    "graph_pagerank",
    (s, d) => pagerank(Tables.events(s, d)),
    oracle = Some(
      s"""WITH $EdgeCte,
        |nodes AS (SELECT src AS u FROM ed UNION SELECT dst FROM ed),
        |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM ed GROUP BY 1),
        |r0 AS (SELECT u, CAST($PrUnit AS BIGINT) AS r FROM nodes),
        |$iterCtes
        |SELECT u AS user_id, r AS rank_e6 FROM r$PrIters
        |ORDER BY r DESC, u LIMIT 10""".stripMargin),
    bench = true)

  /** Connected components over the SAME temporal-adjacency edges —
    * [[DedupOps.starComponents]] (large-star/small-star, O(log n)
    * rounds, digest-gated convergence) applied to the interaction graph
    * instead of the near-dup pair graph: "which users belong to the same
    * interaction community" next to PageRank's "who matters inside it".
    * Direction is irrelevant to components, so the edge frame feeds the
    * star loop as undirected pairs; the oracle is the same recursive
    * closure CTE shape as `dedup_clusters`.
    */
  /** (user_id, rep, csize) component labels over [[temporalEdges]]. */
  def components(events: DataFrame): DataFrame = {
    val ed = temporalEdges(events)
      .select(col("src").as("doc_a"), col("dst").as("doc_b"))
    val labels = DedupOps.starComponents(ed)
    val sizes = labels.groupBy("rep").agg(count(lit(1)).as("csize"))
    labels.join(sizes, Seq("rep"))
      .select(col("doc_id").as("user_id"), col("rep"), col("csize"))
  }

  val graphComponents = GQuery(
    "graph_components",
    (s, d) => components(Tables.events(s, d)),
    oracle = Some(
      s"""WITH RECURSIVE $EdgeCte,
        |edges AS (
        |  SELECT src, dst FROM ed
        |  UNION SELECT dst, src FROM ed),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (
        |  SELECT src AS user_id, least(src, min(dst)) AS rep
        |  FROM reach GROUP BY src),
        |repsizes AS (SELECT rep, CAST(count(*) AS BIGINT) AS csize
        |             FROM comp GROUP BY rep)
        |SELECT c.user_id, c.rep, s.csize
        |FROM comp c JOIN repsizes s ON c.rep = s.rep""".stripMargin))

  val queries: Seq[GQuery] = Seq(graphPagerank, graphComponents)
}
