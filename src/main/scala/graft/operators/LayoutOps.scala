package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._

/** Physical-layout operators: the write-side clustering a 100 TB table
  * needs so the read side can prune. A z-order (Morton) sort key
  * interleaves the bits of two filter columns; files written in z-order
  * carry small bounding boxes on BOTH columns simultaneously, so min/max
  * file statistics prune two-dimensional predicates — the standard
  * data-layout trick (Delta/Iceberg OPTIMIZE ZORDER) that a plain sort
  * gives only to its leading column.
  */
object LayoutOps {

  /** Bits interleaved per dimension. 31 covers every positive INT key
    * (TPC-H partkey reaches 20M at sf100 — past 16 or even 21 bits), and
    * 2·31 = 62 interleaved bits still fit a signed BIGINT exactly. Keys
    * at or above 1L<<ZBits would silently alias into the same z-bucket,
    * so the width must dominate the key domain — which 31 bits does for
    * any int-keyed table. */
  final val ZBits = 31

  /** Buckets the z-range divides into — stand-ins for output files. */
  final val ZBuckets = 64

  /** The Morton interleave as pure integer SQL, generated per engine
    * dialect (Spark spells bit shifts as functions, DuckDB as operators;
    * the arithmetic is identical and exact). x takes even bit positions,
    * y odd. */
  private def zSpark(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"shiftleft(shiftright(CAST($x AS BIGINT), $i) & 1, ${2 * i}) + " +
        s"shiftleft(shiftright(CAST($y AS BIGINT), $i) & 1, ${2 * i + 1})"
    }.mkString(" + ")

  private def zDuck(x: String, y: String): String =
    (0 until ZBits).map { i =>
      s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i}) + " +
        s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Raw Morton codes over any (l_partkey, l_suppkey) frame — the test
    * seam, and the single place the interleave select lives. */
  private[graft] def zCodes(df: org.apache.spark.sql.DataFrame) =
    df.select(col("l_partkey"), col("l_suppkey"),
      expr(zSpark("l_partkey", "l_suppkey")).as("z"))

  /** Per-bucket z-width from the OBSERVED max code, not the static 2⁶²
    * domain: `max(z) div ZBuckets + 1`. A static width (2⁶²/64 = 2⁵⁶)
    * collapses every realistic key scale into bucket 0 — any pair below
    * 2²⁸ z-codes under 2⁵⁶, and TPC-H partkey reaches only 2·10⁷ at
    * sf100 — which makes the clustering audit vacuous (one full-domain
    * bbox), the same silent-degeneration class as the round-11 empty
    * graph bench. The `+1` (rather than a greatest(…,1) floor) keeps the
    * bucket index strictly below ZBuckets: w = ⌊m/64⌋+1 > m/64 ⇒
    * ⌊m/w⌋ ≤ 63 for every z ≤ m, so all indices land in [0, 64) and the
    * full bucket range is exercised at ANY key scale — while ZBits=31
    * still guards the interleave itself against >2¹⁶ key aliasing. */
  private val WidthSpark = s"(max(z) div $ZBuckets + 1)"
  private val WidthDuck = s"((SELECT max(z) // $ZBuckets + 1 FROM z))"

  /** Q:layout_zorder_stats — the clustering-quality readout of a z-order
    * layout: bucket lineitem by the Morton code of (partkey, suppkey)
    * and emit each bucket's row count and per-column bounding box plus
    * its area — the quantity file-skipping actually depends on (a point
    * predicate touches only buckets whose box contains it; box area ∝
    * expected false-positive scans). Row-local integer arithmetic, a
    * 1-row width aggregate broadcast back over the codes, and ONE
    * bucket-keyed aggregate; at 100 TB this same query is the
    * post-OPTIMIZE audit that tells you whether re-sorting bought
    * anything. The interleave is exact in both engines, so the stats
    * hash-match.
    */
  private[graft] def zorderStats(df: org.apache.spark.sql.DataFrame) = {
    val z = zCodes(df)
    // the observed-range width is a 1-row broadcast (the audit's second
    // scan touches the same two pruned int columns — cheap even at 100 TB)
    val width = z.agg(expr(WidthSpark).as("zw"))
    z.crossJoin(broadcast(width))
      .groupBy(expr("CAST(z div zw AS BIGINT)").as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"))
      .withColumn("bbox_area",
        (col("max_pk") - col("min_pk") + 1) *
          (col("max_sk") - col("min_sk") + 1))
  }

  val layoutZorderStats = GQuery(
    "layout_zorder_stats",
    (s, d) => zorderStats(Tables.lineitem(s, d)),
    oracle = Some(
      s"""WITH z AS (SELECT l_partkey, l_suppkey,
        |                  ${zDuck("l_partkey", "l_suppkey")} AS z
        |           FROM lineitem)
        |SELECT z // $WidthDuck AS zbucket, count(*) AS n,
        |       min(l_partkey) AS min_pk, max(l_partkey) AS max_pk,
        |       min(l_suppkey) AS min_sk, max(l_suppkey) AS max_sk,
        |       (max(l_partkey) - min(l_partkey) + 1) *
        |       (max(l_suppkey) - min(l_suppkey) + 1) AS bbox_area
        |FROM z GROUP BY 1""".stripMargin))

  val queries: Seq[GQuery] = Seq(layoutZorderStats)
}
