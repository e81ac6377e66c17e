package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (builder-prompt extension set). Three tiers:
  *
  *  1. brute-force cosine top-k — the exact baseline; fine when the query
  *     set is small (queries broadcast against the corpus scan);
  *  2. IVF-style partition-restricted top-k — the corpus is pre-bucketed by a
  *     coarse quantizer (here: the provided `label` column standing in for a
  *     k-means centroid assignment); search touches one partition;
  *  3. random-hyperplane LSH buckets — sign-bit signatures over fixed integer
  *     hyperplanes; search touches one hash bucket. Sub-linear, recall < 1
  *     by design.
  *
  * All arithmetic is double-precision with deterministic integer hyperplanes,
  * so DuckDB reproduces every score bit-for-bit (rounded to 4 decimals).
  */
object SimilarityOps {

  val TopK = 10
  val PerQueryK = 5
  val NumQueries = 10 // query set = vec_id < 10
  val NumPlanes = 8

  /** Hyperplane component: k = p·64+i mixed through two QUADRATIC rounds
    * mod the Mersenne prime 2³¹−1, then folded to [−1000, 1000] —
    * integer-valued pseudo-random planes, identical in both engines.
    *
    * Why quadratic (round 13): the original linear form
    * (k·2654435761 mod 2001) made every plane an arithmetic progression
    * mod 2001 and CONSECUTIVE PLANES correlated — harmless at the
    * testbed's r=8/4k-vector scale, but at the r=16 parameterization a
    * 1M-row smoke (tools/AnnScaleSmoke) measured 25% of all rows landing
    * in cap-dropped hot buckets (max bucket 1571 where random planes give
    * 35) and planted recall 18pp below sign-LSH theory. The squaring
    * breaks the linear lattice: with mixed planes the same smoke measures
    * zero capped buckets and recall on theory. Every intermediate is
    * < 2⁶² so the arithmetic is exact in Spark longs AND DuckDB BIGINTs
    * (no wrap on one side vs promote/error on the other).
    *
    * Enters the Spark plan as ONE referenced array literal (same trick as
    * KMeansOps.withCid), so the projection is a compiled graft_dot loop —
    * the former transform(sequence)/zip_with/aggregate HOF chain ran every
    * row through interpreted lambdas, ~25× slower.
    */
  private def planeLit(p: Int): Seq[Double] =
    (0 until 64).map { i =>
      val M = 2147483647L // 2^31 − 1
      val k = (p * 64 + i).toLong
      val x0 = (k * 2654435761L) % M
      val x1 = (x0 * x0 + 1234567L) % M
      val x2 = (x1 * x1 + 7654321L) % M
      (x2 % 2001 - 1000).toDouble
    }

  private def planeDuck(p: Int): String = {
    val k = s"($p * 64 + i)"
    val x0 = s"(($k * 2654435761) % 2147483647)"
    val x1 = s"(($x0 * $x0 + 1234567) % 2147483647)"
    val x2 = s"(($x1 * $x1 + 7654321) % 2147483647)"
    s"list_transform(generate_series(0, 63), i -> ($x2 % 2001 - 1000)::DOUBLE)"
  }

  /** Sign-LSH bucket id over the normalized `v` column — row-local; shared
    * by ann_lsh_bucket and the dedup_embedding_lsh scale path. graft_dot
    * reproduces the oracle's left-to-right list_sum order, so the > 0 sign
    * test is bit-identical in both engines.
    */
  private[graft] def withBucket(e: DataFrame): DataFrame =
    withBandBucket(e, 0, NumPlanes, "bucket")

  /** One band's bucket: r sign bits over planes band·r .. band·r+r−1,
    * packed into a Long. Row-local compiled projection (one graft_dot per
    * plane against a referenced literal).
    */
  private[graft] def withBandBucket(
      e: DataFrame, band: Int, r: Int, colName: String): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(e.sparkSession)
    e.withColumn(colName,
      (0 until r).map { i =>
        when(call_function("graft_dot", col("v"), typedLit(planeLit(band * r + i))) > 0,
          lit(1L << i)).otherwise(0L)
      }.reduce(_ + _))
  }

  /** The DuckDB twin of [[withBandBucket]]. */
  private[graft] def bandBucketDuck(band: Int, r: Int): String =
    (0 until r).map { i =>
      s"(CASE WHEN list_sum(list_transform(generate_series(1, 64), " +
        s"j -> v[j] * (${planeDuck(band * r + i)})[j])) > 0 THEN 1::BIGINT << $i ELSE 0 END)"
    }.mkString(" + ")

  /** The DuckDB twin of [[withBucket]]'s bucket expression — delegates to
    * the band form exactly as withBucket delegates to withBandBucket, so
    * the two generators cannot drift. */
  private[operators] def bucketDuck: String = bandBucketDuck(0, NumPlanes)

  private val VecCte =
    """WITH e AS (
      |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v,
      |         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |  FROM embeddings
      |  WHERE len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0
      |    AND NOT isnan(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
    AND list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) < CAST('Infinity' AS DOUBLE)
    AND list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) > 0)""".stripMargin

  // one normalization + one cosine definition, shared with the dedup path
  private def vecs(s: SparkSession, d: String): DataFrame =
    DedupOps.normalizedVecs(s, d)

  private def cosAB: Column = DedupOps.cosExpr()

  /** Per-query exact top-k via the fused graft_cosine_topk aggregate
    * (CosineTopKAggregate): a bounded k-heap per group with map-side partial
    * merge — only k rows per query cross the shuffle, where the former
    * `row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, id)`
    * shuffled and sorted the ENTIRE candidate set. Same deterministic order
    * (cos DESC, neighbor_id ASC), so oracles are unchanged.
    *
    * @param scored (groupCols..., neighbor_id, cos)
    * @param groupCols grouping keys (query_id, plus bucket for the LSH form)
    */
  private[operators] def topkPerQuery(scored: DataFrame, k: Int,
                                      groupCols: Seq[String]): DataFrame = {
    graft.functions.CosineTopKAggregate.ensureRegistered(scored.sparkSession)
    scored
      .groupBy(groupCols.map(col): _*)
      .agg(expr(s"graft_cosine_topk(cos, neighbor_id, $k)").as("topk"))
      .select(groupCols.map(col) :+ posexplode(col("topk")).as(Seq("pos", "kv")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("kv.id").as("neighbor_id"),
        round(col("kv.score"), 4).as("cosine"),
        (col("pos") + 1).cast("long").as("rank")): _*)
  }

  /** Q:ann_cosine_topk — exact top-10 neighbors of query vec_id=0.
    * Plan shape: broadcast the single query row, scan the corpus once,
    * TakeOrderedAndProject for the top-k (no global sort).
    */
  val annCosineTopk = GQuery(
    "ann_cosine_topk",
    (s, d) => {
      val e = vecs(s, d)
      val q = broadcast(e.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nrm").as("qnrm")))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(q)
        .withColumn("cos", expr("graft_dot(v, qv)") / (col("nrm") * col("qnrm")))
        .orderBy(desc("cos"), asc("vec_id"))
        .limit(TopK)
        .select(col("vec_id"), round(col("cos"), 4).as("cosine"))
    },
    oracle = Some(
      s"""$VecCte
         |SELECT b.vec_id,
         |       round(list_sum(list_transform(generate_series(1, len(a.v)),
         |             i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 4) AS cosine
         |FROM e a JOIN e b ON a.vec_id = 0 AND b.vec_id <> 0
         |ORDER BY list_sum(list_transform(generate_series(1, len(a.v)),
         |         i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) DESC, b.vec_id
         |LIMIT $TopK""".stripMargin),
    bench = true)

  /** Q:ann_topk_per_query — exact top-5 per query (vec_id<10). The query
    * side broadcasts; ranking is the fused graft_cosine_topk aggregate (no
    * window — k rows per query cross the shuffle).
    */
  val annTopkPerQuery = GQuery(
    "ann_topk_per_query",
    (s, d) => {
      val e = vecs(s, d)
      val q = broadcast(e.filter(col("vec_id") < NumQueries).as("a"))
      val scored = q
        .join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .withColumn("cos", cosAB)
        .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
          col("cos"))
      topkPerQuery(scored, PerQueryK, Seq("query_id"))
    },
    oracle = Some(
      s"""$VecCte,
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |         list_sum(list_transform(generate_series(1, len(a.v)),
         |           i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) AS cos
         |  FROM e a JOIN e b ON a.vec_id < $NumQueries AND a.vec_id <> b.vec_id)
         |SELECT query_id, neighbor_id, round(cos, 4) AS cosine,
         |       CAST(rank AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |               ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM scored)
         |WHERE rank <= $PerQueryK""".stripMargin),
    bench = true)

  /** Q:ann_ivf_label_topk — IVF scale path: search only the query's coarse
    * partition (label = centroid assignment). At 100 TB the corpus is
    * bucketed/partitioned by centroid id, so each query reads one partition
    * instead of the full scan.
    *
    * Recall contract: nprobe=1 — a true neighbor whose assignment differs
    * from the query's is missed; recall < 1 by design. The trained-index
    * family (KMeansOps) carries the recall knob: `ann_ivf_nprobe2_topk`
    * probes the two nearest cells.
    */
  val annIvfLabelTopk = GQuery(
    "ann_ivf_label_topk",
    (s, d) => {
      val e = vecs(s, d)
      val q = broadcast(e.filter(col("vec_id") < NumQueries).as("a"))
      val scored = q
        .join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
        .withColumn("cos", cosAB)
        .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
          col("cos"))
      topkPerQuery(scored, PerQueryK, Seq("query_id"))
    },
    oracle = Some(
      s"""$VecCte,
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         |         list_sum(list_transform(generate_series(1, len(a.v)),
         |           i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) AS cos
         |  FROM e a JOIN e b ON a.vec_id < $NumQueries AND a.label = b.label
         |                   AND a.vec_id <> b.vec_id)
         |SELECT query_id, neighbor_id, round(cos, 4) AS cosine,
         |       CAST(rank AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |               ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM scored)
         |WHERE rank <= $PerQueryK""".stripMargin))

  /** Q:ann_lsh_bucket — random-hyperplane signatures: 8 sign bits → bucket
    * id; neighbors searched within the query's bucket only. Emits per-query
    * top-3 found in-bucket (approximate: recall < 1 by design).
    */
  val annLshBucket = GQuery(
    "ann_lsh_bucket",
    (s, d) => {
      val bucketed = withBucket(vecs(s, d))
      val q = broadcast(bucketed.filter(col("vec_id") < NumQueries).as("a"))
      val scored = q
        .join(bucketed.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
        .withColumn("cos", cosAB)
        .select(col("a.vec_id").as("query_id"), col("a.bucket").as("bucket"),
          col("b.vec_id").as("neighbor_id"), col("cos"))
      // bucket is functionally dependent on query_id — grouping by both
      // keeps it in the output without a join back
      topkPerQuery(scored, 3, Seq("query_id", "bucket"))
    },
    oracle = Some {
      s"""$VecCte,
         |wb AS (SELECT vec_id, v, nrm, $bucketDuck AS bucket FROM e),
         |scored AS (
         |  SELECT a.vec_id AS query_id, a.bucket AS bucket,
         |         b.vec_id AS neighbor_id,
         |         list_sum(list_transform(generate_series(1, len(a.v)),
         |           i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm) AS cos
         |  FROM wb a JOIN wb b ON a.vec_id < $NumQueries
         |                     AND a.bucket = b.bucket AND a.vec_id <> b.vec_id)
         |SELECT query_id, bucket, neighbor_id, round(cos, 4) AS cosine,
         |       CAST(rank AS BIGINT) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |               ORDER BY cos DESC, neighbor_id) AS rank
         |      FROM scored)
         |WHERE rank <= 3""".stripMargin
    })

  /** Q:ann_quantized_topk — top-10 neighbors of vec_id=0 scored on int8
    * scalar-quantized codes (graft_q8: c[i] = floor(v[i]·127/max|v|)).
    * The memory-bandwidth tier UNDER the IVF/LSH paths: at 100 TB the
    * index answers "which vectors to look at" and quantization answers
    * "how cheaply can we score them" — codes are 4 bytes/dim here only
    * because DotProduct scores doubles; a production sink packs them to 1
    * byte/dim, an 8× scan-bandwidth cut with the SAME plan shape. Every
    * arithmetic step (floor-quantize, integer-valued code dot) is exact
    * in both engines, so unlike the rounded-cosine queries this one
    * hash-matches on raw scores; ties in the integer dot are broken by
    * vec_id. Plan shape = ann_cosine_topk: broadcast 1-row query,
    * one corpus scan, TakeOrderedAndProject.
    */
  val annQuantizedTopk = GQuery(
    "ann_quantized_topk",
    (s, d) => {
      val e = vecs(s, d).withColumn("c", expr("graft_q8(v)"))
      val q = broadcast(e.filter(col("vec_id") === 0)
        .select(col("c").as("qc")))
      e.filter(col("vec_id") =!= 0)
        .crossJoin(q)
        .withColumn("qdot", expr("CAST(graft_dot(c, qc) AS BIGINT)"))
        .orderBy(desc("qdot"), asc("vec_id"))
        .limit(TopK)
        .select(col("vec_id"), col("qdot"))
    },
    oracle = Some(
      s"""$VecCte,
         |q AS (SELECT vec_id, v,
         |             list_max(list_transform(v, x -> abs(x))) AS s
         |      FROM e),
         |c AS (SELECT vec_id,
         |             list_transform(v, x -> CASE WHEN s > 0
         |               THEN floor(x * 127 / s) ELSE 0.0 END) AS c
         |      FROM q)
         |SELECT b.vec_id,
         |       CAST(list_sum(list_transform(generate_series(1, len(a.c)),
         |            i -> a.c[i] * b.c[i])) AS BIGINT) AS qdot
         |FROM c a JOIN c b ON a.vec_id = 0 AND b.vec_id <> 0
         |ORDER BY qdot DESC, b.vec_id
         |LIMIT $TopK""".stripMargin),
    bench = true)

  /** Q:fuzzy_name_pairs — edit-distance-1 record linkage over customer
    * names via the DELETION-NEIGHBORHOOD join (the spell-checker /
    * entity-resolution trick): each name emits itself plus its |name|
    * single-character deletions as join keys — two names within one
    * edit (insert, delete, OR substitute: same-position deletions
    * collide) share a key, so candidates come from a co-keyed equi-join
    * instead of the O(n²) all-pairs levenshtein the oracle replays.
    * Exact levenshtein then verifies candidates (few per name). Scale
    * posture: keys per name = |name|+1 (linear blowup); a key's bucket
    * is bounded by the alphabet size at the deleted position (≤ ~10
    * sibling digits here), so no hot key exists by construction — the
    * candidate join stays co-keyed and skew-free at any corpus size.
    */
  def fuzzyPairs(names: DataFrame): DataFrame = {
    // r19 (guide §8 — use what you know that the optimizer does not):
    // carrying the DELETION POSITION makes the candidate classes exact,
    // so the levenshtein verification kernel — formerly ~18 CPU-seconds
    // at sf0.1, the whole cost of this query — disappears:
    //  - (pos 0, pos j) or (pos i, pos 0): one name IS the other's
    //    single-character deletion ⇒ distance exactly 1;
    //  - (pos i, pos i): del_i(a) = del_i(b) forces prefix and suffix
    //    equality, so a and b differ at most at position i ⇒ a
    //    substitution, distance exactly 1 (they are distinct names);
    //  - (pos i, pos j), i ≠ j, is ONLY reachable for pairs at distance
    //    2 — any true distance-1 pair is a substitution (caught at
    //    i = j) or an insert/delete (caught against the full-name key) —
    //    so the class is dropped inside the join predicate and never
    //    materializes.
    // The key frame keeps duplicate deletion keys (no array_union: the
    // position matters now); a repeated-character name contributes the
    // same (key, i)/(key, i+1) rows whose pairs all fall in the i = j
    // class and collapse in the closing distinct.
    //
    // Explicit-count hash repartition on the join key, both sides
    // (guide §2.4): the two sides are the SAME canonical subtree +
    // partitioning, so AQE ReuseExchange computes the
    // scan→distinct→explode derivation once and reads it twice, and an
    // explicit numPartitions keeps AQE byte-based coalescing from
    // folding the candidate join to one task. The count is the session's
    // configured shuffle parallelism — the cluster-tuned knob, not a
    // local constant.
    val np = graft.Materialize.shuffleParallelism(names.sparkSession)
    val keys = names
      .select(col("name"), posexplode(expr(
        """concat(array(name),
          |  transform(sequence(1, length(name)),
          |    i -> concat(substring(name, 1, i - 1),
          |                substring(name, i + 1, length(name)))))"""
          .stripMargin)).as(Seq("pos", "key")))
      .repartition(np, col("key"))
    keys.as("a")
      // shuffle_hash, not broadcast: the key frame is CORPUS-DERIVED
      // (|name|+1 rows per name), exactly the frame the rest of the repo
      // refuses to assume broadcastable — and empirically the broadcast
      // plan is 3.5× slower here even at bench scale (FuzzProbe round-10:
      // 8.9 s vs 2.5 s at sf0.1)
      .hint("shuffle_hash")
      .join(keys.as("b"),
        col("a.key") === col("b.key") && col("a.name") < col("b.name") &&
          (col("a.pos") === 0 || col("b.pos") === 0 ||
            col("a.pos") === col("b.pos")))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
      .distinct()
  }

  val fuzzyNamePairs = GQuery(
    "fuzzy_name_pairs",
    (s, d) =>
      fuzzyPairs(Tables.customer(s, d).select(col("c_name").as("name")).distinct()),
    oracle = Some(
      """WITH w AS (SELECT DISTINCT c_name AS name FROM customer)
        |SELECT a.name AS name_a, b.name AS name_b
        |FROM w a JOIN w b
        |  ON a.name < b.name AND levenshtein(a.name, b.name) <= 1""".stripMargin),
    bench = true)

  val queries: Seq[GQuery] = Seq(
    annCosineTopk, annTopkPerQuery, annIvfLabelTopk, annLshBucket,
    annQuantizedTopk, fuzzyNamePairs)
}
