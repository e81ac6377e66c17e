package graft.operators

import graft.{GQuery, Materialize}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization — the ANN family's 100-TB MEMORY tier.
  *
  * The family's existing tiers answer "which vectors to look at" (trained
  * IVF cells, LSH buckets) and "how cheaply can we score a candidate"
  * (int8 scalar codes, 8× scan bandwidth). PQ is the tier under both: the
  * 64-dim vector is split into [[M]] contiguous sub-spaces of [[SubDims]]
  * dims, each sub-space gets its own Lloyd-trained codebook
  * ([[KMeansOps.lloyd]] — the SAME memoized, artifact-persisted,
  * integer-exact trainer the IVF index uses, keyed per sub-space), and a
  * vector is stored as M small codebook indices. At the registry's
  * k = 8 that is 4 × 3 bits; at the production parameterization
  * (m = 8 × k = 256, [[graft.tools.PqScaleSmoke]] — the sub-space
  * geometry is a parameter) it is 8 bytes per vector versus 512 for
  * float64×64 — a 64× memory cut, which is what makes a 100-TB corpus
  * scorable from RAM-resident codes at all.
  *
  * Search is asymmetric distance computation (ADC; Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011): the
  * QUERY stays un-coded, and dot(q, x) is approximated by
  * Σ_j dot(q_subj, codebook_j[code_j(x)]). Per candidate row that is M
  * table lookups and adds — the corpus scan never touches the original
  * vectors. Here the per-row form keeps every codebook as ONE referenced
  * literal matrix (`element_at` against a typedLit — the
  * KMeansOps.compCols trick), so the scoring projection compiles once and
  * reads only the M code columns.
  *
  * Every step is exact integer arithmetic on the e4-quantized grid
  * (qv = floor(v·10⁴), the [[KMeansOps]] exactness argument): training is
  * the shared integer Lloyd, codes are integer argmins, and the ADC score
  * Σ qv_q[i]·cv[i] has per-term magnitude ≤ ~3.6·10⁹ and 64 terms — far
  * under 2⁵³, so the double-arithmetic graft_dot equals DuckDB's BIGINT
  * sum bit-for-bit and the oracle hash-matches on RAW scores (no
  * rounding), ties broken by vec_id.
  *
  * Scale posture: training passes the staged corpus once per (sub-space ×
  * iteration) here because the testbed oracle must replay it exactly; at
  * 100 TB the codebook — like any PQ deployment — trains on a bounded
  * sample (the smoke trains on a hash-Bernoulli slice and encodes the
  * full corpus in one projection), and encoding/searching are single
  * row-local passes. Nothing row-sized reaches the driver: the collected
  * model is M·k·SubDims longs.
  */
object PqOps {

  /** Sub-space count × width; M·SubDims must equal KMeansOps.Dims. */
  val M = 4
  val SubDims = 16
  /** Codebook entries per sub-space (shares KMeansOps.K so the testbed
    * oracle's unrolled Lloyd stays 8-way) and training depth (2 keeps the
    * 4-sub-space oracle chain within reason; the smoke trains deeper). */
  val K: Int = KMeansOps.K
  val PqIters = 2
  private val CompBase = KMeansOps.CompBase

  /** The sub-space j slice of a [[KMeansOps.quantized]] frame, renamed to
    * the (qv, qvd, qq, qvx) contract [[KMeansOps.lloyd]] trains on. */
  private[graft] def subPts(base: DataFrame, j: Int,
                            subDims: Int = SubDims): DataFrame =
    base.select(col("vec_id"),
        slice(col("qv"), j * subDims + 1, subDims).as("qv"),
        slice(col("qvd"), j * subDims + 1, subDims).as("qvd"))
      .withColumn("qq", call_function("graft_dot", col("qvd"), col("qvd")))
      .withColumn("qvx", concat(col("qvd"), array(lit(1.0))))

  /** One trained codebook per sub-space — M independent Lloyd runs over
    * the sliced frame, each memoized/persisted under its own "<tag><j>"
    * tag (an index artifact, built once per dataset like the IVF model;
    * residual-PQ callers pass a distinct prefix so raw-space and
    * residual-space books for the same dataset never collide). */
  private[graft] def trainBooks(base: DataFrame, d: String,
                                iters: Int = PqIters, k: Int = K,
                                tagPrefix: String = "-pq",
                                m: Int = M, subDims: Int = SubDims)
      : Seq[Seq[(Int, Array[Long])]] =
    (0 until m).map { j =>
      KMeansOps.lloyd(subPts(base, j, subDims), d, iters, k = k,
          dims = subDims, tag = s"$tagPrefix$j")
        .map(c => (c._1, c._2))
    }

  /** Append code columns c0..c(M−1) in ONE row-local projection — each
    * sub-space's (qq, qvx) is computed inline from the full qvd, so the
    * frame is never reshaped M times. Dispatches through
    * [[KMeansOps.codeExpr]] (inline least() at testbed k, the
    * argmin kernel at the smoke's k = 256). */
  private[graft] def encode(base: DataFrame,
                            books: Seq[Seq[(Int, Array[Long])]],
                            subDims: Int = SubDims): DataFrame =
    books.zipWithIndex.foldLeft(base) { case (df, (book, j)) =>
      val sub = slice(col("qvd"), j * subDims + 1, subDims)
      df.withColumn(s"c$j", KMeansOps.codeExpr(
        call_function("graft_dot", sub, sub),
        concat(sub, array(lit(1.0))),
        book))
    }

  /** Staged residual frame, memoized per dataset like [[KMeansOps.stagedPts]]
    * (deterministic given the dataset: the coarse model is the memoized
    * Iters-deep Lloyd sequence). Persisted through [[graft.ArtifactStore]]
    * when the store is armed — the residualization itself is a cheap
    * projection, but it sits downstream of the coarse Lloyd training, so
    * a fresh session that loads this frame skips BOTH (the loaded parquet
    * doubles as the staging medium). */
  private val stagedResidual = new graft.DatasetMemo[DataFrame](
    Some(graft.ArtifactStore.frame("ivfadc_residual")))

  /** Residual frame for IVFADC (Jégou et al. §IV): coarse cell id + the
    * residual x − c ON THE INTEGER GRID, renamed to the (qv, qvd)
    * contract the PQ trainer/encoder consume. Entirely row-local — the
    * coarse centroid matrix rides as one referenced literal (k×Dims
    * longs), so residualizing a 100-TB corpus is a projection, not a
    * join. */
  private[graft] def residualize(base: DataFrame,
                                 coarse: Seq[(Int, Array[Long])]): DataFrame = {
    val centMat: Seq[Seq[Long]] = coarse.sortBy(_._1).map(_._2.toSeq)
    KMeansOps.withCid(base, coarse)
      .withColumn("qv", zip_with(col("qv"),
        element_at(typedLit(centMat), col("cid").cast("int") + 1),
        (a, b) => a - b))
      .withColumn("qvd", transform(col("qv"), _.cast("double")))
      .select("vec_id", "cid", "qv", "qvd")
  }

  // ---- oracle-side twin -----------------------------------------------------

  /** Sub-space j's slice + seeds + unrolled Lloyd chain over `src`, CTEs
    * namespaced <sl><j> / <pfxBase><j>… (the full-space chain owns the
    * bare names; the IVFADC oracle re-targets the SAME generator at the
    * residual frame with its own prefix). */
  private def subspaceChain(j: Int, src: String = "pts", sl: String = "p",
                            pfxBase: String = "s"): String = {
    val off = j * SubDims
    val pfx = s"$pfxBase$j"
    val head =
      s"""$sl$j AS (SELECT vec_id, qv[${off + 1}:${off + SubDims}] AS qv FROM $src),
         |${pfx}c0 AS (SELECT vec_id AS cid, qv AS cv FROM $sl$j WHERE vec_id < $K)""".stripMargin
    (head +: (1 to PqIters).map(t =>
      KMeansOps.iterCte(t, pfx, SubDims, s"$sl$j"))).mkString(",")
  }

  /** Sub-space j's final corpus assignment <af><j> against the trained
    * <pfxBase><j>c<PqIters> codebook (min over the dist·CompBase+cid
    * composite, cid decoded from the low digits — the codeExpr twin). */
  private def assignCte(j: Int, sl: String = "p", pfxBase: String = "s",
                        af: String = "af"): String = {
    val pfx = s"$pfxBase$j"
    s"""${pfx}f AS (
       |  SELECT p.vec_id,
       |         list_sum(list_transform(generate_series(1, $SubDims),
       |           i -> (p.qv[i] - c.cv[i]) * (p.qv[i] - c.cv[i]))) * ${KMeansOps.CompBase} + c.cid AS comp
       |  FROM $sl$j p CROSS JOIN ${pfx}c$PqIters c),
       |$af$j AS (
       |  SELECT vec_id, CAST(min(comp) % ${KMeansOps.CompBase} AS BIGINT) AS cid
       |  FROM ${pfx}f GROUP BY vec_id)""".stripMargin
  }

  /** Q:ann_pq_topk — top-10 neighbors of query vec_id = 0 under the ADC
    * score (see object doc). Output carries the M code columns too, so the
    * oracle hash checks the ENCODING of every returned row, not just the
    * score. Plan shape: the corpus side is the staged quantized frame with
    * M row-local code columns; the 1-row query broadcasts (crossJoin);
    * ranking is TakeOrderedAndProject — one scan, no global sort.
    */
  val annPqTopk = GQuery(
    "ann_pq_topk",
    (s, d) => {
      graft.functions.VectorExpressions.ensureRegistered(s)
      val base = KMeansOps.stagedPts(s, d)
      val books = trainBooks(base, d)
      val codes = encode(base, books)
        .select(col("vec_id") +: (0 until M).map(j => col(s"c$j")): _*)
      val qrow = broadcast(base.filter(col("vec_id") === 0)
        .select(col("qvd").as("qqvd")))
      // codebook j as one referenced literal matrix, row cid = entry cid
      // (cids are exactly 0..k−1: seeded from vec_id<k, preserved by the
      // update step), so ADC term j is a dot against element_at(code+1)
      val bookMat: Seq[Seq[Seq[Double]]] =
        books.map(_.sortBy(_._1).map(_._2.map(_.toDouble).toSeq))
      val adc = (0 until M).map { j =>
        call_function("graft_dot",
          slice(col("qqvd"), j * SubDims + 1, SubDims),
          element_at(typedLit(bookMat(j)), col(s"c$j").cast("int") + 1))
      }.reduce(_ + _)
      codes.filter(col("vec_id") =!= 0)
        .crossJoin(qrow)
        .withColumn("qdot", adc.cast("bigint"))
        .orderBy(desc("qdot"), asc("vec_id"))
        .limit(SimilarityOps.TopK)
        .select(col("vec_id") +:
          (0 until M).map(j => col(s"c$j")) :+ col("qdot"): _*)
    },
    oracle = Some {
      val terms = (0 until M).map { j =>
        s"""list_sum(list_transform(generate_series(1, $SubDims),
           |             i -> q.qv[${j * SubDims} + i] * cb$j.cv[i]))""".stripMargin
      }.mkString("\n           + ")
      val cbJoins = (0 until M).map(j =>
        s"\nJOIN s${j}c$PqIters cb$j ON cb$j.cid = cd.c$j").mkString
      s"""${KMeansOps.PtsOnlyCte},
         |${(0 until M).map(j => subspaceChain(j)).mkString(",")},
         |${(0 until M).map(j => assignCte(j)).mkString(",")},
         |codes AS (
         |  SELECT af0.vec_id, ${(0 until M).map(j => s"af$j.cid AS c$j").mkString(", ")}
         |  FROM af0 ${(1 until M).map(j => s"JOIN af$j USING (vec_id)").mkString(" ")}),
         |q AS (SELECT qv FROM pts WHERE vec_id = 0)
         |SELECT cd.vec_id, ${(0 until M).map(j => s"cd.c$j").mkString(", ")},
         |       CAST($terms AS BIGINT) AS qdot
         |FROM codes cd CROSS JOIN q$cbJoins
         |WHERE cd.vec_id <> 0
         |ORDER BY qdot DESC, cd.vec_id
         |LIMIT ${SimilarityOps.TopK}""".stripMargin
    },
    bench = true)

  /** Q:ann_ivfadc_topk — the RESIDUAL-encoded PQ search (IVFADC, Jégou
    * et al. §IV), fully oracle-checked: every vector stores its coarse
    * cell id (the SAME trained k=8 IVF model the ann_ivf_* family
    * memoizes — zero extra training) plus M sub-codes of the residual
    * x − c, and the ADC score decomposes exactly as
    * dot(q, x) ≈ dot(q, c) + dot(q, recon(x − c)). Residual encoding is
    * what makes PQ deployable: raw-space codebooks spend their bits
    * separating clusters and rank same-cluster neighbors at chance;
    * residual books spend ALL their bits inside the cell
    * ([[graft.tools.PqScaleSmoke]] measures the ablation at 2M vectors —
    * 2-3× recall at every operating point, identical code budget).
    *
    * Output carries cell id AND sub-codes, so the oracle hash checks the
    * whole index row; the score is integer-exact like [[annPqTopk]]
    * (residual components ≤ 2·max|qv|, every partial far under 2⁵³).
    * Same plan shape: staged row-local encode, broadcast 1-row query,
    * TakeOrderedAndProject.
    */
  /** Shared Spark core of the IVFADC queries: the residual-encoded code
    * frame crossJoined with the 1-row query, carrying the row-local ADC
    * `qdot` plus the coarse model (for probe selection). Every ADC term
    * reads a referenced literal matrix; nothing here shuffles. */
  private def ivfadcScored(s: org.apache.spark.sql.SparkSession, d: String)
      : (DataFrame, Seq[(Int, Array[Long])]) = {
    graft.functions.VectorExpressions.ensureRegistered(s)
    val base = KMeansOps.stagedPts(s, d)
    val coarse = KMeansOps.lloyd(base, d, KMeansOps.Iters)
      .map(c => (c._1, c._2))
    val res = stagedResidual.get(s, d, "embeddings.parquet")(
      Materialize.stageShared(residualize(base, coarse)))
    val books = trainBooks(res, d, tagPrefix = "-rpq")
    val codes = encode(res, books)
      .select(col("vec_id") +: col("cid") +:
        (0 until M).map(j => col(s"c$j")): _*)
    val qrow = broadcast(base.filter(col("vec_id") === 0)
      .select(col("qvd").as("qqvd")))
    val centMatD: Seq[Seq[Double]] =
      coarse.sortBy(_._1).map(_._2.map(_.toDouble).toSeq)
    val bookMat: Seq[Seq[Seq[Double]]] =
      books.map(_.sortBy(_._1).map(_._2.map(_.toDouble).toSeq))
    val adc = call_function("graft_dot", col("qqvd"),
        element_at(typedLit(centMatD), col("cid").cast("int") + 1)) +
      (0 until M).map { j =>
        call_function("graft_dot",
          slice(col("qqvd"), j * SubDims + 1, SubDims),
          element_at(typedLit(bookMat(j)), col(s"c$j").cast("int") + 1))
      }.reduce(_ + _)
    (codes.filter(col("vec_id") =!= 0)
      .crossJoin(qrow)
      .withColumn("qdot", adc.cast("bigint")), coarse)
  }

  private def topOf(scored: DataFrame): DataFrame =
    scored
      .orderBy(desc("qdot"), asc("vec_id"))
      .limit(SimilarityOps.TopK)
      .select(col("vec_id") +: col("cid") +:
        (0 until M).map(j => col(s"c$j")) :+ col("qdot"): _*)

  val annIvfadcTopk = GQuery(
    "ann_ivfadc_topk",
    (s, d) => topOf(ivfadcScored(s, d)._1),
    oracle = Some(ivfadcOracle()))

  /** Q:ann_ivfadc_nprobe2_topk — the cell-restricted IVFADC search: the
    * query probes only its TWO best coarse cells (max query·centroid dot,
    * ties to the lower cid — the max-inner-product analog of the IVF
    * family's nprobe knob; at scale the scan touches nprobe/k of the
    * code table instead of all of it, the operating point
    * [[graft.tools.PqScaleSmoke]] measures at 2M vectors: nprobe=32
    * reproduces exhaustive recall at 8× less search). Probe selection is
    * row-local — the k composite (−dot·CompBase + cid) values sort in an
    * array column, pmod decodes the two best cids, and the candidate
    * filter is a plain OR; no extra join, no shuffle. Integer-exact like
    * the rest of the family (|dot|·CompBase ≪ 2⁵³), so the oracle's
    * ORDER BY comp LIMIT 2 replays the probe choice bit-for-bit.
    */
  val annIvfadcNprobe2Topk = GQuery(
    "ann_ivfadc_nprobe2_topk",
    (s, d) => {
      val (scored, coarse) = ivfadcScored(s, d)
      val comps = coarse.sortBy(_._1).map { case (cid, cv) =>
        call_function("graft_dot", col("qqvd"),
          typedLit(cv.map(_.toDouble).toSeq)) *
          lit(-CompBase.toDouble) + lit(cid.toDouble)
      }
      val sorted = array_sort(array(comps: _*))
      def probe(i: Int): Column =
        pmod(element_at(sorted, i), lit(CompBase.toDouble)).cast("long")
      topOf(scored.filter(col("cid") === probe(1) || col("cid") === probe(2)))
    },
    oracle = Some(ivfadcOracle(nprobe = Some(2))))

  /** The composed IVFADC oracle: coarse chain → assignment → MATERIALIZED
    * residual frame → 4 namespaced residual sub-chains → codes → ADC
    * scoring; `nprobe` adds the probe-cell CTE and candidate filter. */
  private def ivfadcOracle(nprobe: Option[Int] = None): String = {
    val ci = KMeansOps.Iters
    val coarseChain = (
      s"c0 AS (SELECT vec_id AS cid, qv AS cv FROM pts WHERE vec_id < ${KMeansOps.K})" +:
        (1 to ci).map(t => KMeansOps.iterCte(t))).mkString(",")
    val terms = (0 until M).map { j =>
      s"""list_sum(list_transform(generate_series(1, $SubDims),
         |             i -> q.qv[${j * SubDims} + i] * cb$j.cv[i]))""".stripMargin
    }.mkString("\n           + ")
    val cbJoins = (0 until M).map(j =>
      s"\nJOIN r${j}c$PqIters cb$j ON cb$j.cid = cd.c$j").mkString
    val probeCte = nprobe.map(np =>
      s""",
         |qc AS (
         |  SELECT -(list_sum(list_transform(generate_series(1, ${KMeansOps.Dims}),
         |             i -> q.qv[i] * c.cv[i]))) * $CompBase + c.cid AS comp
         |  FROM c$ci c CROSS JOIN q),
         |pr AS (
         |  SELECT CAST(((comp % $CompBase) + $CompBase) % $CompBase AS BIGINT) AS cid
         |  FROM qc ORDER BY comp LIMIT $np)""".stripMargin).getOrElse("")
    val probeFilter =
      if (nprobe.isDefined) "\n  AND cd.cid IN (SELECT cid FROM pr)" else ""
    s"""${KMeansOps.PtsOnlyCte},
       |$coarseChain,
       |cf AS (
       |  SELECT p.vec_id,
       |         list_sum(list_transform(generate_series(1, ${KMeansOps.Dims}),
       |           i -> (p.qv[i] - c.cv[i]) * (p.qv[i] - c.cv[i]))) * $CompBase + c.cid AS comp
       |  FROM pts p CROSS JOIN c$ci c),
       |afc AS MATERIALIZED (
       |  SELECT vec_id, CAST(min(comp) % $CompBase AS BIGINT) AS cid
       |  FROM cf GROUP BY vec_id),
       |rpts AS MATERIALIZED (
       |  SELECT p.vec_id, a.cid,
       |         list_transform(generate_series(1, ${KMeansOps.Dims}),
       |           i -> p.qv[i] - cc.cv[i]) AS qv
       |  FROM pts p JOIN afc a USING (vec_id) JOIN c$ci cc ON cc.cid = a.cid),
       |${(0 until M).map(j => subspaceChain(j, "rpts", "rp", "r")).mkString(",")},
       |${(0 until M).map(j => assignCte(j, "rp", "r", "raf")).mkString(",")},
       |codes AS (
       |  SELECT afc.vec_id, afc.cid, ${(0 until M).map(j => s"raf$j.cid AS c$j").mkString(", ")}
       |  FROM afc ${(0 until M).map(j => s"JOIN raf$j USING (vec_id)").mkString(" ")}),
       |q AS (SELECT qv FROM pts WHERE vec_id = 0)$probeCte
       |SELECT cd.vec_id, cd.cid, ${(0 until M).map(j => s"cd.c$j").mkString(", ")},
       |       CAST(list_sum(list_transform(generate_series(1, ${KMeansOps.Dims}),
       |             i -> q.qv[i] * cc.cv[i]))
       |           + $terms AS BIGINT) AS qdot
       |FROM codes cd CROSS JOIN q
       |JOIN c$ci cc ON cc.cid = cd.cid$cbJoins
       |WHERE cd.vec_id <> 0$probeFilter
       |ORDER BY qdot DESC, cd.vec_id
       |LIMIT ${SimilarityOps.TopK}""".stripMargin
  }

  val queries: Seq[GQuery] = Seq(annPqTopk, annIvfadcTopk, annIvfadcNprobe2Topk)
}
