package graft.operators

import org.apache.spark.sql.functions._
import graft.{Materialize, SparkSuite}

/** Invariants for the product-quantization tier the DuckDB oracle can't
  * express: the one-projection encoder is the SAME assignment as the
  * reshaped per-sub-space path, the codebooks have full shape, and ADC
  * ranking actually recalls the exact answer (measured, with a pinned
  * floor — an ADC that hash-matches its own oracle but ranks noise would
  * still be wrong as an ANN).
  */
class PqSpec extends SparkSuite {

  private lazy val base =
    Materialize.stage(KMeansOps.quantized(spark, smokeDir))
  private lazy val books = PqOps.trainBooks(base, smokeDir)

  test("codebooks: M books × K entries × SubDims components, cids 0..K-1") {
    assert(books.length === PqOps.M)
    books.foreach { b =>
      assert(b.map(_._1).sorted === (0 until PqOps.K))
      b.foreach { case (_, cv) => assert(cv.length === PqOps.SubDims) }
    }
    assert(PqOps.M * PqOps.SubDims === KMeansOps.Dims)
  }

  test("one-projection encoder equals the reshaped per-sub-space assignment") {
    val enc = PqOps.encode(base, books)
      .select(col("vec_id") +:
        (0 until PqOps.M).map(j => col(s"c$j")): _*)
      .collect().map(r => r.getLong(0) ->
        (0 until PqOps.M).map(j => r.getLong(j + 1))).toMap
    (0 until PqOps.M).foreach { j =>
      val viaSub = KMeansOps.withCid(PqOps.subPts(base, j), books(j))
        .select("vec_id", "cid").collect()
      viaSub.foreach { r =>
        assert(enc(r.getLong(0))(j) === r.getLong(1),
          s"subspace $j vec ${r.getLong(0)}")
      }
    }
  }

  test("codes are within range and every corpus vector is encoded") {
    val enc = PqOps.encode(base, books)
    val n = base.count()
    assert(enc.count() === n)
    (0 until PqOps.M).foreach { j =>
      val bad = enc.filter(col(s"c$j") < 0 || col(s"c$j") >= PqOps.K).count()
      assert(bad === 0L, s"subspace $j out-of-range codes")
    }
  }

  test("ADC score IS the exact query·reconstruction dot (bit-exact)") {
    // the defining PQ identity: the approximate dot is the EXACT dot
    // between the query and the decoded (reconstructed) vector — any
    // off-by-one in element_at indexing, code decoding, or sub-space
    // offsets breaks it
    val q = base.filter(col("vec_id") === 0)
      .select("qv").head.getSeq[Long](0).toArray
    PqOps.annPqTopk.run(spark, smokeDir).collect().foreach { r =>
      val rec = (0 until PqOps.M).flatMap { j =>
        books(j).find(_._1 == r.getLong(j + 1).toInt).get._2
      }.toArray
      val dot = q.zip(rec).map { case (a, b) => a * b }.sum
      assert(r.getAs[Long]("qdot") === dot, s"vec ${r.getLong(0)}")
    }
  }

  test("IVFADC score IS dot(q, cell) + dot(q, reconstruction), bit-exact") {
    // the residual decomposition: qdot must equal the exact integer dot
    // of the query against (coarse centroid + decoded residual) — any
    // error in residualize's sign, the cell-term lookup, or sub-code
    // decoding breaks it
    val coarse = KMeansOps.lloyd(base, smokeDir, KMeansOps.Iters)
      .map(c => (c._1, c._2))
    val rbooks = PqOps.trainBooks(
      Materialize.stage(PqOps.residualize(base, coarse)), smokeDir,
      tagPrefix = "-rpq")
    val q = base.filter(col("vec_id") === 0)
      .select("qv").head.getSeq[Long](0).toArray
    val out = PqOps.annIvfadcTopk.run(spark, smokeDir).collect()
    assert(out.length === 10)
    out.foreach { r =>
      val cv = coarse.find(_._1 == r.getLong(1).toInt).get._2
      val rec = (0 until PqOps.M).flatMap { j =>
        rbooks(j).find(_._1 == r.getLong(j + 2).toInt).get._2
      }.toArray
      val dot = q.zip(cv).map { case (a, b) => a * b }.sum +
        q.zip(rec).map { case (a, b) => a * b }.sum
      assert(r.getAs[Long]("qdot") === dot, s"vec ${r.getLong(0)}")
    }
  }

  test("ADC recall@10 on planted clustered data (measured, floor pinned)") {
    // the driver testbed's embeddings are isotropic — at that geometry NO
    // quantizer can co-locate neighbors (the IvfScaleSmoke caveat), so
    // recall there measures the data. This corpus has the structure PQ
    // exists for: 64 hash-seeded cluster centers, noise 0.65 (the IVF
    // smoke's overlap level), 4000 vectors, 20 spread queries.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pq-spec").toString
    val nClusters = 64
    spark.range(4000).select(col("id").as("vec_id"),
        expr(
          s"""transform(sequence(0, 63), j -> CAST((
             |  (pmod(abs(xxhash64(id % $nClusters, j + 5000)), 2001) / 1000.0 - 1.0)
             |  + 0.65 * (pmod(abs(xxhash64(id, j)), 2001) / 1000.0 - 1.0))
             |  AS FLOAT))""".stripMargin).as("embedding"),
        (col("id") % nClusters).cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // production-shape codebooks (k = 256 > InlineAssignMaxK, so this also
    // exercises the argmin-kernel encode path): the registry query's K=8
    // is the ORACLE parameterization — 3-bit sub-codes reconstruct too
    // coarsely to rank (measured 0.175 here), which is a statement about
    // 3-bit PQ, not the machinery
    val pts = Materialize.stage(KMeansOps.quantized(spark, dir))
    val k = 256
    val bks = PqOps.trainBooks(pts, dir, iters = 3, k = k)
    val codes = PqOps.encode(pts, bks).select(
      col("vec_id") +: (0 until PqOps.M).map(j => col(s"c$j")): _*)

    graft.functions.CosineTopKAggregate.ensureRegistered(spark)
    val qIds = (0 until 20).map(i => (i * 191L) % 4000)
    val qRows = pts.filter(col("vec_id").isin(qIds: _*))
      .select("vec_id", "qvd", "v", "nrm").collect()

    // exact truth by true cosine
    val qdf = broadcast(spark.createDataFrame(
        qRows.toSeq.map(r => (r.getLong(0), r.getSeq[Double](2), r.getDouble(3))))
      .toDF("query_id", "query_v", "query_nrm"))
    val truth = pts.join(qdf, col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        (expr("graft_dot(v, query_v)") / (col("nrm") * col("query_nrm"))).as("cos"),
        col("vec_id"))
      .groupBy("query_id")
      .agg(expr("graft_cosine_topk(cos, vec_id, 10)").as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("nid"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    // ADC: per-query LUTs (M × K dots, driver-side from the 20 collected
    // query rows — the classic ADC table), scored as M lookups per row
    val luts = qRows.toSeq.map { r =>
      val qvd = r.getSeq[Double](1).toArray
      val ls = (0 until PqOps.M).map { j =>
        bks(j).sortBy(_._1).map { case (_, cv) =>
          (0 until PqOps.SubDims)
            .map(i => qvd(j * PqOps.SubDims + i) * cv(i)).sum
        }
      }
      (r.getLong(0), ls(0), ls(1), ls(2), ls(3))
    }
    val ldf = broadcast(spark.createDataFrame(luts)
      .toDF("query_id", "lut0", "lut1", "lut2", "lut3"))
    val scoredAdc = codes.crossJoin(ldf)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", (0 until PqOps.M).map(j =>
        element_at(col(s"lut$j"), col(s"c$j").cast("int") + 1)).reduce(_ + _))
    def adcTop(r: Int): Map[Long, Set[Long]] = scoredAdc
      .groupBy("query_id")
      .agg(expr(s"graft_cosine_topk(score, vec_id, $r)").as("topk"))
      .select(col("query_id"), explode(col("topk.id")).as("nid"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    // two production numbers: direct ADC top-10 (codes ARE the ranking)
    // and the IVFADC-style shortlist — ADC prunes to R=100 candidates,
    // exact scoring re-ranks only those (100/4000 of the corpus touched
    // at full width); shortlist recall = the re-ranked pipeline's recall
    // since exact re-ranking of a superset recovers every member found
    val top10 = adcTop(10)
    val short100 = adcTop(100)
    val direct = qIds.map(q =>
      (truth(q) intersect top10(q)).size / 10.0).sum / qIds.size
    val rerank = qIds.map(q =>
      (truth(q) intersect short100(q)).size / 10.0).sum / qIds.size
    info(f"PQ ADC recall@10 direct: $direct%.3f; " +
      f"via R=100 shortlist + exact re-rank: $rerank%.3f")
    assert(rerank >= PqRerankFloor,
      s"ADC shortlist collapsed on clustered data: rerank=$rerank")
    assert(direct > 0.1,
      s"direct ADC ranking at chance: direct=$direct")
  }

  // measured direct 0.315 / re-ranked 1.000 (M=4 × k=256 codebooks on
  // the 64-cluster/noise-0.65 corpus — true neighbors differ only by
  // noise INSIDE a cluster, the hardest case for a reconstruction
  // scorer; the shortlist catches all of them). Floors far under the
  // measurements — a broken encoder scores ≈ chance (10/3999 ≈ 0.003
  // direct, ~0.025 shortlist) while hash-seed jitter can't reach them
  private val PqRerankFloor = 0.7
}
