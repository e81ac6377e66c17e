package graft

import org.apache.spark.sql.functions._

import graft.operators.SketchOps

/** KMV / count-min sketches: hand-built inputs pin the estimator
  * arithmetic and the bounded-buffer semantics, and property checks pin
  * the guarantees the sketches are used for (KMV partition invariance,
  * CMS upper-bound), so a both-engines-wrong oracle mirror cannot pass
  * silently.
  */
class SketchSpec extends SparkSuite {

  import spark.implicits._

  test("graft_kmv keeps the k smallest DISTINCT hashes, ascending") {
    graft.functions.KmvSketchAggregate.ensureRegistered(spark)
    val df = Seq(50L, 10L, 30L, 10L, 40L, 20L, 30L, 60L)
      .toDF("h").agg(expr("graft_kmv(h, 4)").as("mins"))
    val got = df.collect()(0).getSeq[Long](0)
    assert(got === Seq(10L, 20L, 30L, 40L))
  }

  test("graft_kmv exact branch: fewer distinct values than k") {
    graft.functions.KmvSketchAggregate.ensureRegistered(spark)
    val df = Seq(7L, 7L, 3L).toDF("h").agg(expr("graft_kmv(h, 32)").as("mins"))
    val got = df.collect()(0).getSeq[Long](0)
    assert(got === Seq(3L, 7L)) // size 2 == exact distinct count
  }

  test("graft_kmv is partitioning-invariant (merge order does not matter)") {
    graft.functions.KmvSketchAggregate.ensureRegistered(spark)
    val vals = (1 to 500).map(i => (i % 7).toString -> (i * 2654435761L % 104729))
    val base = vals.toDF("g", "h")
    def sketch(np: Int) = base.repartition(np)
      .groupBy("g").agg(expr("graft_kmv(h, 16)").as("mins"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sketch(1) === sketch(13))
  }

  test("sketch_distinct_kmv estimator matches a driver-side replay") {
    val out = SketchOps.sketchDistinctKmv.run(spark, smokeDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(out.nonEmpty)
    // replay: exact distinct hashes per type, k smallest, same formula
    val ev = Tables.events(spark, smokeDir)
      .select(col("event_type"),
        expr("((user_id % 2147483647) * 2654435761) % 4294967296").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1).map { case (t, rows) =>
      val distinct = rows.map(_._2).distinct.sorted
      val kept = distinct.take(SketchOps.KmvK)
      val est =
        if (kept.size < SketchOps.KmvK) kept.size.toLong
        else (SketchOps.KmvK - 1).toLong * 4294967296L / kept.last
      t -> ((kept.size.toLong, est))
    }
    for ((t, nKept, est) <- out)
      assert(byType(t) === ((nKept, est)), s"type $t")
  }

  test("stats_columns: min/max/nulls exact, ndv matches a driver replay") {
    val out = SketchOps.statsColumns.run(spark, smokeDir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.keySet === Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))
    val li = Tables.lineitem(spark, smokeDir)
    for ((c, (mn, mx, nn, ndv)) <- out) {
      val vals = li.select(col(c).cast("long")).collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getLong(0)))
      val present = vals.flatten
      assert(mn === present.min, s"$c min")
      assert(mx === present.max, s"$c max")
      assert(nn === vals.count(_.isEmpty).toLong, s"$c nulls")
      val hashes = present.map(v =>
        ((v % 2147483647) * 2654435761L) % 4294967296L).distinct.sorted
      val kept = hashes.take(SketchOps.KmvK)
      val expect =
        if (kept.size < SketchOps.KmvK) kept.size.toLong
        else (SketchOps.KmvK - 1).toLong * 4294967296L / kept.last
      assert(ndv === expect, s"$c ndv")
    }
  }

  test("CMS estimates are upper bounds on true per-user counts") {
    val est = SketchOps.sketchHeavyHittersCms.run(spark, smokeDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty)
    val truth = Tables.events(spark, smokeDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((u, e) <- est) assert(e >= truth(u), s"user $u: est $e < true ${truth(u)}")
  }

  test("quantile_histogram bins equal the discrete quantiles' bins exactly") {
    // the histogram computes the discrete inverse CDF: the crossing bin is
    // the bin of the rank-⌈p·n/100⌉ value — assert that identity per type
    val approx = SketchOps.quantileHistogram.run(spark, smokeDir)
      .collect()
      .map(r => r.getString(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(approx.nonEmpty)
    val byType = Tables.events(spark, smokeDir)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    for ((t, bins) <- approx) {
      val vals = byType(t)
      val n = vals.length.toLong
      for ((p, bin) <- Seq(50L, 95L, 99L).zip(bins)) {
        val rank = ((p * n + 99) / 100).toInt // ceil(p·n/100)
        val expected = math.floor(vals(rank - 1) * 100).toLong / 100
        assert(bin === expected, s"type $t p$p: bin $bin vs discrete $expected")
      }
    }
  }

  test("KMV mergeability: re-sketching per-group sketches equals the direct global sketch") {
    graft.functions.KmvSketchAggregate.ensureRegistered(spark)
    // 3 groups with overlapping hash sets, cardinalities well above k
    val rows = (1 to 900).map { i =>
      (s"g${i % 3}", (i % 400) * 2654435761L % 104729)
    }
    val base = rows.toDF("g", "h")
    val merged = base
      .groupBy("g").agg(expr("graft_kmv(h, 16)").as("mins"))
      .select(explode(col("mins")).as("h"))
      .agg(expr("graft_kmv(h, 16)").as("mins"))
      .collect()(0).getSeq[Long](0)
    val direct = base.agg(expr("graft_kmv(h, 16)").as("mins"))
      .collect()(0).getSeq[Long](0)
    assert(merged === direct)
  }

  test("KMV jaccard estimator: disjoint sets score 0, identical sets score 1") {
    graft.functions.KmvSketchAggregate.ensureRegistered(spark)
    // types a/b identical, type c disjoint — cardinality above k so the
    // estimator (not the exact branch) is exercised
    val rows =
      (1 to 200).flatMap(i => Seq("a" -> i.toLong, "b" -> i.toLong)) ++
        (1001 to 1200).map(i => "c" -> i.toLong)
    val hashed = rows.toDF("event_type", "u")
      .select(col("event_type"),
        expr("((u % 2147483647) * 2654435761) % 4294967296").as("h"))
    graft.functions.KmvSketchAggregate.ensureRegistered(spark)
    val sk = hashed.groupBy("event_type")
      .agg(expr(s"graft_kmv(h, ${SketchOps.KmvK})").as("mins"))
    val out = sk.as("a")
      .join(sk.as("b"), col("a.event_type") < col("b.event_type"))
      .select(
        col("a.event_type").as("ta"), col("b.event_type").as("tb"),
        expr(s"slice(array_sort(array_distinct(concat(a.mins, b.mins))), 1, ${SketchOps.KmvK})")
          .as("merged"),
        col("a.mins").as("ma"), col("b.mins").as("mb"))
      .select(col("ta"), col("tb"),
        expr("CAST(size(filter(merged, h -> array_contains(ma, h) AND array_contains(mb, h))) AS BIGINT) * 1000000 div greatest(size(merged), 1)")
          .as("j"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("a", "b")) === 1000000L) // identical sketches, full overlap
    assert(out(("a", "c")) === 0L) // disjoint hash sets, zero overlap
    assert(out(("b", "c")) === 0L)
  }

  test("registry wiring: kmv union estimate tracks the true union cardinality") {
    val got = SketchOps.sketchKmvUnion.run(spark, smokeDir).collect().head
    val (nGroups, nKept, est) =
      (got.getLong(0), got.getLong(1), got.getLong(2))
    val truth = Tables.events(spark, smokeDir)
      .select("user_id").distinct().count()
    assert(nGroups > 0 && nKept > 0)
    if (nKept < SketchOps.KmvK) assert(est === truth) // exact regime
    else { // 4 standard errors of the KMV estimator
      val bound = 4.0 / math.sqrt(SketchOps.KmvK - 2)
      assert(math.abs(est - truth).toDouble / truth < bound,
        s"union est $est vs true $truth")
    }
  }

  test("CMS reports every user whose TRUE count reaches the threshold") {
    // est >= true, so no user at/above threshold by true count can be missed
    val total = Tables.events(spark, smokeDir).count()
    val thresh = total / 128
    val reported = SketchOps.sketchHeavyHittersCms.run(spark, smokeDir)
      .collect().map(_.getLong(0)).toSet
    val mustHave = Tables.events(spark, smokeDir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= thresh)
      .collect().map(_.getLong(0)).toSet
    assert(mustHave.subsetOf(reported))
  }

  test("graft_qsketch keeps the k smallest (h, v) pairs, values sorted ascending") {
    graft.functions.QuantileSketchAggregate.ensureRegistered(spark)
    // pairs sorted by (h, v): (1,90) (2,10) (2,40) (5,70) — k=3 keeps the
    // first three; output is their VALUES re-sorted ascending. The (2,10)
    // duplicate collapses (distinct-pair semantics, mirrored by the
    // oracle's SELECT DISTINCT).
    val df = Seq((5L, 70L), (2L, 40L), (1L, 90L), (2L, 10L), (2L, 10L))
      .toDF("h", "v").agg(expr("graft_qsketch(h, v, 3)").as("vs"))
    assert(df.collect()(0).getSeq[Long](0) === Seq(10L, 40L, 90L))
  }

  test("graft_qsketch exact branch: below k the empirical quantile is the true quantile") {
    graft.functions.QuantileSketchAggregate.ensureRegistered(spark)
    val vals = Seq(300L, 100L, 500L, 200L, 400L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("h", "v").agg(expr("graft_qsketch(h, v, 32)").as("vs"))
    val kept = df.collect()(0).getSeq[Long](0)
    assert(kept === vals.sorted) // saw everything: sample IS the population
    // rank ⌈q·n⌉ selections over n=5: p50 → rank 3, p90/p99 → rank 5
    assert(kept((5 + 1) / 2 - 1) === 300L)
    assert(kept((9 * 5 + 9) / 10 - 1) === 500L)
  }

  test("graft_qsketch is partitioning-invariant (merge order does not matter)") {
    graft.functions.QuantileSketchAggregate.ensureRegistered(spark)
    // 600 rows, 3 groups, cardinality well above k so the bounded-buffer
    // merge path (not the exact branch) is exercised
    val rows = (1 to 600).map { i =>
      (s"g${i % 3}", i * 2654435761L % 104729, (i * 37 % 1000).toLong)
    }
    val base = rows.toDF("g", "h", "v")
    def sketch(np: Int) = base.repartition(np)
      .groupBy("g").agg(expr("graft_qsketch(h, v, 16)").as("vs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sketch(1) === sketch(13))
  }

  test("qsketch sample quantiles track the population quantiles") {
    graft.functions.QuantileSketchAggregate.ensureRegistered(spark)
    // uniform values 1..10000 hashed by a Knuth mix: with k=64 the p50
    // estimate has stderr ≈ 1/(2√k) ≈ 6% of the range — assert a lenient
    // ±25% band so the test pins "is a quantile estimator" without
    // flaking, plus determinism across runs
    val base = (1 to 10000).map(i =>
      (i * 2654435761L % 4294967296L, i.toLong)).toDF("h", "v")
    def p50(df: org.apache.spark.sql.DataFrame): Long = {
      val kept = df.agg(expr("graft_qsketch(h, v, 64)").as("vs"))
        .collect()(0).getSeq[Long](0)
      kept((kept.size + 1) / 2 - 1)
    }
    val est = p50(base)
    assert(est > 2500 && est < 7500, s"p50 estimate $est way off 5000")
    assert(est === p50(base.repartition(7))) // and deterministic
  }
}
