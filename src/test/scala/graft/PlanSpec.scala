package graft

import graft.operators._

/** Physical-plan assertions (the scale contract): predicates reach the
  * parquet scan, dimension joins broadcast, top-k avoids global sorts,
  * compaction avoids windows. These pin the plans we designed for — a
  * regression here is a 100× problem at 100 TB even if results stay right.
  */
class PlanSpec extends SparkSuite {

  private def plan(q: GQuery): String = {
    // default maxToStringFields (25) truncates PushedFilters lists mid-
    // entry, which would make pushdown asserts flaky on filter count
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    q.run(spark, smokeDir).queryExecution.executedPlan.toString
  }

  /** The FINAL adaptive plan: executes the query so AQE materializes its
    * runtime decisions (stage reuse, skew splits) — the pre-execution
    * executedPlan shows none of them. */
  private def finalPlan(q: GQuery, dir: String = smokeDir): String = {
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    val df = q.run(spark, dir)
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }

  /** sf0.01 testbed for plan asserts that need non-empty results (AQE's
    * empty-relation propagation erases the plan under test otherwise). */
  private val sf001Dir = "/root/testdata/sf0.01"

  test("filter_event_type pushes the predicate into the parquet scan") {
    val p = plan(EventOps.filterEventType)
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]"),
      s"predicate not pushed:\n$p")
  }

  test("q1_agg prunes the scan to the six referenced columns") {
    val p = plan(RelationalOps.q1Agg)
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey"),
      s"scan reads unused columns:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate predicate not pushed:\n$p")
  }

  test("join_broadcast builds broadcast joins for both dimension sides") {
    val p = plan(RelationalOps.joinBroadcast)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"expected 2 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension join degraded to SMJ:\n$p")
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti") {
    assert(plan(RelationalOps.joinSemi).contains("LeftSemi"))
    assert(plan(RelationalOps.joinAnti).contains("LeftAnti"))
  }

  test("topk_global_rank plans TakeOrderedAndProject (no global sort)") {
    val p = plan(EventOps.topkGlobalRank)
    assert(p.contains("TakeOrderedAndProject"), s"top-k not pushed:\n$p")
  }

  test("tableview_last_per_key is a hash aggregate, not a window sort") {
    val p = plan(EventOps.tableviewLastPerKey)
    assert(!p.contains("Window"), s"compaction degraded to window:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"expected hash aggregate:\n$p")
  }

  test("q1_agg performs map-side partial aggregation") {
    val p = plan(RelationalOps.q1Agg)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregates:\n$p")
  }

  test("offset_tail_read pushes the seq predicate to the scan") {
    val p = plan(EventOps.offsetTailRead)
    assert(p.contains("GreaterThan(event_id,900)"),
      s"offset predicate not pushed:\n$p")
  }

  test("join_range_bucketed never degrades to a nested-loop join") {
    // the whole point of the bucketization: the non-equi time predicate
    // rides an equi-join on (user_id, bucket) — a NestedLoop anywhere in
    // this plan is the quadratic hazard the operator exists to avoid
    val p = plan(RelationalOps.joinRangeBucketed)
    assert(!p.contains("NestedLoop"), s"range join degraded to NLJ:\n$p")
    assert(p.contains("Join"), s"expected a join in the plan:\n$p")
  }

  test("dedup_span_boilerplate anti-joins against a broadcast boiler set") {
    val p = plan(graft.operators.CorpusOps.dedupSpanBoilerplate)
    assert(p.contains("LeftAnti"), s"expected a left-anti join:\n$p")
    assert(!p.contains("SortMergeJoin LeftAnti"),
      s"boiler set must broadcast, not shuffle the corpus spans:\n$p")
  }

  test("q18_large_orders scans lineitem once and takes the top-100 sorted") {
    // the HAVING self-aggregate must replace the textbook IN-subquery:
    // one lineitem scan feeding one groupBy, not a scan per reference
    val p = plan(RelationalOps.q18LargeOrders)
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"lineitem scanned more than once:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 not pushed:\n$p")
  }

  test("q21_suppliers_kept_waiting scans lineitem once, no nested loop") {
    // the textbook EXISTS + NOT-EXISTS plan scans lineitem three times
    // (l1, l2, l3); the decorrelated grain+window plan must scan it ONCE,
    // and neither correlated predicate may degrade to a nested loop
    val p = plan(RelationalOps.q21SuppliersKeptWaiting)
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"lineitem scanned more than once:\n$p")
    assert(!p.contains("NestedLoop"), s"correlation degraded to NLJ:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not pushed:\n$p")
  }

  test("q4_order_priority plans the EXISTS as a left-semi join") {
    val p = plan(RelationalOps.q4OrderPriority)
    assert(p.contains("LeftSemi"), s"EXISTS did not become a semi join:\n$p")
    assert(!p.contains("NestedLoop"), s"residual predicate degraded to NLJ:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"quarter predicate not pushed into the orders scan:\n$p")
  }

  test("q6_forecast_revenue pushes all three predicates into the scan") {
    // the one-line plan string truncates long PushedFilters lists;
    // formatted explain prints the scan metadata in full
    val p = RelationalOps.q6ForecastRevenue.run(spark, smokeDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity"))
      assert(p.contains(f), s"predicate $f not pushed:\n$p")
    assert(!p.contains("Join"), s"Q6 must be join-free:\n$p")
  }

  test("q15_top_supplier reuses the revenue exchange (lineitem scanned once)") {
    // the view + scalar-subquery formulation reads the aggregate twice;
    // AQE must reuse the canonically-identical revenue shuffle stage at
    // RUNTIME (the pre-execution plan still shows two scans — reuse is a
    // stage-cache decision), so assert on the final adaptive plan
    val p = finalPlan(RelationalOps.q15TopSupplier)
    assert(p.contains("ReusedExchange"), s"revenue exchange not reused:\n$p")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"lineitem scanned more than once:\n$p")
  }

  test("q17_small_quantity_revenue scans lineitem once via the window") {
    // the correlated scalar-AVG must come from a window over the reduced
    // frame, not an aggregate-join-back that scans lineitem again
    val p = plan(RelationalOps.q17SmallQuantityRevenue)
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"lineitem scanned more than once:\n$p")
    assert(p.contains("Window"), s"expected the per-part stats window:\n$p")
  }

  test("q11_important_parts reuses the value exchange (lineitem scanned once)") {
    // the HAVING-vs-global-scalar probe and the total must share one
    // shuffle stage — q15's reuse discipline. sf0.01, not the smoke dir:
    // at sf0.001 the 0.1% threshold keeps nothing and AQE's empty-
    // relation propagation erases the very plan under test
    val p = finalPlan(RelationalOps.q11ImportantParts, sf001Dir)
    assert(p.contains("ReusedExchange"), s"value exchange not reused:\n$p")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"lineitem scanned more than once:\n$p")
  }

  test("q20_excess_shipments scans lineitem once via the per-part window") {
    val p = plan(RelationalOps.q20ExcessShipments)
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"lineitem scanned more than once:\n$p")
    assert(p.contains("Window"), s"expected the per-part total window:\n$p")
    assert(p.contains("LeftSemi"), s"supplier probe must be a semi join:\n$p")
  }

  test("q2_min_cost_supplier broadcasts dimensions, windows the min") {
    val p = plan(RelationalOps.q2MinCostSupplier)
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"lineitem scanned more than once:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a dimension join degraded to SMJ:\n$p")
    assert(p.contains("Window"), s"expected the per-part min window:\n$p")
  }

  test("window_trailing_range runs on a single window exchange") {
    // the RANGE frame must ride ONE user-keyed exchange — a second
    // Exchange would mean the plan re-shuffles what the window already
    // partitioned
    val p = plan(AnalyticsOps.windowTrailingRangeQ)
    assert(p.contains("Window"), s"no window operator:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"expected exactly one exchange:\n$p")
  }

  test("timeseries_gapfill never rescans raw events (staged hourly aggregate)") {
    // the (type, hour) aggregate feeds BOTH the span/grid derivation and
    // the grid join with different column needs, so exchange reuse cannot
    // serve them — the aggregate is STAGED instead: the scan happens once
    // in the staging job and the final plan reads the materialized frame
    // (zero raw events scans here; two would mean staging regressed)
    val p = finalPlan(AnalyticsOps.timeseriesGapfillQ)
    assert("events\\.parquet".r.findAllIn(p).isEmpty,
      s"final plan rescans raw events:\n$p")
  }

  test("no negated character class in any registry regex (hot-path tripwire)") {
    // Measured on this Spark/JDK build (TextScaleSmoke + isolation
    // probes): a negated character class in a codegen'd regexp_replace /
    // regexp_extract_all costs 10-20x the equivalent lookahead form
    // `(?s)(?![...]).` on identical output (21.96 s vs 0.94 s over 2M
    // docs) — a silent throughput cliff on per-document operators. The
    // registry ships the lookahead form everywhere; this walks every
    // query's analyzed plan and fails on any literal regex pattern that
    // reintroduces `[^`. (DuckDB oracles keep negated classes — RE2 has
    // no lookahead and no such pathology — and are not scanned here.)
    import org.apache.spark.sql.catalyst.expressions._
    // one pass builds every query's optimized plan; both registry-wide
    // expression invariants (regex form, money-guard pairing) read it
    val planPairs = graft.SparkEntry.all.map { q =>
      (q, q.run(spark, smokeDir).queryExecution.optimizedPlan)
    }
    val offenders = planPairs.flatMap { case (q, plan) =>
      // collectWithSubqueries, not a plain walk: an EXISTS/IN subquery
      // holds its inner plan as an expression field, and a regex inside
      // it would never reach the node-level expression lists
      plan.collectWithSubqueries { case p => p }
        .flatMap(_.expressions.flatMap(_.collect {
          case r: RegExpReplace => ("regexp_replace", r.regexp)
          case r: RegExpExtractAll => ("regexp_extract_all", r.regexp)
          case r: RegExpExtract => ("regexp_extract", r.regexp)
          case r: RLike => ("rlike", r.right)
        })).collect {
          case (fn, Literal(p: org.apache.spark.unsafe.types.UTF8String, _))
              if p.toString.contains("[^") =>
            s"${q.name}: $fn('${p}')"
        }
    }.distinct
    assert(offenders.isEmpty,
      s"negated character class on a registry hot path (use the " +
        s"lookahead form instead):\n  ${offenders.mkString("\n  ")}")

    // Spark-side twin of OracleSanitySpec's guard-pairing check: every
    // scaled-money non-finite guard in the OPTIMIZED plans must pair its
    // bound with its scale at bound x scale = 9.0e18 (the q1Agg scaladoc
    // contract). Plan rendering: `abs(x) >= 9.0E14)) THEN null ELSE
    // FLOOR(((x * 10000.0) + 0.5)) END`; the tempered dot stops at END so
    // a bare guard never pairs with a later fragment's scale.
    val guardRe = raw"(?s)>= (9\.0E(\d+))\)\) THEN null ELSE (?:(?!\bEND\b).)*?\* (\d+)\.0\) \+ 0\.5\)+ END".r
    var found = 0
    planPairs.foreach { case (q, plan) =>
      val s = plan.toString
      guardRe.findAllMatchIn(s).foreach { m =>
        found += 1
        assert(math.pow(10, m.group(2).toInt) * m.group(3).toLong == 1e18,
          s"${q.name}: guard bound ${m.group(1)} vs scale ${m.group(3)} " +
            s"(product must be 9.0e18): ...${m.matched.take(120)}")
      }
    }
    // keep the floor within ~5 of the true site count (printed below), so
    // PARTIAL rot — e.g. only the SQL-text half of the sites still
    // matching after a Spark pretty-print change — also fails loudly
    info(s"money-guard sites matched: $found")
    assert(found >= 30, // true count 35 as of round 15 — keep within ~5
      s"plan-side guard regex matched only $found sites — pattern rot?")
  }

  test("q22_global_sales_opportunity anti-joins pushed-down recent orders") {
    // the correlated NOT EXISTS must become a LEFT ANTI join, and the
    // two-year recency predicate must reach the orders scan so only
    // recent custkeys cross the anti join's shuffle
    val p = plan(RelationalOps.q22GlobalSalesOpportunity)
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not become anti join:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"recency predicate not pushed into the orders scan:\n$p")
    assert("orders\\.parquet".r.findAllIn(p).size == 1,
      s"orders scanned more than once:\n$p")
  }
}
