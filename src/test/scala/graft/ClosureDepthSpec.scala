package graft

import graft.operators.DedupOps
import graft.tools.ClosureDepthSmoke

/** Convergence-margin tripwire for the three component oracles' unrolled
  * min-label propagation ([[DedupOps.labelPropCtes]], 12 rounds): the
  * oracle is EXACT only while every node sits within 12 hops of its
  * component's min-id representative. Measured worst case across all gate
  * corpora is 3 (dense clusters, not chains); this spec re-measures on the
  * CURRENT testdata each round and trips at half the unroll depth, so a
  * deeper testdata generation fails the suite loudly before it can turn a
  * driver-gate row red with a silently-unconverged oracle.
  *
  * Measurement logic lives in [[ClosureDepthSmoke]], which runs the SAME
  * tripwire on the sf0.1 graphs the bench folds (too heavy for every
  * `sbt test`; part of the round-close recipe).
  */
class ClosureDepthSpec extends SparkSuite {

  test("depth-11 adversarial chain: early-exited star rewrite == fixed 12-round unroll") {
    // The Spark side converges EARLY (digest-gated fixpoint detection in
    // starComponents); the oracle always unrolls exactly 12 label-prop
    // rounds. A fixpoint is invariant under extra rounds, so the two can
    // only disagree if the early exit fires BEFORE the true fixpoint —
    // and the hardest case inside the oracle's margin is a chain whose
    // farthest node sits 11 hops from the component minimum. Run the
    // oracle's own CTE text through spark.sql over that chain and
    // require label-for-label equality with the early-exited rewrite.
    import spark.implicits._
    val n = 12 // nodes 0..11 → max node→rep distance 11
    val chain = (0 until n - 1).map(i => (i.toLong * 13 + 5, (i + 1).toLong * 13 + 5))
    val viaStar = DedupOps.componentsFromPairs(chain.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val values = chain.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    val sql = graft.tools.DuckSqlDialect.toSpark(
      s"""WITH raw AS (
         |  SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
         |  FROM (VALUES $values) AS t(src, dst)),
         |edges AS MATERIALIZED (
         |  SELECT src, dst FROM raw UNION SELECT dst, src FROM raw),
         |${DedupOps.labelPropCtes()}
         |SELECT u, lbl FROM comp_labels""".stripMargin)
    val viaUnroll = spark.sql(sql)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar === viaUnroll,
      "early-exit diverged from the fixed-depth oracle on the depth-11 chain")
    // and both collapse the chain to its minimum id
    assert(viaStar.values.toSet === Set(5L))
  }

  for (dir <- Seq(smokeDir, "/root/testdata/sf0.01")) {
    test(s"label-prop margin holds on $dir") {
      ClosureDepthSmoke.graphsAt(spark, dir).foreach { case (name, edges) =>
        val depth = ClosureDepthSmoke.maxDistToRep(edges)
        info(s"$name @ $dir: max node->rep distance $depth")
        assert(depth <= DedupOps.LabelPropRounds / 2,
          s"$name pair graph deepened to $depth — within 2x of the " +
            s"${DedupOps.LabelPropRounds}-round label-prop unroll; raise " +
            "LabelPropRounds (and re-measure oracle runtime) BEFORE the " +
            "driver gate sees an unconverged oracle")
      }
    }
  }
}
