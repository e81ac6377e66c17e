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
