package graft

import graft.operators.{DedupOps, GraphOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Convergence-margin tripwire for the three component oracles' unrolled
  * min-label propagation ([[DedupOps.labelPropCtes]], 12 rounds): the
  * oracle is EXACT only while every node sits within 12 hops of its
  * component's min-id representative. Measured worst case across all gate
  * corpora is 3 (dense clusters, not chains); this spec re-measures on the
  * CURRENT testdata each round and trips at half the unroll depth, so a
  * deeper testdata generation fails the suite loudly before it can turn a
  * driver-gate row red with a silently-unconverged oracle.
  */
class ClosureDepthSpec extends SparkSuite {

  /** Max over nodes of BFS distance to the component's min-id node.
    * Driver-side on purpose: gate corpora pair graphs are tiny (≤ a few
    * hundred edges), and the tripwire must be an INDEPENDENT evaluation,
    * not the label-prop under test re-run.
    */
  private def maxDistToRep(edges: DataFrame): Int = {
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(es.length < 500000, "pair graph grew past driver-side scale")
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    es.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val seen = scala.collection.mutable.Set.empty[Long]
    var worst = 0
    adj.keys.toSeq.sorted.foreach { u =>
      if (!seen(u)) {
        // u is its component's min id (sorted visit order), BFS from it
        var frontier = Set(u)
        val dist = scala.collection.mutable.Map(u -> 0)
        var d = 0
        while (frontier.nonEmpty) {
          d += 1
          frontier = frontier.flatMap(adj).filterNot(dist.contains)
          frontier.foreach(dist(_) = d)
        }
        seen ++= dist.keys
        worst = math.max(worst, dist.values.max)
      }
    }
    worst
  }

  private def graphsAt(dir: String): Seq[(String, DataFrame)] = Seq(
    "dedup_clusters" -> DedupOps.minhashPairs(spark, dir).select("doc_a", "doc_b"),
    "dedup_embedding_clusters" -> DedupOps.bandedEmbPairs(spark, dir)
      .select("vec_a", "vec_b"),
    "graph_components" -> GraphOps.temporalEdges(Tables.events(spark, dir))
      .select(col("src").cast("long"), col("dst").cast("long")))

  for (dir <- Seq(smokeDir, "/root/testdata/sf0.01")) {
    test(s"label-prop margin holds on $dir") {
      graphsAt(dir).foreach { case (name, edges) =>
        val depth = maxDistToRep(edges)
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
