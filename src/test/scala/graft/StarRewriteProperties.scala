package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSuite

/** Differential property for [[DedupOps.starComponents]] (large-star/
  * small-star edge rewriting, Kiveris et al.): on arbitrary random graphs
  * the fixpoint labels must equal plain min-label propagation — the
  * obviously-correct O(diameter) baseline the star rewriting replaced for
  * its O(log n) round bound. Also pinned on a long chain, the worst case
  * for propagation depth (a plain propagate needs n rounds; the star
  * rewrite must still converge inside its 20-round guard).
  */
object StarRewriteProperties extends Properties("starRewrite") {

  // Each case drives a full iterative Spark job — keep the sample small;
  // the generator still covers singletons, multi-component graphs,
  // duplicate and reversed edges, and non-contiguous ids.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** Plain min-label propagation to fixpoint: label(u) starts at u, each
    * round takes min over the neighborhood. Terminates in ≤ diameter
    * rounds; component label = component minimum.
    */
  private def minLabelPropagation(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupMap(_._1)(_._2)
    var labels = nodes.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      val next = labels.map { case (n, l) =>
        n -> (adj.getOrElse(n, Nil).map(labels) :+ l).min
      }
      changed = next != labels
      labels = next
    }
    labels
  }

  private def starLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val spark = SparkSuite.spark
    import spark.implicits._
    val pairs = edges.toDF("doc_a", "doc_b")
    DedupOps.starComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // Non-contiguous ids (×7+3) so nothing accidentally relies on dense 0..n.
  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 20)
    m <- Gen.choose(1, 28)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1) if a != b
    } yield (a.toLong * 7 + 3, b.toLong * 7 + 3))
  } yield edges

  property("star rewrite == min-label propagation on random graphs") =
    forAll(genEdges) { edges =>
      edges.isEmpty || starLabels(edges) == minLabelPropagation(edges)
    }

  property("star rewrite == min-label propagation on a chain (max diameter)") =
    forAll(Gen.choose(2, 40)) { n =>
      val chain = (0 until n - 1).map(i => (i.toLong, i + 1L))
      starLabels(chain) == minLabelPropagation(chain)
    }
}
