package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSuite

/** Differential property for [[GraphOps.ranks]]: on arbitrary random
  * directed graphs the distributed three-iteration loop must equal a
  * driver-side fold implementing the identical scaled-integer recurrence
  * — per-edge floor division BEFORE the sum, the GraphOps damping
  * constants, dangling mass dropped. The independence the property buys
  * is STRUCTURAL (a sequential fold vs the distributed join loop); the
  * constants are shared so a deliberate retune cannot desynchronize the
  * reference. Covers multi-edges (deduplicated by the edge
  * frame's producer, so the generator dedups too), self-loops, sinks,
  * sources, and non-contiguous ids.
  */
object PageRankProperties extends Properties("pagerank") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** Driver reference: the same recurrence, no Spark. */
  private def referenceRanks(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ed = edges.distinct
    val nodes = ed.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = ed.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> GraphOps.PrUnit).toMap
    for (_ <- 1 to GraphOps.PrIters) {
      val in = ed.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) =>
          r(s) * GraphOps.PrDampNum / (outdeg(s) * GraphOps.PrDampDen)
        }.sum
      }
      r = nodes.map(n => n -> (GraphOps.PrBase + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  private def sparkRanks(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val spark = SparkSuite.spark
    import spark.implicits._
    GraphOps.ranks(edges.distinct.toDF("src", "dst"))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
  }

  private val edgeGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 12) // node-id space (sparse ids via the multiplier)
    m <- Gen.choose(1, 30)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(0, n)
      d <- Gen.choose(0, n)
    } yield (s.toLong * 7, d.toLong * 7)) // non-contiguous ids incl. self-loops
  } yield edges

  property("distributed ranks equal the driver reference recurrence") =
    forAll(edgeGen) { edges =>
      sparkRanks(edges) == referenceRanks(edges)
    }
}
