package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSuite

/** Differential property for [[GraphOps.ssspFromEdges]]: on arbitrary
  * random weighted undirected graphs the distributed delta-relaxation
  * loop must equal a driver-side fold of the identical bounded-horizon
  * min-plus recurrence (full Bellman-Ford rounds — the delta trick is
  * the OPTIMIZATION under test, the reference deliberately relaxes
  * everything every round). Covers parallel edges collapsed by the
  * producer's groupBy (the generator pre-aggregates the same way),
  * disconnected components, duplicate costs, and non-contiguous ids.
  */
object SsspProperties extends Properties("sssp") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def cost(cnt: Long): Long = 1 + GraphOps.TriItemCap / cnt

  /** Driver reference: bounded-horizon Bellman-Ford, no delta trick. */
  private def referenceSssp(wund: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val bedges = wund.flatMap { case (u, v, cnt) =>
      Seq((u, v, cost(cnt)), (v, u, cost(cnt)))
    }
    val seed = wund.map(_._1).min
    var dist = Map(seed -> 0L)
    for (_ <- 1 to GraphOps.SsspMaxRounds) {
      val relaxed = bedges.flatMap { case (s, d, w) =>
        dist.get(s).map(c => d -> (c + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, cs) => n -> cs.map(_._2).min }
    }
    dist
  }

  private def sparkSssp(wund: Seq[(Long, Long, Long)]): Map[Long, Long] = {
    val spark = SparkSuite.spark
    import spark.implicits._
    GraphOps.ssspFromEdges(wund.toDF("u", "v", "cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Undirected edge sets with u < v, deduplicated, summed counts —
    * the exact contract [[GraphOps.weightedCoocEdges]] produces. */
  private val edgeGen: Gen[Seq[(Long, Long, Long)]] = for {
    n <- Gen.choose(2, 14)
    m <- Gen.choose(1, 40)
    raw <- Gen.listOfN(m, for {
      a <- Gen.choose(0, n)
      b <- Gen.choose(0, n)
      if a != b
      cnt <- Gen.choose(1L, 80L)
    } yield (math.min(a, b).toLong * 3, math.max(a, b).toLong * 3, cnt))
  } yield raw.groupBy(e => (e._1, e._2))
    .map { case ((u, v), es) => (u, v, es.map(_._3).sum) }.toSeq

  property("distributed delta relaxation equals driver Bellman-Ford") =
    forAll(edgeGen) { wund =>
      wund.isEmpty || sparkSssp(wund) == referenceSssp(wund)
    }
}
