package graft.functions

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSuite

/** Differential property for [[KmvSketchAggregate]]: for arbitrary
  * multisets of hash values and any partitioning, the aggregate must
  * return exactly the k smallest DISTINCT values ascending — the
  * definition a driver-side `distinct.sorted.take(k)` computes. Covers
  * duplicates, fewer-than-k inputs, negative and extreme longs (the
  * buffer orders raw longs; the hash's non-negativity is the CALLER's
  * contract, not the aggregate's).
  */
object KmvProperties extends Properties("kmvSketch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val inputGen: Gen[(List[Long], Int, Int)] = for {
    n <- Gen.choose(1, 120) // small n => the under-filled (< k) exact regime
    vals <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(-8L, 8L), // dense duplicates; n<=16 often has < k distinct
      Gen.choose(Long.MinValue, Long.MaxValue))) // extremes
    k <- Gen.choose(1, 20)
    parts <- Gen.choose(1, 7)
  } yield (vals, k, parts)

  property("sketch == k smallest distinct values, any partitioning") =
    forAll(inputGen) { case (vals, k, parts) =>
      val spark = SparkSuite.spark
      import spark.implicits._
      KmvSketchAggregate.ensureRegistered(spark)
      val got = vals.toDF("h").repartition(parts)
        .agg(org.apache.spark.sql.functions.expr(s"graft_kmv(h, $k)"))
        .collect()(0).getSeq[Long](0).toList
      got == vals.distinct.sorted.take(k)
    }
}
