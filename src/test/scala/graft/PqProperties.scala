package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Differential property for the sub-space assignment behind the PQ/IVFADC
  * encoders ([[KMeansOps.codeExpr]]): for arbitrary integer vectors and
  * codebooks — any dims, any k, duplicate centroids included — the column
  * must return exactly the lexicographic (distance, cid) argmin a
  * driver-side fold computes. Spans BOTH dispatch paths (the inline
  * least() tree at k ≤ 16 and the `graft_argmin_centroid` kernel above
  * it), so the affine ‖x−c‖² = qq − 2x·c + c·c identity, the composite
  * dist·1000+cid encoding, and the kernel's tie-break all stay pinned to
  * the definition across geometries the testbed never varies.
  */
object PqProperties extends Properties("pqAssign") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val inputGen: Gen[(List[List[Long]], List[List[Long]])] = for {
    d <- Gen.choose(2, 8)
    k <- Gen.oneOf(Gen.choose(2, 8), Gen.choose(17, 24))
    n <- Gen.choose(1, 24)
    vecs <- Gen.listOfN(n, Gen.listOfN(d, Gen.choose(-50L, 50L)))
    cents <- Gen.listOfN(k, Gen.listOfN(d, Gen.choose(-50L, 50L)))
  } yield (vecs, cents)

  property("codeExpr == lexicographic (dist, cid) argmin, both paths") =
    forAll(inputGen) { case (vecs, cents) =>
      val spark = SparkSuite.spark
      graft.functions.VectorExpressions.ensureRegistered(spark)
      import spark.implicits._
      val cmat = cents.zipWithIndex.map { case (cv, i) => (i, cv.toArray) }
      val got = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "qv")
        .withColumn("qvd", transform(col("qv"), _.cast("double")))
        .withColumn("qq", expr("graft_dot(qvd, qvd)"))
        .withColumn("qvx", concat(col("qvd"), array(lit(1.0))))
        .withColumn("cid", KMeansOps.codeExpr(col("qq"), col("qvx"), cmat))
        .select("vec_id", "cid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      vecs.zipWithIndex.forall { case (v, i) =>
        val want = cents.zipWithIndex.map { case (cv, cid) =>
          (v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.min
        got(i.toLong) == want._2.toLong
      }
    }
}
