package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSuite

/** Differential property for [[SimilarityOps.fuzzyPairs]]: on arbitrary
  * sets of short strings over a tiny alphabet (maximizing collisions and
  * near-misses) the deletion-neighborhood join must return EXACTLY the
  * brute-force { (a, b) : a < b, levenshtein(a, b) ≤ 1 } set — i.e. the
  * candidate generation is complete (no distance-1 pair lacks a shared
  * key) and the verify is sound (no distance-2 shared-key pair leaks).
  */
object FuzzyProperties extends Properties("fuzzyPairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def reference(names: Seq[String]): Set[(String, String)] = {
    val w = names.distinct
    (for {
      a <- w; b <- w
      if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
  }

  private def sparkPairs(names: Seq[String]): Set[(String, String)] = {
    val spark = SparkSuite.spark
    import spark.implicits._
    SimilarityOps.fuzzyPairs(names.distinct.toDF("name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  private val namesGen: Gen[Seq[String]] = for {
    n <- Gen.choose(2, 15)
    names <- Gen.listOfN(n, for {
      len <- Gen.choose(1, 5)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)
  } yield names

  property("deletion-neighborhood join equals brute-force levenshtein") =
    forAll(namesGen) { names =>
      sparkPairs(names) == reference(names)
    }
}
