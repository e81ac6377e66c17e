package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSuite

/** Differential property for [[TextOps.invertedIndex]]: on arbitrary
  * random corpora over a tiny vocabulary (maximizing shared terms,
  * repeats, and cap-exceeding posting lists) the bounded-heap index must
  * equal a driver fold of the definition — df over ALL distinct posting
  * docs, postings the first-[[TextOps.PostingCap]] ascending doc ids.
  * Exercises the graft_topk negative-score path the unit fixtures only
  * probe pointwise.
  */
object InvertedIndexProperties extends Properties("invertedIndex") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def reference(docs: Seq[(Long, String)]): Map[String, (Long, String)] =
    docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).distinct.map(w => (w, id))
    }.distinct
      .groupBy(_._1)
      .map { case (w, ps) =>
        val ids = ps.map(_._2).distinct.sorted
        w -> ((ids.size.toLong,
          ids.take(TextOps.PostingCap).mkString(",")))
      }

  private def sparkIndex(docs: Seq[(Long, String)]): Map[String, (Long, String)] = {
    val spark = SparkSuite.spark
    import spark.implicits._
    TextOps.invertedIndex(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
  }

  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 25)
    docs <- Gen.listOfN(n, for {
      len <- Gen.choose(0, 6)
      ws <- Gen.listOfN(len, Gen.oneOf("ab", "cd", "ef", "gh", "ij"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }

  property("bounded-heap index equals the driver definition fold") =
    forAll(corpusGen) { docs =>
      sparkIndex(docs) == reference(docs)
    }
}
