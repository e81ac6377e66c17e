package graft.operators

import java.sql.Timestamp

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSuite

/** Differential property for [[AnalyticsOps.churnAccounting]]: on
  * arbitrary random (user, day) activity sets — including gap days and
  * resurrections — the distributed ledger must equal a driver fold of
  * the set definitions (retained = today ∩ yesterday, inflow = today ∖
  * yesterday, churned_next = today ∖ tomorrow), and total churn must be
  * conserved: Σ churned_next = Σ inflow (every arrival eventually
  * departs or is censored at the horizon, which churned_next counts by
  * design).
  */
object ChurnProperties extends Properties("churn") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private def reference(active: Set[(Long, Int)])
      : Map[Int, (Long, Long, Long, Long)] = {
    val byDay = active.groupBy(_._2).view
      .mapValues(_.map(_._1)).toMap
    byDay.map { case (d, users) =>
      val y = byDay.getOrElse(d - 1, Set.empty[Long])
      val t = byDay.getOrElse(d + 1, Set.empty[Long])
      d -> ((users.size.toLong, (users & y).size.toLong,
        (users -- y).size.toLong, (users -- t).size.toLong))
    }
  }

  private def sparkLedger(active: Set[(Long, Int)])
      : Map[Int, (Long, Long, Long, Long)] = {
    val spark = SparkSuite.spark
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 06:00:00").getTime
    val df = active.toSeq.map { case (u, d) =>
      (u, new Timestamp(base + d * 86400000L))
    }.toDF("user_id", "ts")
    AnalyticsOps.churnAccounting(df).collect().map { r =>
      val day = ((r.getLong(0) - Timestamp.valueOf("2024-01-01 00:00:00")
        .getTime / 1000) / 86400).toInt
      day -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }.toMap
  }

  private val activityGen: Gen[Set[(Long, Int)]] = for {
    n <- Gen.choose(1, 40)
    pairs <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 6L)
      d <- Gen.choose(0, 9) // 10-day horizon with likely gaps
    } yield (u, d))
  } yield pairs.toSet

  property("distributed ledger equals the set-definition fold") =
    forAll(activityGen) { active =>
      sparkLedger(active) == reference(active)
    }

  property("arrivals are conserved: total inflow == total churned_next") =
    forAll(activityGen) { active =>
      val ref = reference(active)
      ref.values.map(_._3).sum == ref.values.map(_._4).sum &&
        sparkLedger(active).values.map(_._4).sum == ref.values.map(_._4).sum
    }
}
