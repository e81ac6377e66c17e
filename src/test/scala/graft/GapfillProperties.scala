package graft.operators

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSuite

/** Differential property for [[AnalyticsOps.timeseriesGapfill]]: on random
  * sparse series the distributed grid + forward-fill window must equal a
  * driver fold of the definition — every hour in [min, max] present
  * exactly once per series, gap hours carrying cnt 0 and the last
  * observed value, in-hour ties resolved by the (ts, event_id) changelog
  * order. Random shapes cover what the fixture cannot: multi-series
  * frames with different spans, adjacent-hour runs, single-event series,
  * and ties inside one hour.
  */
object GapfillProperties extends Properties("gapfill") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** (series, event_id, epochSecond, value_e2). */
  private val gen: Gen[Seq[(String, Long, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.sequence[Seq[(String, Long, Long, Long)], (String, Long, Long, Long)](
      (1 to n).map { i =>
        for {
          s <- Gen.oneOf("a", "b", "c")
          sec <- Gen.choose(0L, 40L * 3600L) // ~40-hour span, sparse
          v <- Gen.choose(-500L, 500L)
        } yield (s, i.toLong, sec, v)
      })
  } yield rows

  private def reference(
      rows: Seq[(String, Long, Long, Long)]): Seq[(String, Long, Long, Long)] =
    rows.groupBy(_._1).toSeq.flatMap { case (series, rs) =>
      val byHour = rs.groupBy(_._3 / 3600)
      val h0 = byHour.keys.min
      val h1 = byHour.keys.max
      var lastV = 0L
      (h0 to h1).map { hr =>
        val in = byHour.getOrElse(hr, Seq.empty)
        if (in.nonEmpty)
          // last write in the hour under the (ts, event_id) order
          lastV = in.maxBy(r => (r._3, r._2))._4
        (series, hr, in.size.toLong, lastV)
      }
    }

  property("grid + forward-fill == driver fold of the definition") =
    forAll(gen) { rows =>
      val s = SparkSuite.spark
      import s.implicits._
      import org.apache.spark.sql.functions._
      val df = rows.toDF("event_type", "event_id", "sec", "v_e2")
        .withColumn("ts", expr("timestamp_seconds(sec)"))
        .withColumn("value", col("v_e2").cast("double") / 100.0)
        .select("event_type", "event_id", "ts", "value")
      val got = AnalyticsOps.timeseriesGapfill(df)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      got == reference(rows).toSet
    }
}
