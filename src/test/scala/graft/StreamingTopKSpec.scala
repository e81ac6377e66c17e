package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingTopK
import graft.streaming.StreamingTopK.{Ranked, Scored}

/** Streaming incremental top-k: rankings update across micro-batches with
  * bounded state, and the final ranking equals the batch top-k over the
  * same candidate set.
  */
class StreamingTopKSpec extends SparkSuite {

  private def latestRanking(table: String): Map[Long, Seq[(Long, Double)]] = {
    // changelog: the LAST emitted ranking per query wins — reconstruct by
    // keeping rows from each query's final emission (max batch ordering is
    // implicit in arrival order, so replay per query and take the last
    // full ranking: rank 1..k rows emitted together)
    val rows = spark.table(table)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    rows.groupBy(_._1).map { case (q, rs) =>
      // later emissions append after earlier ones; take the trailing run
      // that starts at the last rank==1 row
      val lastStart = rs.lastIndexWhere(_._4 == 1)
      q -> rs.drop(lastStart).sortBy(_._4).map(t => (t._2, t._3)).toSeq
    }
  }

  test("rankings update across batches; final == batch top-k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Scored]
      val q = StreamingTopK.topkPerQuery(input.toDS(), k = 3).toDF()
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("stream_topk").start()

      input.addData(
        Scored(0L, 10L, 0.5), Scored(0L, 11L, 0.9), Scored(0L, 12L, 0.7),
        Scored(1L, 20L, 0.3))
      q.processAllAvailable()
      val r1 = latestRanking("stream_topk")
      assert(r1(0L).map(_._1) === Seq(11L, 12L, 10L))
      assert(r1(1L).map(_._1) === Seq(20L))

      // batch 2: a better candidate displaces the tail; a duplicate id with
      // a worse score is ignored; query 1 grows
      input.addData(
        Scored(0L, 13L, 0.8), Scored(0L, 11L, 0.1), Scored(1L, 21L, 0.6))
      q.processAllAvailable()
      q.stop()
      val r2 = latestRanking("stream_topk")
      assert(r2(0L).map(_._1) === Seq(11L, 13L, 12L)) // 10 displaced, 11 keeps 0.9
      assert(r2(1L).map(_._1) === Seq(21L, 20L))
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("no-change batches emit nothing (bounded changelog)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Scored]
      val q = StreamingTopK.topkPerQuery(input.toDS(), k = 2).toDF()
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("stream_topk_nc").start()
      // a NaN score (zero-norm vector upstream) must not defeat the
      // no-change comparison: NaN != NaN under ==, so a naive equality
      // would re-emit forever once NaN is in the ranking
      input.addData(Scored(0L, 1L, Double.NaN), Scored(0L, 2L, 0.8))
      q.processAllAvailable()
      val n1 = spark.table("stream_topk_nc").count()
      // same candidates again, plus a strictly-worse one: ranking unchanged
      input.addData(Scored(0L, 1L, Double.NaN), Scored(0L, 3L, 0.1))
      q.processAllAvailable()
      q.stop()
      val n2 = spark.table("stream_topk_nc").count()
      assert(n1 === n2, "unchanged ranking must not re-emit")
      assert(n1 === 2L)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
