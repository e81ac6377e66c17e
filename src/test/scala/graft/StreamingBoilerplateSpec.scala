package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.CorpusOps
import graft.streaming.StreamingBoilerplate

/** Streaming span scrub: arriving docs are rewritten against the
  * batch-refreshed boilerplate artifact, row-identically to the batch
  * `dedup_span_boilerplate` query.
  */
class StreamingBoilerplateSpec extends SparkSuite {

  test("arrival-time scrub matches the batch rewrite doc-for-doc") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, smokeDir).select("doc_id", "text")
    // the artifact, exactly as a batch refresh would build it (the bounded
    // builder — the only form the streaming scrub accepts; the testbed's
    // boiler set is far under the bound, so nothing truncates here)
    val boiler = CorpusOps.boilerplateArtifact(docs)
    assert(boiler.nonEmpty, "testbed must produce a non-empty artifact")
    assert(boiler.toSet ===
      CorpusOps.boilerplateSpans(docs).collect().map(_.getString(0)).toSet,
      "under the bound the artifact must equal the full boiler set")

    // sample deliberately: rewritten docs AND untouched docs, so the
    // parity check covers both branches regardless of corpus order
    val batchAll = CorpusOps.dedupSpanBoilerplate.run(spark, smokeDir)
    import org.apache.spark.sql.functions.col
    val rewrittenIds = batchAll.filter(col("n_removed") > 0)
      .select("doc_id").limit(20).as[Long].collect()
    val untouchedIds = batchAll.filter(col("n_removed") === 0)
      .select("doc_id").limit(20).as[Long].collect()
    assert(rewrittenIds.nonEmpty, "testbed must rewrite at least one doc")
    val ids = (rewrittenIds ++ untouchedIds).toSet
    val sample = docs.filter(col("doc_id").isin(ids.toSeq: _*))
      .as[(Long, String)].collect()
    val input = MemoryStream[(Long, String)]
    val q = StreamingBoilerplate.scrub(
      input.toDF().toDF("doc_id", "text"), boiler)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("span_scrub").start()
    // two batches: the rewrite is per-arrival, no cross-batch state
    input.addData(sample.take(20): _*)
    q.processAllAvailable()
    input.addData(sample.drop(20): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("span_scrub").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    val batch = batchAll
      .filter(col("doc_id").isin(sample.map(_._1): _*))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (id, row) =>
      assert(row === batch(id), s"doc $id diverges from batch rewrite")
    }
    // non-vacuous: the sample must include at least one rewritten doc
    assert(streamed.values.exists(_._3 > 0),
      "sample contained no boilerplate removal — widen the sample")
  }
}
