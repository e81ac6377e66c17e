package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDecontam

/** Streaming decontamination: contaminated documents are flagged on
  * arrival against the static benchmark set; clean documents are not.
  */
class StreamingDecontamSpec extends SparkSuite {

  test("stream docs matching benchmark are flagged; clean docs pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val benchText = "the quick brown fox jumps over the lazy dog again and again"
    val benchmark = Seq((900L, benchText)).toDF("doc_id", "text")
    val clean = "completely different content with no overlap whatsoever here at all"

    val input = MemoryStream[(Long, String)]
    val q = StreamingDecontam.candidateHits(
      input.toDF().toDF("doc_id", "text"), benchmark)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("decontam_hits").start()
    // batch 1: one contaminated (identical) doc, one clean doc
    input.addData((1L, benchText), (2L, clean))
    q.processAllAvailable()
    // batch 2: a near-copy arrives later — still flagged (stateless check)
    input.addData((3L, benchText + " with a tiny suffix"))
    q.processAllAvailable()
    q.stop()

    val hits = spark.table("decontam_hits")
      .select("corpus_doc", "bench_doc").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((1L, 900L)), s"identical doc not flagged: $hits")
    assert(hits.contains((3L, 900L)), s"near-copy not flagged: $hits")
    assert(!hits.exists(_._1 == 2L), s"clean doc wrongly flagged: $hits")
  }

  test("exact n-gram hits flag on arrival with batch parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq(
      (900L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val benchSh = StreamingDecontam.benchmarkShingles(benchmark)
    // doc 1 embeds one benchmark 3-gram mid-text (a LOCAL overlap — the
    // near-copy minhash form would miss it); doc 2 shares single words but
    // never 3 in a row; doc 3 is a verbatim copy
    val arrivals = Seq(
      (1L, "totally unrelated start then beta gamma delta and moving on"),
      (2L, "alpha only and gamma alone plus epsilon scattered through"),
      (3L, "alpha beta gamma delta epsilon zeta"))

    val input = MemoryStream[(Long, String)]
    val q = StreamingDecontam.ngramHits(
      input.toDF().toDF("doc_id", "text"), benchSh)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ngram_hits").start()
    // two batches: flagging is per-arrival, no cross-batch state
    input.addData(arrivals.take(2): _*)
    q.processAllAvailable()
    input.addData(arrivals.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val streamFlagged = spark.table("ngram_hits")
      .select("corpus_doc").distinct().as[Long].collect().toSet
    // batch twin: the SAME function over the full arrival set as a batch
    // frame — arrival-time flagging must equal what one batch pass finds
    val batchFlagged = StreamingDecontam.ngramHits(
      arrivals.toDF("doc_id", "text"), benchSh)
      .select("corpus_doc").distinct().as[Long].collect().toSet
    assert(streamFlagged == Set(1L, 3L),
      s"expected docs 1 and 3 flagged: $streamFlagged")
    assert(streamFlagged == batchFlagged,
      s"stream/batch parity broken: $streamFlagged vs $batchFlagged")
  }

  test("embedding hits flag on arrival, pair-identical to the batch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    // the batch query's exact benchmark derivation (round-16 re-arm): each
    // vec_id % 7 == 3 corpus vector with its LAST coordinate zeroed — a
    // deterministic near-paraphrase whose source stays in the corpus (the
    // float-side zeroing lands on the same doubles the batch derivation
    // produces, so cosines match term-for-term)
    val all = Tables.embeddings(spark, smokeDir).select("vec_id", "embedding")
    val bench = all.filter(col("vec_id") % 7 === 3)
      .withColumn("embedding",
        expr("transform(embedding, (x, i) -> IF(i = 63, CAST(0 AS FLOAT), x))"))
    val arrivals = all.filter(col("vec_id") % 7 =!= 0)
      .as[(Long, Array[Float])].collect()

    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingDecontam.embeddingHits(
      input.toDF().toDF("vec_id", "embedding"), bench)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("emb_hits").start()
    val half = arrivals.length / 2
    input.addData(arrivals.take(half): _*)
    q.processAllAvailable()
    input.addData(arrivals.drop(half): _*)
    q.processAllAvailable()
    q.stop()

    // band-level hits roll up to exactly the batch query's verified pairs
    val streamed = spark.table("emb_hits")
      .select("bench_vec", "corpus_vec", "cosine").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.operators.DedupOps.decontamEmbedding.run(spark, smokeDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed === batch,
      s"stream/batch pair sets differ: ${streamed.size} vs ${batch.size}")
    assert(streamed.nonEmpty, "testbed must produce at least one hit")
  }
}
