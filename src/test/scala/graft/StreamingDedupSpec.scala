package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDedup

/** Streaming LSH: candidate pairs are discovered incrementally — including
  * pairs whose members arrive in DIFFERENT micro-batches (bucket state
  * carries across batches).
  */
class StreamingDedupSpec extends SparkSuite {

  test("near-dup pairs found within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      val other = "completely different content with no overlap whatsoever here at all"
      val input = MemoryStream[(Long, String)]
      val docs = input.toDF().toDF("doc_id", "text")
      val q = StreamingDedup.candidatePairs(docs).toDF()
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("stream_pairs").start()
      // batch 1: two identical docs + one unrelated
      input.addData((1L, base), (2L, base), (10L, other))
      q.processAllAvailable()
      val afterB1 = spark.table("stream_pairs")
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterB1.contains((1L, 2L)), s"in-batch pair missing: $afterB1")
      assert(!afterB1.exists(p => p._1 == 10L || p._2 == 10L),
        "unrelated doc must not pair")
      // batch 2: a third copy arrives later -> pairs against BOTH prior members
      input.addData((3L, base))
      q.processAllAvailable()
      q.stop()
      val afterB2 = spark.table("stream_pairs")
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(Set((1L, 3L), (2L, 3L)).subsetOf(afterB2),
        s"cross-batch pairs missing: $afterB2")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming candidates match the batch banding on the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // real corpus slice: all sf0.001 documents in one batch
      val docs = Tables.documents(spark, smokeDir).select("doc_id", "text")
      val input = MemoryStream[(Long, String)]
      val q = StreamingDedup.candidatePairs(input.toDF().toDF("doc_id", "text"))
        .toDF()
        .writeStream.outputMode(OutputMode.Append)
        .format("memory").queryName("stream_pairs2").start()
      input.addData(docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
      q.stop()
      val streamed = spark.table("stream_pairs2")
        .select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sig = operators.DedupOps.rowLocalSignatures(
        operators.DedupOps.hashedShinglesOf(docs))
      val bands = operators.DedupOps.bandKeys(sig)
      val batch = bands.as("a")
        .join(bands.as("b"),
          org.apache.spark.sql.functions.col("a.band_key") ===
            org.apache.spark.sql.functions.col("b.band_key") &&
            org.apache.spark.sql.functions.col("a.doc_id") <
              org.apache.spark.sql.functions.col("b.doc_id"))
        .select(org.apache.spark.sql.functions.col("a.doc_id"),
          org.apache.spark.sql.functions.col("b.doc_id"))
        .distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
