package graft

import graft.operators.{DedupOps, PipelineOps, TextOps}
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The streaming twin of the batch e2e pipeline (normalize → gate →
  * exact dedup → pack), asserted STREAM-FOLD ≡ BATCH-FOLD on the same
  * corpus — end-to-end across all four stages in one query, not
  * per-operator — and again across a checkpoint restart with the second
  * copy of pre-restart duplicates arriving after the restart (a reset
  * dedup store would re-emit them; a reset pack store would restart every
  * shard's cum-sum at zero; either yields a visibly different packing).
  */
class StreamingPipelineSpec extends SparkSuite {

  import spark.implicits._
  implicit private def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def withRocksDB[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private type Doc = (Long, String, String)

  /** Corpus: the testbed documents plus a duplicate copy of every 3rd doc
    * at doc_id+100000 — so dedup has real cross-batch work and the
    * duplicate of a pre-restart doc arrives post-restart. */
  private lazy val corpus: Seq[Doc] = {
    val base = Tables.documents(spark, smokeDir)
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      .sortBy(_._1)
    val dups = base.filter(_._1 % 3 == 0)
      .map { case (id, s, t) => (id + 100000L, s, t) }
    base ++ dups // already doc_id-ordered: dups all sort after originals
  }

  /** Batch-refreshed gate artifact: sources whose mean quality clears the
    * corpus median — computed once, handed to both folds. */
  private lazy val passingSources: Set[String] = {
    val normed = TextOps.normalizeOf(
        corpus.toDF("doc_id", "source", "text"), keep = Seq("source"))
      .select(col("doc_id"), col("source"), col("norm").as("text"))
    val means = TextOps.qualityStatsOf(normed)
      .select(col("source"), TextOps.qualityMilli.as("quality_milli"))
      .groupBy("source")
      .agg(expr("sum(quality_milli) div count(1)").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._2)
    val thr = means(means.size / 2)._2 // median: some sources must fail
    means.filter(_._2 >= thr).map(_._1).toSet
  }

  /** The batch fold with the registry's own stage semantics (the
    * PipelineScaleSmoke composition, gate artifact shared with the
    * stream). Returns the packed rows (kept docs only). */
  private def batchPacked(docs: DataFrame): Set[(Long, String, Long, Long, Long)] = {
    val normed = TextOps.normalizeOf(docs, keep = Seq("source"))
      .select(col("doc_id"), col("source"), col("norm").as("text"))
    val q = TextOps.qualityStatsOf(normed)
      .select(col("doc_id"), col("source"),
        col("n").cast("long").as("n_tokens"),
        array_join(col("t"), " ").as("text"))
    val gated = q.filter(col("source").isInCollection(passingSources))
    val kept = DedupOps.exactDupRank(gated, keep = Seq("source", "n_tokens"))
      .filter(col("rn") === 1)
      .withColumn("shard", expr(PipelineOps.shardHash("doc_id")))
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    kept
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before div ${PipelineOps.PackCapacity}"))
      .select("doc_id", "source", "shard", "n_tokens", "pack_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSet
  }

  private def sinkBuffer() = scala.collection.mutable.Buffer.empty[
    (Long, String, Long, Long, Long)]

  private def startQuery(input: MemoryStream[Doc], ck: String,
                         buf: scala.collection.mutable.Buffer[(Long, String, Long, Long, Long)]) =
    StreamingPipeline.pack(
        input.toDF().toDF("doc_id", "source", "text"),
        passingSources, PipelineOps.PackCapacity)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingPipeline.PackedDoc], _: Long) =>
        val rows = batch.collect()
          .map(p => (p.doc_id, p.source, p.shard, p.n_tokens, p.pack_id))
        buf.synchronized { buf ++= rows }
        () // Unit: the overloaded foreachBatch must not see the Buffer
      }
      .start()

  test("stream-fold equals batch-fold over the whole corpus") { withRocksDB {
    val want = batchPacked(corpus.toDF("doc_id", "source", "text"))
    assert(want.nonEmpty && want.size < corpus.size,
      "gate+dedup must actually drop rows or the parity is vacuous")
    val input = MemoryStream[Doc]
    val buf = sinkBuffer()
    val q = startQuery(input, java.nio.file.Files
      .createTempDirectory("graft-pipe-ck").toString, buf)
    // doc_id-ordered micro-batches (the replay-order contract)
    corpus.grouped(120).foreach { g => input.addData(g); q.processAllAvailable() }
    q.stop()
    assert(buf.map(_._1).distinct.size === buf.size, "a doc packed twice")
    assert(buf.toSet === want)
  }}

  test("pipeline state survives a checkpoint restart: dedup memory and pack cursors") {
    withRocksDB {
      val want = batchPacked(corpus.toDF("doc_id", "source", "text"))
      val ck = java.nio.file.Files.createTempDirectory("graft-pipe-ck2").toString
      val input = MemoryStream[Doc]
      val buf = sinkBuffer()
      val (firstHalf, secondHalf) = corpus.splitAt(corpus.size / 2)

      val q1 = startQuery(input, ck, buf)
      firstHalf.grouped(100).foreach { g => input.addData(g); q1.processAllAvailable() }
      q1.stop()
      val emittedBefore = buf.size
      assert(emittedBefore > 0)

      // fed while DOWN; the restart must resume from checkpointed offsets
      // with restored dedup/pack state — every duplicate of a 1st-half doc
      // arrives here, and every shard's cum-sum continues mid-count
      secondHalf.grouped(100).foreach(input.addData(_))
      val q2 = startQuery(input, ck, buf)
      q2.processAllAvailable()
      q2.stop()

      assert(buf.map(_._1).distinct.size === buf.size,
        "restart re-emitted an already-packed doc (dedup state reset)")
      assert(buf.toSet === want,
        "restarted stream-fold diverged from the batch fold")
    }
  }
}
