package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig}

/** The ARRIVAL-TIME twin of the batch pretraining pipeline (normalize →
  * per-source quality gate → exact dedup → sequence packing — the
  * composition PipelineScaleSmoke measures at 8.4M docs): the same four
  * stages as ONE streaming query over an unbounded document stream.
  *
  * Stage mapping, chosen so stream-fold ≡ batch-fold exactly:
  *
  *  - normalize + tokenize/quality: stateless projections — the
  *    registry's own TextOps exprs run unchanged on a streaming frame;
  *  - quality gate: the batch gate needs WHOLE-CORPUS source means, which
  *    an unbounded stream never has — so the gate consumes a
  *    batch-refreshed ARTIFACT (the passing-source set computed from the
  *    corpus snapshot, same pattern as the decontam Bloom artifact).
  *    Deployment shape: a periodic batch job recomputes the artifact, the
  *    stream picks it up on restart;
  *  - exact dedup: first arrival per content digest, keyed ValueState on
  *    the SAME (xxhash64(text,1), xxhash64(text,2), length) composite the
  *    batch exactDupRank windows on. First-arrival equals the batch
  *    window's min-doc_id winner whenever the replay feeds doc_id-ordered
  *    micro-batches (the reference's per-topic replay order, ST8) —
  *    within one batch the processor sorts, across batches order is the
  *    source contract;
  *  - packing: per-(source, shard) running token cum-sum in keyed
  *    ValueState; pack_id = cum_before div capacity — bitwise the batch
  *    window's running sum under the same arrival order.
  *
  * Both stateful stages ride one shuffle each (digest, then
  * (source, shard)) — the exact exchange geometry of the batch plan.
  * Effectively-once: every stage's state lives in the checkpointed store,
  * so a restart resumes mid-corpus with no re-emission and no loss
  * (StreamingPipelineSpec stops the query mid-stream and asserts the
  * final packing equals the uninterrupted batch answer).
  */
object StreamingPipeline {

  final case class PipeDoc(
      doc_id: Long, source: String, digest: String, n_tokens: Long, shard: Long)
  final case class PackedDoc(
      doc_id: Long, source: String, shard: Long, n_tokens: Long, pack_id: Long)

  /** Keyed by content digest: emit only the first-arriving document.
    * Within a micro-batch "first" is the smallest doc_id (deterministic
    * under any intra-batch shuffle order); across batches, first arrival.
    */
  class FirstPerDigest extends StatefulProcessor[String, PipeDoc, PipeDoc] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
        TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[PipeDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[PipeDoc] = {
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        Iterator.single(rows.minBy(_.doc_id))
      }
    }
  }

  /** Keyed by (source, shard): the packing cum-sum. State is the tokens
    * packed so far in this shard; each arriving doc reads its pack_id off
    * the running total, exactly like the batch window's
    * `sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING, -1)`.
    */
  class PackAssigner(capacity: Long)
      extends StatefulProcessor[(String, Long), PipeDoc, PackedDoc] {
    @transient private var cum: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(
        key: (String, Long),
        rows: Iterator[PipeDoc],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[PackedDoc] = {
      var c = if (cum.exists()) cum.get() else 0L
      val out = rows.toArray.sortBy(_.doc_id).map { d =>
        val pid = c / capacity
        c += d.n_tokens
        PackedDoc(d.doc_id, d.source, d.shard, d.n_tokens, pid)
      }
      cum.update(c)
      out.iterator
    }
  }

  /** (doc_id, source, text) stream → packed docs. `passingSources` is the
    * batch-refreshed gate artifact; `capacity` the pack token budget
    * (PipelineOps.PackCapacity in the registry composition).
    */
  def pack(docs: DataFrame, passingSources: Set[String],
           capacity: Long): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.operators.{PipelineOps, TextOps}

    val normed = TextOps.normalizeOf(docs, keep = Seq("source"))
      .select(col("doc_id"), col("source"), col("norm").as("text"))
    val q = TextOps.qualityStatsOf(normed)
      .select(col("doc_id"), col("source"),
        col("n").cast("long").as("n_tokens"),
        array_join(col("t"), " ").as("text"))
    val gated = q.filter(col("source").isInCollection(passingSources))
    val keyed = gated.select(
        col("doc_id"), col("source"),
        // the batch exactDupRank composite, one string key for the state
        concat_ws(":",
          xxhash64(col("text"), lit(1)),
          xxhash64(col("text"), lit(2)),
          length(col("text"))).as("digest"),
        col("n_tokens"),
        expr(PipelineOps.shardHash("doc_id")).as("shard"))
      .as[PipeDoc]

    val deduped = keyed
      .groupByKey(_.digest)
      .transformWithState(new FirstPerDigest, TimeMode.None(), OutputMode.Append())

    deduped
      .groupByKey(d => (d.source, d.shard))
      .transformWithState(new PackAssigner(capacity), TimeMode.None(),
        OutputMode.Append())
  }
}
