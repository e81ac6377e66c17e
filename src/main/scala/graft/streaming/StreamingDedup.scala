package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming near-duplicate detection: the batch MinHash+LSH pipeline
  * (operators.DedupOps) run incrementally over an unbounded document
  * stream. Signatures are row-local projections (no state); LSH buckets
  * live in keyed ListState — when a new document lands in a bucket, it is
  * paired against the bucket's existing members and the candidate pairs
  * are emitted immediately (append mode).
  *
  * Scale posture: state per bucket is the member id list (near-dup buckets
  * stay small by construction; a hot bucket is a pathological signature and
  * can be TTL'd via TTLConfig). The shuffle key is the band key — identical
  * to the batch plan's banding shuffle. Requires the RocksDB state store
  * (transformWithState).
  */
object StreamingDedup {

  final case class BandedDoc(band_key: String, doc_id: Long)
  final case class CandidatePair(doc_a: Long, doc_b: Long, band_key: String)

  /** Keyed by band_key; pairs each new member against all prior members. */
  class BucketProcessor
      extends StatefulProcessor[String, BandedDoc, CandidatePair] {
    @transient private var members: org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[BandedDoc],
        timerValues: TimerValues): Iterator[CandidatePair] = {
      val existing = scala.collection.mutable.LinkedHashSet.empty[Long]
      members.get().foreach(existing += _)
      val out = Seq.newBuilder[CandidatePair]
      rows.foreach { r =>
        if (!existing.contains(r.doc_id)) {
          existing.foreach { prev =>
            out += CandidatePair(math.min(prev, r.doc_id),
              math.max(prev, r.doc_id), key)
          }
          members.appendValue(r.doc_id)
          existing += r.doc_id
        }
      }
      out.result().iterator
    }
  }

  /** (doc_id, text) stream → candidate near-dup pairs, discovered the
    * moment the second member of a bucket arrives. Downstream either
    * verifies jaccard against a document store or routes to review.
    */
  def candidatePairs(docs: DataFrame): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // r19 (guide §4): column-level rename + as[BandedDoc] instead of a
    // typed .map closure — the lambda was an opaque row-at-a-time
    // deserialize/reserialize boundary right before the banding shuffle,
    // defeating whole-stage codegen and column pruning on the hot path
    val banded = graft.operators.DedupOps.bandKeys(
      graft.operators.DedupOps.rowLocalSignatures(
        graft.operators.DedupOps.hashedShinglesOf(docs)))
      .select(col("band_key"), col("doc_id"))
      .as[BandedDoc]
    banded
      .groupByKey(_.band_key)
      .transformWithState(new BucketProcessor, TimeMode.None(), OutputMode.Append())
  }
}
