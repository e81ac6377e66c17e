package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming benchmark decontamination: an unbounded document stream is
  * checked against a STATIC benchmark set the moment each document
  * arrives — the streaming form of the batch decontam_minhash query.
  *
  * Stateless by construction: the benchmark's banded signatures are a
  * static frame (broadcast by the stream-static join), the stream side
  * computes row-local signatures, and a band match emits a candidate hit
  * immediately. No keyed state, no watermark — per-batch work is
  * stream-rows × matched bands only, so this runs unchanged at any
  * stream rate. Exact-Jaccard verification of hits happens downstream
  * against a document store (candidates carry both ids).
  */
object StreamingDecontam {

  /** (doc_id, text) stream × (doc_id, text) static benchmark →
    * (corpus_doc, bench_doc, band_key) candidate hits.
    */
  def candidateHits(docs: DataFrame, benchmark: DataFrame): DataFrame = {
    val benchBands = graft.operators.DedupOps.bandKeys(
      graft.operators.DedupOps.rowLocalSignatures(
        graft.operators.DedupOps.hashedShinglesOf(benchmark)))
      .select(col("doc_id").as("bench_doc"), col("band_key"))
    val streamBands = graft.operators.DedupOps.bandKeys(
      graft.operators.DedupOps.rowLocalSignatures(
        graft.operators.DedupOps.hashedShinglesOf(docs)))
      .select(col("doc_id").as("corpus_doc"), col("band_key"))
    streamBands
      .join(broadcast(benchBands), Seq("band_key"))
      .select(col("corpus_doc"), col("bench_doc"), col("band_key"))
  }
}
