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

  /** Streaming exact n-gram decontamination — the arrival-time form of the
    * batch `decontam_ngram_exact` query (any verbatim shingle overlap with
    * the benchmark flags the doc, however local). `benchShingles` is the
    * PRECOMPUTED shingle-hash set (one `tk` column): the batch query's
    * df-cap needs corpus-wide document frequencies, which an unbounded
    * stream cannot observe, so the capped set is a batch-refreshed
    * artifact the stream consumes as a static broadcast side —
    * [[benchmarkShingles]] builds the uncapped form from raw benchmark
    * text. Stateless like [[candidateHits]]: shingle hashing is row-local,
    * the join is stream × broadcast-static, and each shared shingle emits
    * a (corpus_doc, tk) hit the moment the doc arrives. Per-doc counts /
    * hit ratios are a downstream aggregation (update mode or a batch
    * rollup), exactly as exact-Jaccard verification is for
    * [[candidateHits]].
    */
  def ngramHits(docs: DataFrame, benchShingles: DataFrame): DataFrame =
    graft.operators.DedupOps.hashedShinglesOf(docs)
      .select(col("doc_id").as("corpus_doc"), explode(col("tks")).as("tk"))
      .join(broadcast(benchShingles.select(col("tk"))), Seq("tk"))
      .select(col("corpus_doc"), col("tk"))

  /** Distinct shingle-hash set of a static (doc_id, text) benchmark frame —
    * the `benchShingles` input to [[ngramHits]] when no df-capped artifact
    * exists yet.
    */
  def benchmarkShingles(benchmark: DataFrame): DataFrame =
    graft.operators.DedupOps.hashedShinglesOf(benchmark)
      .select(explode(col("tks")).as("tk")).distinct()
}
