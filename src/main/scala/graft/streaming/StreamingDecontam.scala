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

  /** Streaming SEMANTIC decontamination — the arrival-time form of the
    * batch `decontam_embedding` query: each arriving (vec_id, embedding)
    * row computes its banded sign-LSH buckets row-locally, probes the
    * STATIC benchmark's bucket rows (broadcast by the stream-static
    * join), and verifies the cosine inline — the benchmark vectors ride
    * its bucket rows, so the verified hit emits in the same projection.
    * Stateless like the lexical forms: no keyed state, no watermark; one
    * row per (corpus, bench, band) agreement (pair-level dedup across
    * bands is the consumer's rollup — a streaming distinct would be
    * cross-batch state).
    */
  def embeddingHits(vecs: DataFrame, benchVecs: DataFrame): DataFrame = {
    import graft.operators.{DedupOps, SimilarityOps}
    def bucketRows(e: DataFrame): DataFrame = {
      val bucketed = (0 until DedupOps.LshBands).foldLeft(
        e.select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))) {
        (df, b) => SimilarityOps.withBandBucket(df, b, DedupOps.LshBandPlanes, s"b$b")
      }
      bucketed.select(col("vec_id"), col("v"), col("nrm"),
        explode(array((0 until DedupOps.LshBands).map(b =>
          struct(lit(b).as("band"), col(s"b$b").as("bucket"))): _*)).as("bb"))
        .select(col("vec_id"), col("v"), col("nrm"),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }
    graft.functions.VectorExpressions.ensureRegistered(vecs.sparkSession)
    val bench = bucketRows(benchVecs)
      .select(col("vec_id").as("bench_vec"), col("v").as("bv"),
        col("nrm").as("bnrm"), col("band"), col("bucket"))
    bucketRows(vecs)
      .join(broadcast(bench), Seq("band", "bucket"))
      .withColumn("cos", expr("graft_dot(v, bv)") / (col("nrm") * col("bnrm")))
      .filter(col("cos") >= DedupOps.CosineThreshold)
      .select(col("vec_id").as("corpus_vec"), col("bench_vec"),
        col("band"), round(col("cos"), 4).as("cosine"))
  }
}
