package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** Streaming sub-document boilerplate removal — the arrival-time form of
  * the batch `dedup_span_boilerplate` query: each arriving document is
  * REWRITTEN (boilerplate spans dropped, order preserved) the moment it
  * arrives.
  *
  * The boilerplate span set needs corpus-wide span frequencies, which an
  * unbounded stream cannot observe — so, exactly like the df-capped
  * shingle set in [[StreamingDecontam.ngramHits]], it is a batch-refreshed
  * artifact the stream consumes. Because the rewrite must keep duplicate
  * spans and their order (a join or array_except would dedup), the
  * artifact rides along as ONE array literal and the scrub is a row-local
  * `filter(spans, s -> !array_contains(...))` — no join, no state, no
  * shuffle; per-batch work is stream-rows × spans-per-doc. The literal is
  * HARD-BOUNDED at build time ([[CorpusOps.boilerplateArtifact]] cuts at
  * top-N by df — an absolute-df set grows with the corpus, so an unbounded
  * collect here is the batch path's broadcast hazard in driver form); a
  * production corpus whose artifact saturates the bound swaps the linear
  * array_contains for the Bloom-bitset probe `decontam_bloom`
  * demonstrates, unchanged semantics.
  */
object StreamingBoilerplate {

  /** (doc_id, text) stream → (doc_id, n_spans, n_kept, n_removed,
    * clean_text) per arriving doc with at least one token — the batch
    * query's exact output shape, computed row-locally.
    */
  def scrub(docs: DataFrame, boilerSpans: Seq[String]): DataFrame = {
    val w = CorpusOps.SpanW
    docs
      .withColumn("t", filter(split(col("text"), " "), x => x =!= ""))
      .filter(size(col("t")) >= 1)
      .withColumn("spans", expr(
        s"""transform(sequence(1, (size(t) + ${w - 1}) div $w),
           |  j -> array_join(slice(t, (j-1)*$w + 1, $w), ' '))""".stripMargin))
      .withColumn("kept",
        filter(col("spans"), s => !array_contains(typedLit(boilerSpans), s)))
      .select(col("doc_id"),
        size(col("spans")).cast("long").as("n_spans"),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("spans")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("clean_text"))
  }
}
