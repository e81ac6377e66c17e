package graft

import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

/** Invariant checks for the corpus-curation operators — the DuckDB oracle
  * gate proves engine parity; these pin the semantic properties the oracle
  * can't express (redaction completeness, weight bounds, flag consistency).
  */
class PipelineOpsSpec extends SparkSuite {

  test("text_repetition: fractions bounded, flag consistent with top share") {
    val out = PipelineOps.textRepetition.run(spark, smokeDir)
    val bad = out.filter(
      col("dup_bigram_frac_e4") < 0 || col("dup_bigram_frac_e4") > 10000 ||
        col("top_bigram_frac_e4") <= 0 || col("top_bigram_frac_e4") > 10000 ||
        col("top_count") > col("n_bigrams") ||
        col("n_distinct_bigrams") > col("n_bigrams") ||
        (col("flag_repetitive") =!=
          (col("top_count") * 100 >= col("n_bigrams") * 18)))
    assert(bad.count() === 0)
    assert(out.count() > 0)
  }

  test("pii_redact scrubs every planted contact and counts at least one each") {
    val out = PipelineOps.piiRedact.run(spark, smokeDir)
    assert(out.filter(col("n_emails") < 1 || col("n_phones") < 1).count() === 0)
    val leaked = out.filter(
      col("redacted").rlike("[a-z0-9.]+@[a-z0-9.]+") ||
        col("redacted").rlike("\\+[0-9][0-9-]{6,}"))
    assert(leaked.count() === 0)
    assert(out.filter(col("redacted").contains("<EMAIL>") &&
      col("redacted").contains("<PHONE>")).count() === out.count())
  }

  test("sample_weights: weights within cap, admissions within source size") {
    val out = PipelineOps.sampleWeights.run(spark, smokeDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nDocs = r.getAs[Long]("n_docs")
      val weight = r.getAs[Long]("weight_e6")
      val admitted = r.getAs[Long]("n_admitted")
      assert(weight > 0 && weight <= 3000000L)
      assert(admitted >= 0 && admitted <= nDocs)
      // a rate >= 1 admits everything (hash mod 1e6 is always < 1e6)
      if (weight >= 1000000L) assert(admitted === nDocs)
    }
    // shares must cover the corpus: sum(share_e6) within rounding of 1e6
    val shareSum = out.map(_.getAs[Long]("share_e6")).sum
    assert(shareSum > 1000000L - out.length && shareSum <= 1000000L)
  }

  test("mixture_balance: smallest source keeps everything-rate, kept within totals") {
    val out = PipelineOps.mixtureBalance.run(spark, smokeDir).collect()
    assert(out.nonEmpty)
    // the binding source (min tokens) gets rate exactly 10⁶; nobody exceeds it
    assert(out.exists(_.getAs[Long]("rate_ppm") === 1000000L))
    out.foreach { r =>
      assert(r.getAs[Long]("rate_ppm") <= 1000000L)
      assert(r.getAs[Long]("rate_ppm") >= 1L) // no source downsampled to zero
      assert(r.getAs[Long]("n_docs_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_tokens_kept") <= r.getAs[Long]("n_tokens"))
    }
    // admission is the declared hash test, not an approximation: replay it
    val perDoc = Tables.documents(spark, smokeDir).select(
      col("source"),
      expr("(doc_id % 1000003) * 2654435761 % 1000000").as("h"))
    val rates = out.map(r => r.getAs[String]("source") -> r.getAs[Long]("rate_ppm")).toMap
    val expectKept = perDoc.collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.count(_.getLong(1) < rates(s)).toLong }
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs_kept") === expectKept(r.getAs[String]("source")))
    }
  }

  test("text_length_histogram partitions the corpus exactly") {
    val hist = PipelineOps.textLengthHistogram.run(spark, smokeDir)
    val nDocs = hist.agg(sum("n_docs")).head.getLong(0)
    val corpus = Tables.documents(spark, smokeDir).count()
    assert(nDocs === corpus)
    val bad = hist.filter(
      col("min_tokens") > col("max_tokens") ||
        expr("min_tokens div 32") =!= col("bucket") ||
        expr("max_tokens div 32") =!= col("bucket"))
    assert(bad.count() === 0)
  }
}
