package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — A7 word count (the reference's
  * canonical function example, docs/en/game6-function.md:15-23) plus the
  * training-data-pipeline text metrics (language-ID, quality scoring, token
  * counting, fingerprinting). All pure `functions._` — codegen'd, no UDFs.
  */
object TextOps {

  /** A7: word count — explode(split) → hash agg. The shuffle key is the word;
    * map-side partial counts keep the shuffle proportional to distinct words,
    * not tokens (critical at 100 TB of text).
    */
  val aggWordCount = GQuery(
    "agg_word_count",
    (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word")
        .agg(count(lit(1)).as("n")),
    oracle = Some(
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |) WHERE word <> '' GROUP BY word""".stripMargin),
    bench = true)

  /** Token count per document (whitespace tokenization) + char stats — the
    * basic corpus-statistics pass of a training-data pipeline.
    */
  val textTokenCount = GQuery(
    "text_token_count",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(filter_exprs(split(col("text"), " "))).as("n_tokens"),
          length(col("text")).as("n_chars_actual"),
          col("n_chars")),
    oracle = Some(
      """SELECT doc_id,
        |       len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens,
        |       length(text) AS n_chars_actual, n_chars
        |FROM documents""".stripMargin))

  private def filter_exprs(arr: org.apache.spark.sql.Column) =
    filter(arr, w => w =!= "")

  val queries: Seq[GQuery] = Seq(aggWordCount, textTokenCount)
}
