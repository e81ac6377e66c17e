package graft.operators

import graft.{GQuery, Materialize, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-restructuring operators: sub-document boilerplate removal and
  * deterministic training-order assignment. Both are the "between curation
  * and training" steps of a large-scale data pipeline — DedupOps drops whole
  * documents, these rewrite/arrange what survives.
  *
  * Scale posture (100 TB): the boilerplate span set is the heavy-hitter
  * tail of the span-frequency distribution — small RELATIVE to the corpus,
  * but with an absolute df threshold its absolute size grows with the
  * corpus, so "it broadcasts" is an assumption, not a property. The
  * removal join therefore guards it: the artifact is staged and counted
  * driver-side ([[keptSpans]]); under [[BoilerBroadcastMaxKey]] rows it
  * broadcasts, over it the anti-join runs co-keyed on the span key (the
  * same key the df count already shuffled on — one more co-keyed join,
  * not a new plan shape). Shard assignment is row-local hashing plus a
  * per-shard (not global) sort.
  */
object CorpusOps {

  /** Non-overlapping span width in tokens. 3 matches the repo-wide shingle
    * width so the span vocabulary is comparable to the dedup family's.
    */
  final val SpanW = 3

  /** A span occurring this many times corpus-wide is boilerplate. At sf0.01
    * (500 docs, ~18 spans/doc, max span df 10) this removes 47 of 9 216 span
    * instances — enough to exercise every branch (partial removal, untouched
    * docs) while leaving the corpus mostly intact. Production tunes this to
    * the df knee exactly as [[DedupOps.ShingleDfCap]] documents.
    */
  final val SpanBoilerDf = 8L

  /** (doc_id, text) frame → (doc_id, i, span) rows: non-overlapping
    * [[SpanW]]-token spans, i the 1-based ordinal used to restore document
    * order after the anti-join. Row-local (sequence → slice → array_join,
    * all codegen'd). Shared by the batch query and the artifact build the
    * streaming scrub consumes.
    */
  private[graft] def spanRows(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => w =!= "").as("t"))
      .filter(size(col("t")) >= 1)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, (size(t) + ${SpanW - 1}) div $SpanW),
           |  j -> array_join(slice(t, (j-1)*$SpanW + 1, $SpanW), ' '))"""
          .stripMargin)))
      .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("span"))

  /** The boilerplate artifact: spans with corpus-wide df ≥ [[SpanBoilerDf]]
    * (one map-side-combinable shuffle on the span key; the result is the
    * heavy-hitter tail — small by Zipf).
    */
  def boilerplateSpans(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    spanRows(docs).groupBy("span").agg(count(lit(1)).as("df"))
      .filter(col("df") >= SpanBoilerDf)
      .select("span")

  /** Memoized + persisted boilerplate-span artifact per (app, dataset) —
    * the same index-artifact treatment as the Bloom words and capped
    * shingles (DedupOps): the span-df aggregate is a full-corpus scan +
    * shuffle, a build-once artifact of the DATASET, not of any one query.
    * Two registry queries (dedup_span_boilerplate, pipeline_scrub_pack)
    * walk it, and across sessions the ArtifactStore write-through means a
    * restart serves the persisted copy instead of re-scanning 100 TB. */
  private val boilerSpanFrames = new graft.DatasetMemo[org.apache.spark.sql.DataFrame](
    Some(graft.ArtifactStore.frame("boiler_spans")))

  def boilerSpans(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame =
    boilerSpanFrames.get(s, d, "documents.parquet") {
      boilerplateSpans(Tables.documents(s, d))
    }

  /** Broadcast guard for the boilerplate artifact, as a session conf so
    * the fallback-parity spec can trip it without a special corpus. The
    * default (64k spans, a few MB broadcast) is the regime where forcing
    * the broadcast is obviously right; production tunes it to executor
    * memory exactly like autoBroadcastJoinThreshold.
    */
  final val BoilerBroadcastMaxKey = "spark.graft.boiler.broadcast.max"
  final val BoilerBroadcastMaxDefault = 65536L

  /** Driver-side artifact for the STREAMING scrub, which must carry the
    * span set as one literal (the rewrite is row-local — see
    * [[graft.streaming.StreamingBoilerplate]]) and so needs a hard size
    * bound where the batch path gets a plan fallback: spans ranked by
    * (df DESC, span) and cut at maxSpans. Truncation drops the LEAST
    * frequent boilerplate first — the bounded artifact is exactly the
    * heavy-hitter prefix, and a batch refresh re-ranks as the corpus
    * grows. Deterministic (total order), so batch/stream parity is
    * testable with the bound active.
    */
  def boilerplateArtifact(
      docs: org.apache.spark.sql.DataFrame,
      maxSpans: Int = BoilerBroadcastMaxDefault.toInt): Seq[String] =
    spanRows(docs).groupBy("span").agg(count(lit(1)).as("df"))
      .filter(col("df") >= SpanBoilerDf)
      .orderBy(col("df").desc, col("span"))
      .limit(maxSpans)
      .select("span").collect().map(_.getString(0)).toSeq

  /** The removal anti-join with the artifact's broadcast assumption made a
    * DRIVER-CHECKED decision instead of a fixed claim: one probe job runs
    * the artifact aggregate and collects AT MOST bound+1 rows
    * (executeCollectLimit — the driver never holds more than the bound),
    * then
    *
    *  - ≤ bound: broadcast left-anti against the COLLECTED rows as a local
    *    relation — the Zipf-tail regime; no shuffle of the span rows, and
    *    the main query re-derives nothing (the broadcast side is a
    *    driver-local literal, so the probe job is the only artifact pass);
    *  - > bound: plain left-anti co-keyed on the span key, the artifact
    *    staged ([[Materialize.stage]]) so the overflow probe's discarded
    *    pass is the only duplicate work — one shuffle of the span rows, on
    *    the same key the df count already shuffled, so the fallback is a
    *    known plan shape, not a new hazard. Spark/AQE may still broadcast
    *    if runtime stats allow; the point is the plan no longer FORCES a
    *    broadcast of a corpus-sized artifact.
    *
    * Both branches compute the identical result (the oracle is shared),
    * which is why the guard lives in the plan, not the semantics.
    */
  private[graft] def keptSpans(
      spans: org.apache.spark.sql.DataFrame,
      boiler: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val spark = boiler.sparkSession
    val bound = spark.conf.getOption(BoilerBroadcastMaxKey)
      .map(_.toLong).getOrElse(BoilerBroadcastMaxDefault)
    val probeN = math.min(bound, Int.MaxValue - 1L).toInt + 1
    val head = boiler.limit(probeN).collect()
    if (head.length < probeN) {
      val local = spark.createDataFrame(
        java.util.Arrays.asList(head: _*), boiler.schema)
      spans.join(broadcast(local), Seq("span"), "left_anti")
    } else
      spans.join(Materialize.stageLazy(boiler), Seq("span"), "left_anti")
  }

  /** Shared oracle CTE chain: docs → (doc_id, i, span) rows → boilerplate
    * set → kept spans. The SQL twin of [[spanRows]]/[[boilerplateSpans]] +
    * the anti-join, reused by every span-family oracle.
    */
  private val SpanCtes =
    s"""sb_t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS t
       |  FROM documents),
       |sb_sp AS (
       |  SELECT doc_id,
       |         unnest(list_transform(
       |           generate_series(1, (len(t) + ${SpanW - 1}) // $SpanW),
       |           j -> {'i': j, 'span': array_to_string(
       |                   t[(j-1)*$SpanW + 1 : (j-1)*$SpanW + $SpanW], ' ')}))
       |           AS u
       |  FROM sb_t WHERE len(t) >= 1),
       |sb AS (SELECT doc_id, u.i AS i, u.span AS span FROM sb_sp),
       |sb_boiler AS (
       |  SELECT span FROM sb GROUP BY span HAVING count(*) >= $SpanBoilerDf),
       |sb_kept AS (SELECT s.* FROM sb s ANTI JOIN sb_boiler b USING (span))""".stripMargin

  /** Sub-document boilerplate removal — the RefinedWeb/CCNet "line-level
    * dedup" adapted to the single-line testbed corpus: the unit is a
    * non-overlapping [[SpanW]]-token span instead of a newline-delimited
    * line (reference analog: the corpus-wide repeated-content drop that
    * whole-doc dedup cannot express; a doc is REWRITTEN, not removed).
    *
    * Plan shape: spans are generated row-locally ([[spanRows]]), the
    * span-frequency count is one map-side-combinable shuffle on the span
    * key, the boilerplate set ([[boilerplateSpans]]) feeds the guarded
    * left-anti join ([[keptSpans]] — broadcast when driver-verified small,
    * co-keyed otherwise), and reassembly shuffles kept spans once on doc_id.
    * The corpus is never joined span×span, so there is no quadratic hazard
    * at any scale; a doc whose every span is boilerplate survives with
    * empty clean_text (left join from the totals side). Arrival-time twin:
    * `streaming/StreamingBoilerplate.scrub` (same output shape, artifact-
    * driven).
    */
  /** The full scrub over ANY (doc_id, text) corpus — shared by the testbed
    * query below and the span-heavy fallback smoke
    * ([[graft.tools.BoilerScaleSmoke]]). `boiler` defaults to deriving the
    * span artifact from `docs` inline; the registry query passes the
    * memoized+persisted [[boilerSpans]] instead.
    */
  def spanScrubOf(docs: org.apache.spark.sql.DataFrame,
                  boiler: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val spans = spanRows(docs)
    val kept = keptSpans(spans, boiler.getOrElse(boilerplateSpans(docs)))
    val clean = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(
          array_sort(collect_list(struct(col("i"), col("span")))),
          x => x.getField("span")),
        " ").as("clean_text"))
    val totals = spans.groupBy("doc_id").agg(count(lit(1)).as("n_spans"))
    totals.join(clean, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_spans") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  val dedupSpanBoilerplate = GQuery(
    "dedup_span_boilerplate",
    (s, d) => spanScrubOf(Tables.documents(s, d), Some(boilerSpans(s, d))),
    oracle = Some(
      s"""WITH $SpanCtes,
         |sb_clean AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |         string_agg(span, ' ' ORDER BY i) AS clean_text
         |  FROM sb_kept GROUP BY doc_id),
         |sb_tot AS (SELECT doc_id, count(*) AS n_spans FROM sb GROUP BY doc_id)
         |SELECT t.doc_id, t.n_spans,
         |       coalesce(c.n_kept, 0) AS n_kept,
         |       t.n_spans - coalesce(c.n_kept, 0) AS n_removed,
         |       coalesce(c.clean_text, '') AS clean_text
         |FROM sb_tot t LEFT JOIN sb_clean c USING (doc_id)""".stripMargin),
    bench = true)

  /** Number of training shards. Testbed-sized; production sets this to
    * O(executors × cores) so every shard's window sort fits one task.
    */
  final val ShuffleShards = 64L

  /** Deterministic distributed shuffle — the "globally shuffle the corpus
    * before training" step, without a global sort: shard = Knuth
    * multiplicative hash of doc_id (row-local, no shuffle), position within
    * shard = rank by an independent second hash (per-shard window sort, all
    * shards in parallel). Reproducible across engines and runs — the
    * scale-safe replacement for orderBy(rand()). Both hashes reduce doc_id
    * mod a prime below 2^20 before the multiply so the product never wraps
    * Long (the sample_hash_bernoulli overflow-parity rule). The shard is
    * the HIGH bits of the 32-bit Knuth product (same extraction as
    * pack_sequences): the low bits of an odd multiplier mod 2^k are a
    * bijection of the input's low bits — round-robin, not a hash.
    */
  val shuffleShards = GQuery(
    "shuffle_shards",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr(s"((doc_id % 1000003) * 2654435761) % 4294967296" +
            s" div ${4294967296L / ShuffleShards}").as("shard"),
          expr("(doc_id % 999983) * 2654435761 % 1000000007").as("h2"))
        .withColumn("pos", row_number()
          .over(Window.partitionBy("shard").orderBy(col("h2"), col("doc_id")))
          .cast("long"))
        .select("doc_id", "shard", "pos"),
    oracle = Some(
      s"""SELECT doc_id, shard, CAST(row_number() OVER (
         |         PARTITION BY shard ORDER BY h2, doc_id) AS BIGINT) AS pos
         |FROM (SELECT doc_id,
         |             ((doc_id % 1000003) * 2654435761) % 4294967296
         |               // ${4294967296L / ShuffleShards} AS shard,
         |             (doc_id % 999983) * 2654435761 % 1000000007 AS h2
         |      FROM documents)""".stripMargin))

  /** Composition flagship: boilerplate-scrubbed packing plan — the span
    * rewrite feeding the sequence-packing planner, i.e. "materialize the
    * training batches for the CLEANED corpus" in one query. Stages are the
    * operators above verbatim: [[spanRows]] → [[boilerplateSpans]]
    * broadcast anti-join → per-doc CLEAN token counts (sum of kept-span
    * token counts — one doc_id shuffle) → the [[PipelineOps.packSequences]]
    * planner over clean lengths (same Knuth high-bits shard key bounding
    * every window partition, same capacity). Docs scrubbed to zero tokens
    * drop out of the packing stream entirely (inner join): a doc that was
    * ALL boilerplate contributes no empty slot. Scale shape is the union
    * of its stages' — nothing new shuffles; the pack window still sees
    * (source, shard)-bounded partitions.
    */
  val pipelineScrubPack = GQuery(
    "pipeline_scrub_pack",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val kept = keptSpans(spanRows(docs), boilerSpans(s, d))
      val cleanToks = kept
        .select(col("doc_id"),
          size(filter(split(col("span"), " "), w => w =!= ""))
            .cast("long").as("sp_toks"))
        .groupBy("doc_id").agg(sum(col("sp_toks")).as("n_tokens"))
      val toks = docs.select(col("doc_id"), col("source"))
        .join(cleanToks, Seq("doc_id"))
        .withColumn("shard",
          expr("((doc_id % 1000003) * 2654435761) % 4294967296 div 536870912"))
      val w = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      toks
        .withColumn("cum_before",
          coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
          expr(s"cum_before div ${PipelineOps.PackCapacity}").as("pack_id"),
          (col("cum_before") % PipelineOps.PackCapacity).as("pack_offset"))
    },
    oracle = Some(
      s"""WITH $SpanCtes,
         |sp_ct AS (
         |  SELECT doc_id,
         |         CAST(sum(len(list_filter(string_split(span, ' '),
         |                                  w -> w <> ''))) AS BIGINT) AS n_tokens
         |  FROM sb_kept GROUP BY doc_id),
         |sp_tok AS (
         |  SELECT d.doc_id, d.source, c.n_tokens,
         |         ((d.doc_id % 1000003) * 2654435761) % 4294967296
         |           // 536870912 AS shard
         |  FROM documents d JOIN sp_ct c ON c.doc_id = d.doc_id),
         |sp_cum AS (
         |  SELECT doc_id, source, shard, n_tokens,
         |         CAST(coalesce(sum(n_tokens) OVER (
         |           PARTITION BY source, shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |         AS BIGINT) AS cum_before
         |  FROM sp_tok)
         |SELECT doc_id, source, shard, n_tokens,
         |       cum_before // ${PipelineOps.PackCapacity} AS pack_id,
         |       cum_before % ${PipelineOps.PackCapacity} AS pack_offset
         |FROM sp_cum""".stripMargin),
    bench = true)

  /** Chunk geometry: window of [[ChunkSize]] tokens advancing by
    * [[ChunkStride]] — 16 tokens of overlap, the standard context-window /
    * retrieval-chunk prep shape.
    */
  final val ChunkSize = 64
  final val ChunkStride = 48

  /** Overlapping fixed-token-window chunking — split every document into
    * [[ChunkSize]]-token windows with [[ChunkStride]] stride (RAG indexing
    * and context-window pre-tokenization both start here). A trailing
    * start whose tokens are entirely covered by the previous window is
    * suppressed (`start + (size − stride) < n`), so chunks never
    * duplicate a whole tail.
    *
    * Scale shape: fully row-local — tokenize, `sequence()` the starts,
    * explode, slice; no shuffle at all (the plan is scan→generate→project),
    * and output rows are bounded at ~n/stride per doc. The oracle mirrors
    * with unnest(range(...)) — range, not generate_series: range's end
    * bound is EXCLUSIVE like Spark's stepped sequence here, where
    * generate_series would emit an extra start when stride divides n.
    */
  val chunkDocuments = GQuery(
    "chunk_documents",
    (s, d) => {
      val overlap = ChunkSize - ChunkStride
      Tables.documents(s, d)
        .select(col("doc_id"),
          filter(split(col("text"), " "), w => w =!= "").as("t"))
        .withColumn("n", size(col("t")).cast("long"))
        .filter(col("n") > 0)
        .select(col("doc_id"), col("t"), col("n"),
          explode(sequence(lit(0L), col("n") - 1, lit(ChunkStride.toLong)))
            .as("start"))
        .filter(col("start") === 0 || col("start") + overlap < col("n"))
        .select(
          col("doc_id"),
          expr(s"start div $ChunkStride").as("chunk_idx"),
          col("start").as("chunk_start"),
          least(lit(ChunkSize.toLong), col("n") - col("start")).as("chunk_len"),
          array_join(expr(s"slice(t, start + 1, $ChunkSize)"), " ")
            .as("chunk_text"))
    },
    oracle = Some(
      s"""WITH toks_c AS (
        |  SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n
        |  FROM (SELECT doc_id,
        |               list_filter(string_split(text, ' '), w -> w <> '') AS t
        |        FROM documents)
        |  WHERE len(t) > 0),
        |st AS (SELECT doc_id, t, n,
        |              unnest(range(0, n, $ChunkStride)) AS start
        |       FROM toks_c)
        |SELECT doc_id,
        |       start // $ChunkStride AS chunk_idx,
        |       start AS chunk_start,
        |       least($ChunkSize, n - start) AS chunk_len,
        |       array_to_string(list_slice(t, start + 1,
        |                                  least(start + $ChunkSize, n)),
        |                       ' ') AS chunk_text
        |FROM st
        |WHERE start = 0 OR start + ${ChunkSize - ChunkStride} < n""".stripMargin),
    bench = true)

  val queries: Seq[GQuery] =
    Seq(dedupSpanBoilerplate, shuffleShards, pipelineScrubPack, chunkDocuments)
}
