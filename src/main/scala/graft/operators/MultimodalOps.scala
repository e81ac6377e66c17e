package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (builder-prompt extension set): image/audio/video
  * payloads carried as opaque `binary` columns with typed metadata.
  *
  * Architecture: the decode step is an executor-side batch transform over
  * typed rows — the Scala analog of `mapInPandas` (mapPartitions with an
  * explicit micro-batch shape, so a vectorized decoder drops in without
  * changing the plan). The decoder is pluggable:
  *   - [[RealDecoder]] is the production seam — it requires imaging/audio
  *     libraries not present in this container and raises a typed,
  *     actionable error naming the missing codecs and the config key;
  *   - [[FakeDecoder]] is a deterministic stand-in (shapes derived from a
  *     byte checksum) so the plumbing — schema, partitioning, batch shape,
  *     null/mime handling — is fully testable and oracle-checkable.
  *
  * Scale posture: payload bytes never shuffle — metadata extraction happens
  * at the scan, and downstream ops (frame sampling, resize planning) work on
  * the small typed metadata, joining back to payloads only when re-encoding.
  */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, mime: String, n_bytes: Long, checksum: Long,
      width: Long, height: Long, n_frames: Long)

  /** Decoder seam — one call per payload; implementations may batch. */
  trait MediaDecoder extends Serializable {
    /** @return (width, height, n_frames) */
    def decode(mime: String, payload: Array[Byte]): (Long, Long, Long)
  }

  /** Config key selecting the decoder implementation for [[decoderFor]]:
    * `fake` (default, deterministic) or `real` (requires codecs on the
    * executor classpath).
    */
  val DecoderConfKey = "spark.graft.multimodal.decoder"

  /** Production decoder seam: requires javax.imageio / ffmpeg bindings not
    * present in this container. Calling it without the codecs wired produces
    * a typed, actionable error (not a bare NotImplementedError).
    */
  object RealDecoder extends MediaDecoder {
    def decode(mime: String, payload: Array[Byte]): (Long, Long, Long) =
      throw new UnsupportedOperationException(
        s"RealDecoder: no media codecs on the classpath (need javax.imageio " +
          s"for image/*, an ffmpeg binding for audio/video; got mime=$mime). " +
          s"Wire an implementation here, or set $DecoderConfKey=fake to use " +
          "the deterministic test decoder.")
  }

  /** Resolve the decoder from session conf (`fake` default). */
  def decoderFor(s: SparkSession): MediaDecoder =
    s.conf.get(DecoderConfKey, "fake") match {
      case "real" => RealDecoder
      case _      => FakeDecoder
    }

  /** Deterministic fake: dimensions derived from a byte checksum, so tests
    * and the DuckDB oracle reproduce them exactly.
    */
  object FakeDecoder extends MediaDecoder {
    def checksum(payload: Array[Byte]): Long = {
      var acc = 0L
      var i = 0
      while (i < payload.length) { acc = (acc + (payload(i) & 0xff)) % 2147483647L; i += 1 }
      acc
    }
    def decode(mime: String, payload: Array[Byte]): (Long, Long, Long) = {
      val c = checksum(payload)
      val w = 64 + c % 512
      val h = 64 + (c / 512) % 512
      val frames = if (mime == "video/mp4") 1 + c % 240 else 1L
      (w, h, frames)
    }
  }

  /** The media table: document text bytes standing in for media payloads
    * (binary column), mime assigned round-robin — the schema a real ingest
    * would produce.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    // single-row-group file → spread decode work across the cluster
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(
        col("doc_id"),
        element_at(
          array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Metadata extraction: mapPartitions in fixed-size micro-batches (the
    * Arrow-batch shape a vectorized decoder needs). Decoder errors for a
    * batch would fail only that task, preserving Spark's retry semantics.
    */
  def extractMeta(ds: Dataset[MediaRow], decoder: MediaDecoder,
                  batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (w, h, f) = decoder.decode(r.mime, r.payload)
          MediaMeta(r.doc_id, r.mime, r.payload.length.toLong,
            FakeDecoder.checksum(r.payload), w, h, f)
        }
      }
    }
  }

  // n_bytes and checksum describe the PAYLOAD (the text's UTF-8 bytes,
  // mediaTable's encode(text, 'UTF-8')), so the oracle must count and sum
  // BYTES — octet_length and the DuckUtf8 byte expansion — not code
  // points, or both columns diverge on the first non-ASCII character
  private val MetaCte =
    s"""WITH meta AS (
      |  SELECT doc_id,
      |         (['image/png','audio/wav','video/mp4'])[(doc_id % 3 + 1)::INT] AS mime,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |         CAST(list_sum(${DuckUtf8.byteList("text")})
      |           % 2147483647 AS BIGINT) AS checksum
      |  FROM documents),
      |m2 AS (
      |  SELECT doc_id, mime, n_bytes, checksum,
      |         CAST(64 + checksum % 512 AS BIGINT) AS width,
      |         CAST(64 + (checksum // 512) % 512 AS BIGINT) AS height,
      |         CAST(CASE WHEN mime = 'video/mp4' THEN 1 + checksum % 240 ELSE 1 END AS BIGINT) AS n_frames
      |  FROM meta)""".stripMargin

  /** Q:multimodal_meta_extract — the full decode-plumbing pipeline with the
    * deterministic fake decoder (text is ASCII, so byte checksum ==
    * character-code checksum, making the oracle exact).
    */
  val multimodalMetaExtract = GQuery(
    "multimodal_meta_extract",
    (s, d) => extractMeta(mediaTable(s, d), decoderFor(s)).toDF(),
    oracle = Some(
      s"""$MetaCte
         |SELECT doc_id, mime, n_bytes, checksum, width, height, n_frames
         |FROM m2""".stripMargin))

  /** Q:multimodal_frame_sample — frame sampling plan for video payloads:
    * every 30th frame index per video (the downstream "extract keyframes"
    * work-list). Metadata-only: no payload bytes move.
    */
  val multimodalFrameSample = GQuery(
    "multimodal_frame_sample",
    (s, d) => {
      val meta = extractMeta(mediaTable(s, d), decoderFor(s)).toDF()
      meta
        .filter(col("mime") === "video/mp4")
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1, lit(30L))).as("frame_idx"))
    },
    oracle = Some(
      s"""$MetaCte
         |SELECT doc_id, n_frames,
         |       unnest(range(0::BIGINT, n_frames::BIGINT, 30::BIGINT)) AS frame_idx
         |FROM m2 WHERE mime = 'video/mp4'""".stripMargin))

  /** Q:multimodal_resize_plan — resize planning: target bounding box 256×256
    * preserving aspect ratio (integer arithmetic, floor semantics in both
    * engines). The actual pixel work is the decoder seam's job.
    */
  val multimodalResizePlan = GQuery(
    "multimodal_resize_plan",
    (s, d) =>
      extractMeta(mediaTable(s, d), decoderFor(s)).toDF()
        .filter(col("mime") === "image/png")
        .select(col("doc_id"), col("width"), col("height"),
          when(col("width") >= col("height"), lit(256L))
            .otherwise(expr("width * 256 div height")).as("target_w"),
          when(col("width") >= col("height"), expr("height * 256 div width"))
            .otherwise(lit(256L)).as("target_h")),
    oracle = Some(
      s"""$MetaCte
         |SELECT doc_id, width, height,
         |       CASE WHEN width >= height THEN 256
         |            ELSE width * 256 // height END AS target_w,
         |       CASE WHEN width >= height THEN height * 256 // width
         |            ELSE 256 END AS target_h
         |FROM m2 WHERE mime = 'image/png'""".stripMargin))

  /** Q:multimodal_audio_windows — fixed-window feature-extraction plan for
    * audio payloads: 16-bit mono at 16 kHz ⇒ n_samples = n_bytes div 2,
    * one window per second (ceil). Metadata-only like the frame sampler —
    * the work-list is planned from typed metadata, payload bytes move only
    * inside the decoder seam. Pure integer arithmetic, oracle-exact.
    */
  val multimodalAudioWindows = GQuery(
    "multimodal_audio_windows",
    (s, d) => {
      val meta = extractMeta(mediaTable(s, d), decoderFor(s)).toDF()
      meta
        .filter(col("mime") === "audio/wav")
        .withColumn("n_samples", expr("n_bytes div 2"))
        .withColumn("n_windows", expr("(n_samples + 15999) div 16000"))
        .filter(col("n_windows") > 0)
        .select(col("doc_id"), col("n_samples"), col("n_windows"),
          explode(sequence(lit(0L), col("n_windows") - 1)).as("window_idx"))
        .withColumn("start_sample", col("window_idx") * 16000L)
    },
    oracle = Some(
      s"""$MetaCte,
         |aw AS (
         |  SELECT doc_id, n_bytes // 2 AS n_samples,
         |         (n_bytes // 2 + 15999) // 16000 AS n_windows
         |  FROM m2 WHERE mime = 'audio/wav')
         |SELECT doc_id, n_samples, n_windows,
         |       unnest(range(0::BIGINT, n_windows::BIGINT)) AS window_idx,
         |       unnest(range(0::BIGINT, n_windows::BIGINT)) * 16000 AS start_sample
         |FROM aw WHERE n_windows > 0""".stripMargin))

  val queries: Seq[GQuery] = Seq(
    multimodalMetaExtract, multimodalFrameSample, multimodalResizePlan,
    multimodalAudioWindows)
}
