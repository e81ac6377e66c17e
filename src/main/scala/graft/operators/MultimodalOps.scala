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
  *   - [[RealDecoder]] decodes real bytes with what every JDK ships:
  *     header-only ImageIO reads for PNG/JPEG/GIF/BMP (no pixel decode —
  *     width/height come off the image header), RIFF chunk walks for WAV
  *     audio and AVI video, and an ISO-BMFF box walk for MP4 metadata.
  *     REAL pixels come out of the two containers that need no codec:
  *     animated GIF and MJPEG-in-AVI (each movi chunk is a baseline
  *     JPEG). H.264/MP4 frame decode stays a typed, actionable error
  *     (the message names the ffmpeg binding to wire);
  *   - [[FakeDecoder]] is a deterministic stand-in (shapes derived from a
  *     byte checksum) so the registry queries stay oracle-checkable over
  *     the testbed's text-bytes payloads, which are not real media.
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

  /** Full typed MP4 header record ([[RealDecoder.mp4Meta]]): everything the
    * ISO-BMFF box structure yields without a codec. `width`/`height`/`codec`/
    * `n_frames` describe the first `vide` track; `duration_ms` is the movie
    * duration from mvhd (timescale-normalized). */
  final case class Mp4Meta(
      duration_ms: Long, timescale: Long, n_tracks: Long,
      width: Long, height: Long, codec: String, n_frames: Long)

  /** Decoder seam — one call per payload; implementations may batch.
    * The (width, height, n_frames) triple is mime-family-typed:
    * images → (pixel width, pixel height, 1); audio → (sample rate,
    * channel count, sample frames); video → (pixel width, pixel
    * height, frame count).
    */
  trait MediaDecoder extends Serializable {
    /** @return (width, height, n_frames) */
    def decode(mime: String, payload: Array[Byte]): (Long, Long, Long)
  }

  /** Config key selecting the decoder implementation for [[decoderFor]]:
    * `fake` (default, deterministic) or `real` (requires codecs on the
    * executor classpath).
    */
  val DecoderConfKey = "spark.graft.multimodal.decoder"

  /** Production decoder over real bytes, JDK-only — no extra codecs:
    *
    *  - image: a HEADER-ONLY ImageIO read. `getImageReaders` sniffs
    *    the magic bytes (so a payload whose bytes aren't a known format
    *    fails typed, whatever its declared mime), and `getWidth(0)` /
    *    `getHeight(0)` come off the header without decoding pixels —
    *    the right cost profile for a metadata pass over 100 TB of
    *    payloads. PNG/JPEG/GIF/BMP/WBMP readers ship in every JDK.
    *  - `audio/wav`: a RIFF chunk walk (pure little-endian arithmetic):
    *    `fmt ` gives sample rate + channels + block align, `data` gives
    *    payload bytes, frames = data bytes / block align. Chunks are
    *    word-aligned per the RIFF spec (odd sizes carry a pad byte).
    *  - `video/mp4` (and quicktime/m4v): an ISO-BMFF box walk — the
    *    big-endian sibling of the RIFF walk. `moov/mvhd` gives timescale
    *    and duration, `trak/tkhd` gives the 16.16 fixed-point display
    *    dimensions, `trak/mdia/hdlr` identifies the `vide` track,
    *    `stbl/stsd` carries the codec fourcc and `stbl/stsz` the sample
    *    (frame) count. Header boxes only — never the mdat payload, so
    *    the cost profile matches the image path. Frame PIXEL decode
    *    genuinely needs a codec (an ffmpeg binding) for true codecs
    *    (avc1/hev1/...); 'jpeg'-fourcc MJPEG samples decode natively
    *    through [[mp4FrameImagesEvery]]'s stbl walk, and [[mp4Meta]]
    *    exposes the full typed record either way.
    *
    * Failure semantics: one bad payload throws a typed error that fails
    * only its task (extractMeta wraps it with the doc_id), preserving
    * Spark's retry/skip story rather than poisoning the whole stage
    * with a bare NPE.
    */
  object RealDecoder extends MediaDecoder {
    def decode(mime: String, payload: Array[Byte]): (Long, Long, Long) = {
      val m = if (mime == null) "" else mime
      if (m.startsWith("image/")) decodeImageHeader(m, payload)
      else if (m == "audio/wav" || m == "audio/x-wav" || m == "audio/wave")
        decodeWavHeader(payload)
      else if (m == "video/mp4" || m == "video/quicktime" || m == "video/x-m4v") {
        val meta = mp4Meta(payload)
        (meta.width, meta.height, meta.n_frames)
      } else if (m == "video/x-msvideo" || m == "video/avi") {
        val meta = aviMeta(payload)
        (meta.width, meta.height, meta.n_frames)
      } else
        throw new UnsupportedOperationException(
          s"RealDecoder: mime '$m' needs a codec the JDK does not ship " +
            "(non-MP4 video wants an ffmpeg binding; non-WAV audio wants " +
            s"a demuxer). Wire one here, or set $DecoderConfKey=fake for " +
            "the deterministic test decoder.")
    }

    private def decodeImageHeader(mime: String, payload: Array[Byte]): (Long, Long, Long) = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException(
            s"RealDecoder: undecodable image payload (mime=$mime, " +
              s"${payload.length} bytes) — no installed ImageReader " +
              "recognizes its header")
        val reader = readers.next()
        try {
          if (reader.getFormatName.equalsIgnoreCase("gif")) {
            // GIF is a multi-FRAME container: n_frames is the real frame
            // count (getNumImages needs a searchable input, so no
            // seekForwardOnly here — still header walks, no pixel decode)
            reader.setInput(iis, false, true)
            (reader.getWidth(0).toLong, reader.getHeight(0).toLong,
              reader.getNumImages(true).toLong)
          } else {
            // seekForwardOnly + ignoreMetadata: header fields only
            reader.setInput(iis, true, true)
            (reader.getWidth(0).toLong, reader.getHeight(0).toLong, 1L)
          }
        } finally reader.dispose()
      } finally iis.close()
    }

    /** One decoded GIF frame: raster dims as stored (GIF frames may be
      * partial-canvas patches), the GraphicControlExtension delay in
      * centiseconds, and a CRC-32 over the ARGB pixels — the bounded
      * stand-in for shipping raster bytes through a test plan. */
    final case class GifFrame(index: Long, delay_cs: Long,
        width: Long, height: Long, pixel_crc: Long)

    /** Real PIXEL decode for the sampled frames of an animated GIF — the
      * one multi-frame container the JDK decodes natively, which makes it
      * the real-pixel leg of the frame-sampling pipeline (true video
      * codecs keep the typed ffmpeg-seam error in [[decode]]).
      *
      * @param indices frame indices to decode (empty = all frames);
      *                indices beyond the container's count are ignored,
      *                matching a sample plan built from a stale count
      */
    def gifFrames(payload: Array[Byte],
                  indices: Seq[Int] = Nil): Seq[GifFrame] =
      gifFrameImages(payload, indices).map { case (i, delay, img) =>
        GifFrame(i.toLong, delay, img.getWidth.toLong,
          img.getHeight.toLong, argbCrc(img))
      }

    /** The pixel-bearing variant of [[gifFrames]]: (index, delay_cs,
      * decoded raster) per sampled frame — the seam the resize executor
      * feeds from, so frame selection/decode logic has ONE home. */
    def gifFrameImages(payload: Array[Byte], indices: Seq[Int] = Nil)
        : Seq[(Int, Long, java.awt.image.BufferedImage)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException(
            s"RealDecoder: undecodable payload (${payload.length} bytes) " +
              "— no installed ImageReader recognizes its header")
        val reader = readers.next()
        try {
          if (!reader.getFormatName.equalsIgnoreCase("gif"))
            throw new IllegalArgumentException(
              s"RealDecoder: frame extraction needs a multi-frame " +
                s"container; '${reader.getFormatName}' is single-frame " +
                "(video codecs need the ffmpeg seam)")
          reader.setInput(iis, false, false) // metadata needed: delays
          val n = reader.getNumImages(true)
          val want =
            if (indices.isEmpty) 0 until n else indices.filter(_ < n)
          want.map { i =>
            (i, gifDelayCs(reader.getImageMetadata(i)), reader.read(i))
          }
        } finally reader.dispose()
      } finally iis.close()
    }

    /** CRC-32 over row-major big-endian ARGB pixels — the bounded
      * stand-in for shipping raster bytes through a test plan; shared by
      * the frame extractor and the resize executor so both pin the SAME
      * pixel identity. */
    def argbCrc(img: java.awt.image.BufferedImage): Long = {
      val crc = new java.util.zip.CRC32
      val buf = java.nio.ByteBuffer.allocate(4)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          buf.clear(); buf.putInt(img.getRGB(x, y))
          crc.update(buf.array())
          x += 1
        }
        y += 1
      }
      crc.getValue
    }

    /** Nearest-neighbor resize to (tw, th), hand-rolled integer source
      * mapping (sx = x·srcW div tw). Deliberately NOT Graphics2D
      * drawImage: Java2D routes scaling through platform render
      * pipelines whose interpolating filters may differ in low bits
      * across JDK builds, and this raster feeds a PINNED CRC — integer
      * NN is bit-reproducible everywhere by construction. The output is
      * TYPE_INT_ARGB regardless of the source color model, so the CRC
      * never depends on the GIF's palette layout. */
    def resizeArgb(img: java.awt.image.BufferedImage, tw: Int,
                   th: Int): java.awt.image.BufferedImage = {
      require(tw > 0 && th > 0, s"resize target must be positive: ${tw}x$th")
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      val sw = img.getWidth; val sh = img.getHeight
      var y = 0
      while (y < th) {
        val sy = y * sh / th
        var x = 0
        while (x < tw) {
          out.setRGB(x, y, img.getRGB(x * sw / tw, sy))
          x += 1
        }
        y += 1
      }
      out
    }

    /** GraphicControlExtension delayTime (centiseconds) from a GIF
      * frame's native metadata tree; 0 when the frame has no GCE. */
    private def gifDelayCs(meta: javax.imageio.metadata.IIOMetadata): Long = {
      val root = meta.getAsTree("javax_imageio_gif_image_1.0")
      var node = root.getFirstChild
      while (node != null) {
        if (node.getNodeName == "GraphicControlExtension")
          return node.getAttributes.getNamedItem("delayTime")
            .getNodeValue.toLong
        node = node.getNextSibling
      }
      0L
    }

    /** Little-endian unsigned int at `off` (RIFF sizes are uint32). */
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    private def decodeWavHeader(b: Array[Byte]): (Long, Long, Long) = {
      def bad(why: String) = throw new IllegalArgumentException(
        s"RealDecoder: undecodable WAV payload (${b.length} bytes) — $why")
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
        bad("missing RIFF/WAVE magic")
      var off = 12
      var sampleRate = -1L; var channels = -1L; var blockAlign = -1L
      var dataBytes = -1L
      while (off + 8 <= b.length && (sampleRate < 0 || dataBytes < 0)) {
        val id = tag(b, off)
        val size = u32(b, off + 4) // uint32: NEVER narrow to Int — a
        // hostile size like 0xFFFFFFF8 would make the advance zero or
        // negative and hang the walk
        if (id == "fmt ") {
          if (off + 8 + 16 > b.length) bad("truncated fmt chunk")
          channels = u16(b, off + 10).toLong
          sampleRate = u32(b, off + 12)
          blockAlign = u16(b, off + 20).toLong
        } else if (id == "data") {
          // size may overrun a truncated buffer; frames come from the
          // bytes actually present, like any streaming-tolerant reader
          dataBytes = math.min(size, (b.length - off - 8).toLong)
        }
        // a non-terminal chunk whose declared size exceeds the remaining
        // buffer cannot be walked past: either we already have what we
        // need (loop condition ends us) or the payload is corrupt
        val advance = 8L + size + (size & 1L) // word-aligned; always ≥ 8
        if (off.toLong + advance > b.length.toLong &&
            (sampleRate < 0 || dataBytes < 0))
          bad(s"chunk '$id' size $size overruns ${b.length}-byte buffer")
        off = math.min(off.toLong + advance, b.length.toLong).toInt
      }
      if (sampleRate < 0) bad("no fmt chunk")
      if (dataBytes < 0) bad("no data chunk")
      if (blockAlign <= 0) bad(s"non-positive block align $blockAlign")
      (sampleRate, channels, dataBytes / blockAlign)
    }

    // ---- AVI (RIFF) walk + MJPEG frame decode ------------------------
    //
    // AVI is the RIFF sibling of the WAV walk above, and MJPEG-in-AVI is
    // the one TRUE VIDEO container the JDK can take all the way to real
    // pixels: every movi video chunk of an MJPEG stream is a standalone
    // baseline JPEG, which ImageIO decodes natively. H.264/MP4 frame
    // decode keeps the typed ffmpeg-seam error — this path closes the
    // "no real video pixels" gap for the codec that needs no codec.

    private def badAvi(why: String): Nothing =
      throw new IllegalArgumentException(
        s"RealDecoder: undecodable AVI payload — $why")

    /** (fourcc, payloadStart, payloadEnd) per RIFF chunk in [start, end).
      * Chunks are word-aligned (odd sizes carry a pad byte); sizes are
      * uint32, so all span arithmetic is Long until validated. A declared
      * size overrunning the span is a typed error, never a silent clamp. */
    private def riffChunks(b: Array[Byte], start: Int, end: Int)
        : Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var off = start.toLong
      while (off < end) {
        if (off + 8 > end) badAvi(s"truncated chunk header at offset $off")
        val id = tag(b, off.toInt)
        val size = u32(b, off.toInt + 4)
        val pEnd = off + 8L + size
        if (pEnd > end) badAvi(s"chunk '$id' size $size overruns [$start,$end)")
        out += ((id, off.toInt + 8, pEnd.toInt))
        off = pEnd + (size & 1L)
      }
      out.result()
    }

    /** A LIST chunk's list type is its first 4 payload bytes. */
    private def riffListType(b: Array[Byte], s: Int, e: Int): String =
      if (e - s < 4) badAvi(s"truncated LIST type at $s") else tag(b, s)

    /** Typed AVI header record: avih dims/frame count/frame period, plus
      * the first `vids` stream's fourcc and ORDINAL — the ordinal names
      * the movi chunks ("NNdc"), so frame extraction needs it. */
    final case class AviMeta(width: Long, height: Long, n_frames: Long,
        frame_delay_cs: Long, codec: String, video_stream: Int)

    /** AVI metadata by RIFF walk — header chunks only, no frame bytes
      * touched: `hdrl/avih` gives dwWidth/dwHeight/dwTotalFrames and the
      * frame period, each `hdrl/strl/strh` declares its stream type and
      * codec fourcc. The cost profile matches the WAV/MP4 walks. */
    def aviMeta(b: Array[Byte]): AviMeta = {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ")
        badAvi("missing RIFF/'AVI ' magic")
      val top = riffChunks(b, 12, b.length)
      val (hdrlS, hdrlE) = top.collectFirst {
        case ("LIST", s, e) if riffListType(b, s, e) == "hdrl" => (s + 4, e)
      }.getOrElse(badAvi("no hdrl LIST"))
      val hdrlKids = riffChunks(b, hdrlS, hdrlE)
      val (avihS, avihE) = hdrlKids
        .collectFirst { case ("avih", s, e) => (s, e) }
        .getOrElse(badAvi("no avih header"))
      if (avihE - avihS < 40) badAvi(s"avih body ${avihE - avihS} < 40 bytes")
      // avih: dwMicroSecPerFrame(0) ... dwTotalFrames(16) ... dwWidth(32),
      // dwHeight(36)
      val usPerFrame = u32(b, avihS)
      val nFrames = u32(b, avihS + 16)
      val width = u32(b, avihS + 32)
      val height = u32(b, avihS + 36)
      // stream ordinal among ALL strl lists (audio included) names the
      // movi chunk prefix for the video stream
      val strls = hdrlKids.collect {
        case ("LIST", s, e) if riffListType(b, s, e) == "strl" => (s + 4, e)
      }
      val (streamIdx, codec) = strls.zipWithIndex.flatMap { case ((s, e), i) =>
        riffChunks(b, s, e).collectFirst {
          case ("strh", hs, he) if he - hs >= 8 && tag(b, hs) == "vids" =>
            (i, tag(b, hs + 4))
        }
      }.headOption.getOrElse(badAvi("no 'vids' stream among the strl lists"))
      AviMeta(width, height, nFrames, usPerFrame / 10000L, codec, streamIdx)
    }

    /** The sampled frames of an MJPEG AVI decoded to REAL pixels with the
      * JDK's own JPEG reader. Walks `movi` (one level of 'rec ' grouping
      * per the spec), takes the video stream's `NNdc`/`NNdb` chunks in
      * stream order, and ImageIO-decodes only the requested indices —
      * non-JPEG codec chunks fail typed, naming the stream fourcc (the
      * ffmpeg seam), exactly like MP4 frame extraction.
      *
      * @param indices frame indices to decode (empty = all); indices
      *                beyond the container's chunk count — or negative
      *                ones, from a sample plan that wrapped Int — are
      *                ignored, matching a plan built from a stale count
      */
    def aviFrameImages(b: Array[Byte], indices: Seq[Int] = Nil)
        : Seq[(Int, java.awt.image.BufferedImage)] =
      aviDecodeAt(b, frames =>
        if (indices.isEmpty) frames.indices.toSeq
        else indices.filter(i => i >= 0 && i < frames.size))

    /** Every `every`-th frame of an MJPEG AVI, sampled against the ACTUAL
      * movi chunk count — never the header's dwTotalFrames. The header
      * count is an untrusted uint32: a hostile avih claiming 2^32-1
      * frames would make a caller-built `(0L until n by every)` index
      * list materialize billions of elements (executor OOM) and wrap
      * past Int.MaxValue into negatives (ADVICE r18, the medium). The
      * chunk list is bounded by the payload itself (≥ 8 bytes per
      * chunk), so a sampling plan built HERE is inherently clamped. */
    def aviFrameImagesEvery(b: Array[Byte], every: Int)
        : Seq[(Int, java.awt.image.BufferedImage)] = {
      require(every > 0, s"sampling step must be positive, got $every")
      aviDecodeAt(b, frames => frames.indices by every)
    }

    /** Shared movi walk + decode: `pick` sees the real chunk list and
      * returns the indices to decode (already in-bounds by contract of
      * the two public faces above). */
    private def aviDecodeAt(b: Array[Byte],
        pick: Seq[(String, Int, Int)] => Seq[Int])
        : Seq[(Int, java.awt.image.BufferedImage)] = {
      val meta = aviMeta(b)
      val top = riffChunks(b, 12, b.length)
      val (moviS, moviE) = top.collectFirst {
        case ("LIST", s, e) if riffListType(b, s, e) == "movi" => (s + 4, e)
      }.getOrElse(badAvi("no movi LIST"))
      val pfx = f"${meta.video_stream}%02d"
      def videoChunks(s: Int, e: Int): Seq[(String, Int, Int)] =
        riffChunks(b, s, e).flatMap {
          case ("LIST", ls, le) if riffListType(b, ls, le) == "rec " =>
            videoChunks(ls + 4, le)
          case c @ (id, _, _)
              if id.startsWith(pfx) &&
                (id.endsWith("dc") || id.endsWith("db")) => Seq(c)
          case _ => Nil
        }
      val frames = videoChunks(moviS, moviE)
      pick(frames).map { i =>
        val (id, s, e) = frames(i)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOfRange(b, s, e)))
        if (img == null) badAvi(
          s"frame $i (chunk '$id') is not a JDK-decodable image — stream " +
            s"codec '${meta.codec}' needs the ffmpeg seam (MJPEG decodes " +
            "natively)")
        (i, img)
      }
    }

    // ---- ISO-BMFF (MP4) box walk ------------------------------------

    private def badMp4(why: String): Nothing =
      throw new IllegalArgumentException(
        s"RealDecoder: undecodable MP4 payload — $why")

    /** Big-endian unsigned int (box sizes/fields are uint32). */
    private def be32(b: Array[Byte], off: Long): Long = {
      val i = off.toInt
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    }

    private def be64(b: Array[Byte], off: Long): Long =
      (be32(b, off) << 32) | be32(b, off + 4)

    private def tag4(b: Array[Byte], off: Long): String =
      new String(b, off.toInt, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Children of the container spanning [start, end): (type,
      * payloadStart, payloadEnd) per box. Size handling per the spec:
      * size==1 ⇒ a 64-bit largesize follows the type (16-byte header);
      * size==0 ⇒ the box extends to the container's end; any other
      * size smaller than its own header is corrupt. A declared size that
      * overruns the container (a truncated moov, a hostile largesize) is
      * a typed error, never a silent clamp — downstream offsets would be
      * garbage. Headers only: payload bytes are walked, not copied.
      */
    private def childBoxes(b: Array[Byte], start: Long, end: Long)
        : Seq[(String, Long, Long)] = {
      val out = Seq.newBuilder[(String, Long, Long)]
      var off = start
      while (off < end) {
        if (off + 8 > end) badMp4(
          s"truncated box header at offset $off (container ends at $end)")
        val size32 = be32(b, off)
        val typ = tag4(b, off + 4)
        val (hdr, boxEnd) =
          if (size32 == 1L) {
            if (off + 16 > end) badMp4(s"truncated largesize header in '$typ'")
            val size64 = be64(b, off + 8)
            if (size64 < 16) badMp4(s"largesize $size64 in '$typ' below header size")
            (16L, off + size64) // size64 ≥ 16 and off ≥ 0, so no overflow
            // before the overrun check below for any real buffer (≤ 2 GiB)
          } else if (size32 == 0L) (8L, end) // box runs to container end
          else if (size32 < 8L) badMp4(s"box '$typ' size $size32 below header size")
          else (8L, off + size32)
        if (boxEnd > end || boxEnd < off + hdr) badMp4(
          s"box '$typ' (size ${if (size32 == 1L) be64(b, off + 8) else size32}) " +
            s"overruns container [$start,$end)")
        out += ((typ, off + hdr, boxEnd))
        off = boxEnd
      }
      out.result()
    }

    /** First child of `typ` under a parent span, or a typed error. */
    private def box1(b: Array[Byte], kids: Seq[(String, Long, Long)],
                     typ: String, where: String): (Long, Long) =
      kids.collectFirst { case (`typ`, s, e) => (s, e) }
        .getOrElse(badMp4(s"no $typ box in $where"))

    /** Bounds guard with a typed message (truncation inside a box body). */
    private def need(ok: Boolean, what: String): Unit =
      if (!ok) badMp4(s"truncated $what")

    /** ISO-BMFF metadata: movie duration/timescale from mvhd, track count,
      * and the first `vide` track's display dimensions (tkhd, 16.16
      * fixed-point), codec fourcc (stsd's first sample entry) and sample
      * count (stsz full-box; `n_frames` for a video track). No codec, no
      * pixel work, no mdat read — pure header arithmetic, exactly like the
      * WAV RIFF walk. Public: the full record (duration, track count,
      * codec) is the useful metadata surface; `decode` keeps only the
      * trait's (width, height, frames) triple. */
    /** The shared spine of every vide-track walk: top → moov → the first
      * trak whose mdia/hdlr handler is 'vide'. Returns (moovKids, trak
      * count, videKids, mdia span) — [[mp4Meta]] reads mvhd/tkhd off it,
      * the sample-table walk reads mdhd/stbl. A trak missing its
      * mdia/hdlr is simply "not the video track", not a walk-killer. */
    private def videSpine(b: Array[Byte])
        : (Seq[(String, Long, Long)], Int, Seq[(String, Long, Long)], (Long, Long)) = {
      if (b.length < 8) badMp4(s"${b.length} bytes is too short for a box header")
      val top = childBoxes(b, 0L, b.length.toLong)
      if (!top.exists(t => t._1 == "ftyp" || t._1 == "moov"))
        badMp4("no ftyp/moov box — not an ISO-BMFF stream")
      val (moovS, moovE) = box1(b, top, "moov", "stream")
      val moovKids = childBoxes(b, moovS, moovE)
      val traks = moovKids.filter(_._1 == "trak")
      if (traks.isEmpty) badMp4("moov has no trak boxes")
      val vide = traks.iterator.map { case (_, ts, te) =>
        val kids = childBoxes(b, ts, te)
        val mdia = kids.collectFirst { case ("mdia", s, e) => (s, e) }
        val handler = mdia.flatMap { case (ms, me) =>
          childBoxes(b, ms, me).collectFirst {
            // version/flags(4) + pre_defined(4), then the handler fourcc
            case ("hdlr", s, e) if e - s >= 12 => tag4(b, s + 8)
          }
        }
        (kids, mdia, handler)
      }.collectFirst { case (kids, Some(mdia), Some("vide")) => (kids, mdia) }
        .getOrElse(badMp4(s"none of the ${traks.size} trak boxes has a " +
          "'vide' handler"))
      (moovKids, traks.size, vide._1, vide._2)
    }

    def mp4Meta(b: Array[Byte]): Mp4Meta = {
      val (moovKids, nTraks, videKids, (mdiaS, mdiaE)) = videSpine(b)

      val (mvhdS, mvhdE) = box1(b, moovKids, "mvhd", "moov")
      val mvhdVer = { need(mvhdE - mvhdS >= 4, "mvhd"); b(mvhdS.toInt) & 0xff }
      val (timescale, duration) = mvhdVer match {
        case 0 => need(mvhdE - mvhdS >= 20, "mvhd v0 body")
          (be32(b, mvhdS + 12), be32(b, mvhdS + 16))
        case 1 => need(mvhdE - mvhdS >= 32, "mvhd v1 body")
          (be32(b, mvhdS + 20), be64(b, mvhdS + 24))
        case v => badMp4(s"mvhd version $v")
      }
      if (timescale <= 0) badMp4(s"non-positive mvhd timescale $timescale")
      if (duration < 0) badMp4(s"mvhd duration overflows signed 64-bit")

      val (tkhdS, tkhdE) = box1(b, videKids, "tkhd", "vide trak")
      val tkhdVer = { need(tkhdE - tkhdS >= 4, "tkhd"); b(tkhdS.toInt) & 0xff }
      // layout: ver/flags 4, times (v0: 4+4, v1: 8+8), track_id 4,
      // reserved 4, duration (v0: 4, v1: 8), reserved 8, layer 2, alt 2,
      // volume 2, reserved 2, matrix 36 — then width, height (16.16)
      val dimOff = tkhdVer match {
        case 0 => need(tkhdE - tkhdS >= 84, "tkhd v0 body"); tkhdS + 76
        case 1 => need(tkhdE - tkhdS >= 96, "tkhd v1 body"); tkhdS + 88
        case v => badMp4(s"tkhd version $v")
      }
      val width = be32(b, dimOff) >> 16 // integer part of 16.16 fixed
      val height = be32(b, dimOff + 4) >> 16

      val mdiaKids = childBoxes(b, mdiaS, mdiaE)
      val (minfS, minfE) = box1(b, mdiaKids, "minf", "vide mdia")
      val (stblS, stblE) = box1(b, childBoxes(b, minfS, minfE), "stbl", "minf")
      val stblKids = childBoxes(b, stblS, stblE)

      val (stsdS, stsdE) = box1(b, stblKids, "stsd", "stbl")
      need(stsdE - stsdS >= 8, "stsd header")
      val nEntries = be32(b, stsdS + 4)
      if (nEntries < 1) badMp4("stsd has zero sample entries")
      // first sample entry: size(4) + format fourcc(4)
      need(stsdE - stsdS >= 16, "stsd first sample entry")
      val codec = tag4(b, stsdS + 12)

      val (stszS, stszE) = box1(b, stblKids, "stsz", "stbl")
      need(stszE - stszS >= 12, "stsz body")
      val nFrames = be32(b, stszS + 8) // sample_count (after ver/flags +
      // sample_size; count is present whether sizes are uniform or not)

      // duration*1000 can overflow only on hostile 64-bit durations; route
      // through the overflow-checked path so it fails typed, not wraps
      val durMs =
        try math.multiplyExact(duration, 1000L) / timescale
        catch { case _: ArithmeticException =>
          badMp4(s"mvhd duration $duration overflows millisecond arithmetic") }
      Mp4Meta(durMs, timescale, nTraks.toLong, width, height, codec, nFrames)
    }

    // ---- MJPEG-in-MP4 real pixels -----------------------------------

    /** Every `every`-th sample of an MJPEG MP4 ('jpeg' fourcc in stsd)
      * decoded to REAL pixels with the JDK's JPEG reader — the ISO-BMFF
      * sibling of [[aviFrameImagesEvery]], completing the pure-JDK video
      * matrix (VERDICT r18 item 4). Sample bytes are located through the
      * stbl tables exactly as a demuxer would: stsc maps chunks to
      * samples-per-chunk, stco/co64 gives chunk file offsets, stsz gives
      * per-sample byte sizes; a sample's offset is its chunk's offset
      * plus the sizes of the samples before it in that chunk. The plan
      * is sized by the ADDRESSABLE samples — what the tables, each
      * validated against its own box length, can actually locate inside
      * the payload — never by a header count alone (the same
      * untrusted-uint32 discipline as the AVI path). True codecs
      * ('avc1', 'hev1'...) fail typed, naming the fourcc and the ffmpeg
      * seam. Returns (sample index, image, delay_cs) with the delay from
      * the first stts run against the mdhd media timescale. */
    def mp4FrameImagesEvery(b: Array[Byte], every: Int)
        : Seq[(Int, java.awt.image.BufferedImage, Long)] = {
      require(every > 0, s"sampling step must be positive, got $every")
      val (_, _, _, (mdiaS, mdiaE)) = videSpine(b)
      val mdiaKids = childBoxes(b, mdiaS, mdiaE)
      val (minfS, minfE) = box1(b, mdiaKids, "minf", "vide mdia")
      val (stblS, stblE) = box1(b, childBoxes(b, minfS, minfE), "stbl", "minf")
      val stblKids = childBoxes(b, stblS, stblE)

      val (stsdS, stsdE) = box1(b, stblKids, "stsd", "stbl")
      need(stsdE - stsdS >= 16, "stsd first sample entry")
      val codec = tag4(b, stsdS + 12)
      if (codec != "jpeg")
        throw new IllegalArgumentException(
          s"RealDecoder: MP4 frame pixels for codec '$codec' need the " +
            "ffmpeg seam — 'jpeg' (MJPEG-in-MP4) is the JDK-decodable " +
            "sample format")

      // media timescale (mdhd) + first stts run ⇒ per-frame delay in cs
      val delayCs = {
        val ts = mdiaKids.collectFirst { case ("mdhd", s, e) if e - s >= 4 =>
          (b(s.toInt) & 0xff) match {
            case 0 => need(e - s >= 16, "mdhd v0 body"); be32(b, s + 12)
            case 1 => need(e - s >= 28, "mdhd v1 body"); be32(b, s + 20)
            case v => badMp4(s"mdhd version $v")
          }
        }.getOrElse(0L)
        val delta = stblKids.collectFirst {
          case ("stts", s, e) if e - s >= 16 && be32(b, s + 4) >= 1 =>
            be32(b, s + 12) // first run's sample_delta
        }.getOrElse(0L)
        if (ts > 0) delta * 100 / ts else 0L
      }

      // stsz: uniform size, or per-sample sizes bounded by the box length
      val (stszS, stszE) = box1(b, stblKids, "stsz", "stbl")
      need(stszE - stszS >= 12, "stsz body")
      val uniformSize = be32(b, stszS + 4)
      val stszCount = be32(b, stszS + 8)
      val sizedCount =
        if (uniformSize != 0L) stszCount
        else math.min(stszCount, (stszE - stszS - 12) / 4)
      def sampleSize(i: Long): Long =
        if (uniformSize != 0L) uniformSize else be32(b, stszS + 12 + 4 * i)

      // stsc runs: (first_chunk, samples_per_chunk), count ≤ box length
      val (stscS, stscE) = box1(b, stblKids, "stsc", "stbl")
      need(stscE - stscS >= 8, "stsc body")
      val stscN = math.min(be32(b, stscS + 4), (stscE - stscS - 8) / 12)
      if (stscN < 1) badMp4("stsc has no entries")
      val stscRuns = (0L until stscN).map(i =>
        (be32(b, stscS + 8 + 12 * i), be32(b, stscS + 8 + 12 * i + 4)))

      // chunk offsets: stco (uint32) or co64 (uint64), count ≤ box length
      val chunkOffsets: IndexedSeq[Long] =
        stblKids.collectFirst { case ("stco", s, e) => (s, e, 4) }
          .orElse(stblKids.collectFirst { case ("co64", s, e) => (s, e, 8) })
          .map { case (s, e, w) =>
            need(e - s >= 8, "chunk offset box body")
            val n = math.min(be32(b, s + 4), (e - s - 8) / w)
            (0L until n).map(i =>
              if (w == 4) be32(b, s + 8 + 4 * i) else be64(b, s + 8 + 8 * i))
              .toIndexedSeq
          }.getOrElse(badMp4("no stco/co64 box in stbl"))

      // walk chunks in order, laying out sample (start, end) spans; every
      // span is bounds-checked against the payload so a hostile offset or
      // size fails typed, never an ArrayIndexOutOfBounds
      def samplesInChunk(chunk1: Long): Long = // 1-based chunk number
        stscRuns.foldLeft(stscRuns.head._2) { case (acc, (first, per)) =>
          if (first <= chunk1) per else acc
        }
      val spans = IndexedSeq.newBuilder[(Long, Long)]
      var produced = 0L
      var c = 0
      while (c < chunkOffsets.size && produced < sizedCount) {
        var off = chunkOffsets(c)
        var k = 0L
        val per = samplesInChunk(c + 1L)
        while (k < per && produced < sizedCount) {
          val sz = sampleSize(produced)
          if (sz < 0 || off < 0 || off + sz > b.length) badMp4(
            s"sample $produced spans [$off, ${off + sz}) outside the " +
              s"${b.length}-byte payload")
          spans += ((off, off + sz))
          off += sz; produced += 1; k += 1
        }
        c += 1
      }
      val all = spans.result()
      (all.indices by every).map { i =>
        val (s, e) = all(i)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(
            java.util.Arrays.copyOfRange(b, s.toInt, e.toInt)))
        if (img == null) badMp4(
          s"sample $i is not a JDK-decodable JPEG despite the 'jpeg' " +
            "sample-description fourcc")
        (i, img, delayCs)
      }
    }
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
    // single-row-group file → spread decode work across the cluster.
    // A null text means no media payload: excluded at ingest (a real
    // pipeline drops missing media rather than handing every decoder a
    // null buffer) — mirrored by MetaCte's `WHERE text IS NOT NULL`.
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
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
          val (w, h, f) =
            try decoder.decode(r.mime, r.payload)
            catch {
              case e: Exception => throw new IllegalArgumentException(
                s"decode failed for doc_id=${r.doc_id}: ${e.getMessage}", e)
            }
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
      |         CAST(COALESCE(list_sum(${DuckUtf8.byteList("text")}), 0)
      |           % 2147483647 AS BIGINT) AS checksum
      |  FROM documents WHERE text IS NOT NULL),
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
  /** Every 30th frame index per video — shared by the registry query and
    * the Real-seam spec, so the planned work-list logic has ONE home.
    * `mimes` widens the plan to other multi-frame containers (animated
    * GIF under the real decoder); the registry default stays video-only
    * to match its oracle. */
  private[graft] def framePlan(meta: DataFrame,
                               mimes: Seq[String] = Seq("video/mp4"),
                               every: Int = 30): DataFrame =
    meta
      .filter(col("mime").isin(mimes: _*))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(every.toLong))).as("frame_idx"))

  /** One sampled, REAL-decoded frame of a multi-frame payload. */
  final case class FrameRow(doc_id: Long, frame_idx: Long, delay_cs: Long,
      width: Long, height: Long, pixel_crc: Long)

  /** Execute a frame-sample plan with real PIXEL decode — the step after
    * [[framePlan]]: every `every`-th frame of each animated-GIF payload
    * is decoded executor-side via [[RealDecoder.gifFrames]] (only the
    * sampled frames are read; the header count plans the indices). True
    * video codecs keep the typed ffmpeg-seam error — the task fails with
    * doc context exactly like a corrupt payload — and single-frame
    * images / audio rows are not frame-sampleable, so the mime filter
    * excludes them the way [[framePlan]]'s does. */
  def extractFrames(ds: Dataset[MediaRow], every: Int = 30): Dataset[FrameRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(col("mime") === "image/gif" || col("mime").startsWith("video/"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.mime == "image/gif") {
            // ONE doc-context wrapper around BOTH decode steps: the header
            // walk plans the indices, but a payload that passes the header
            // yet corrupts mid-stream fails inside gifFrames — that path
            // must carry doc_id context too, or the task error points at a
            // partition instead of a row.
            try {
              val n = RealDecoder.decode(r.mime, r.payload)._3
              val idx = (0L until n by every.toLong).map(_.toInt)
              RealDecoder.gifFrames(r.payload, idx).map(f =>
                FrameRow(r.doc_id, f.index, f.delay_cs, f.width, f.height,
                  f.pixel_crc))
            } catch {
              case e: Exception => throw new IllegalArgumentException(
                s"frame decode failed for doc_id=${r.doc_id}: ${e.getMessage}", e)
            }
          } else if (r.mime == "video/x-msvideo" || r.mime == "video/avi") {
            // the real-VIDEO pixel leg: MJPEG-in-AVI frames are baseline
            // JPEGs the JDK decodes natively; delay is the container's
            // fixed frame period (avih dwMicroSecPerFrame)
            try {
              // sample against the ACTUAL chunk count, never the header's
              // untrusted dwTotalFrames (ADVICE r18 — a hostile 2^32-1
              // count must not size the index list)
              val meta = RealDecoder.aviMeta(r.payload)
              RealDecoder.aviFrameImagesEvery(r.payload, every).map { case (i, img) =>
                FrameRow(r.doc_id, i.toLong, meta.frame_delay_cs,
                  img.getWidth.toLong, img.getHeight.toLong,
                  RealDecoder.argbCrc(img))
              }
            } catch {
              case e: Exception => throw new IllegalArgumentException(
                s"frame decode failed for doc_id=${r.doc_id}: ${e.getMessage}", e)
            }
          } else if (r.mime == "video/mp4" || r.mime == "video/quicktime" ||
              r.mime == "video/x-m4v") {
            // the ISO-BMFF leg of the real-pixel matrix: 'jpeg' sample
            // descriptions decode natively; true codecs throw the typed
            // ffmpeg-seam error inside mp4FrameImagesEvery, re-wrapped
            // here with doc context like every other decode failure
            try {
              RealDecoder.mp4FrameImagesEvery(r.payload, every).map {
                case (i, img, delay) =>
                  FrameRow(r.doc_id, i.toLong, delay, img.getWidth.toLong,
                    img.getHeight.toLong, RealDecoder.argbCrc(img))
              }
            } catch {
              case e: Exception => throw new IllegalArgumentException(
                s"frame decode failed for doc_id=${r.doc_id}: ${e.getMessage}", e)
            }
          } else
            throw new IllegalArgumentException(
              s"frame extraction for doc_id=${r.doc_id} (${r.mime}) needs " +
                "a codec the JDK does not ship (the ffmpeg seam) — GIF, " +
                "MJPEG-AVI and MJPEG-MP4 are the JDK-native multi-frame " +
                "containers")
        }
      }
  }

  /** One sampled frame after REAL resize execution: source dims, the
    * aspect-preserving box target (same floor semantics as
    * [[resizePlan]]), and the CRC of the resized ARGB raster. */
  final case class ResizedFrameRow(doc_id: Long, frame_idx: Long,
      src_w: Long, src_h: Long, target_w: Long, target_h: Long,
      pixel_crc: Long)

  /** Execute the resize plan on real pixels — the step after
    * [[extractFrames]]: every `every`-th frame of each animated-GIF
    * payload is decoded executor-side, resized into the `box`-bounding
    * aspect-preserving target (floor semantics identical to
    * [[resizePlan]]'s metadata-only targets, applied to the FRAME's own
    * dims — GIF frames may be partial-canvas patches), and emitted as
    * (target dims, pixel CRC). The resize itself is
    * [[RealDecoder.resizeArgb]] — integer nearest-neighbor, so the CRC
    * is bit-reproducible across JDK builds. True video codecs keep the
    * typed ffmpeg-seam error exactly like [[extractFrames]]. */
  def executeResize(ds: Dataset[MediaRow], box: Int = 256,
                    every: Int = 30): Dataset[ResizedFrameRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.filter(col("mime") === "image/gif" || col("mime").startsWith("video/"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          if (r.mime == "image/gif") {
            try {
              val n = RealDecoder.decode(r.mime, r.payload)._3
              val idx = (0L until n by every.toLong).map(_.toInt)
              RealDecoder.gifFrameImages(r.payload, idx).map {
                case (i, _, img) =>
                  val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
                  // floor semantics as resizePlan, clamped to ≥1: a
                  // 512×1 strip would otherwise floor its short side to
                  // a 0-pixel raster, which no image type can hold
                  val (tw, th) =
                    if (w >= h) (box.toLong, math.max(1L, h * box / w))
                    else (math.max(1L, w * box / h), box.toLong)
                  val resized =
                    RealDecoder.resizeArgb(img, tw.toInt, th.toInt)
                  ResizedFrameRow(r.doc_id, i.toLong, w, h, tw, th,
                    RealDecoder.argbCrc(resized))
              }
            } catch {
              case e: Exception => throw new IllegalArgumentException(
                s"resize execution failed for doc_id=${r.doc_id}: " +
                  s"${e.getMessage}", e)
            }
          } else if (r.mime == "video/x-msvideo" || r.mime == "video/avi") {
            try {
              // same clamp as extractFrames: the real chunk list sizes the
              // plan, not the header count
              RealDecoder.aviFrameImagesEvery(r.payload, every).map { case (i, img) =>
                val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
                val (tw, th) =
                  if (w >= h) (box.toLong, math.max(1L, h * box / w))
                  else (math.max(1L, w * box / h), box.toLong)
                val resized = RealDecoder.resizeArgb(img, tw.toInt, th.toInt)
                ResizedFrameRow(r.doc_id, i.toLong, w, h, tw, th,
                  RealDecoder.argbCrc(resized))
              }
            } catch {
              case e: Exception => throw new IllegalArgumentException(
                s"resize execution failed for doc_id=${r.doc_id}: " +
                  s"${e.getMessage}", e)
            }
          } else if (r.mime == "video/mp4" || r.mime == "video/quicktime" ||
              r.mime == "video/x-m4v") {
            try {
              RealDecoder.mp4FrameImagesEvery(r.payload, every).map {
                case (i, img, _) =>
                  val (w, h) = (img.getWidth.toLong, img.getHeight.toLong)
                  val (tw, th) =
                    if (w >= h) (box.toLong, math.max(1L, h * box / w))
                    else (math.max(1L, w * box / h), box.toLong)
                  val resized = RealDecoder.resizeArgb(img, tw.toInt, th.toInt)
                  ResizedFrameRow(r.doc_id, i.toLong, w, h, tw, th,
                    RealDecoder.argbCrc(resized))
              }
            } catch {
              case e: Exception => throw new IllegalArgumentException(
                s"resize execution failed for doc_id=${r.doc_id}: " +
                  s"${e.getMessage}", e)
            }
          } else
            throw new IllegalArgumentException(
              s"resize execution for doc_id=${r.doc_id} (${r.mime}) needs " +
                "a codec the JDK does not ship (the ffmpeg seam) — GIF, " +
                "MJPEG-AVI and MJPEG-MP4 are the JDK-native multi-frame " +
                "containers")
        }
      }
  }

  val multimodalFrameSample = GQuery(
    "multimodal_frame_sample",
    (s, d) => framePlan(extractMeta(mediaTable(s, d), decoderFor(s)).toDF()),
    oracle = Some(
      s"""$MetaCte
         |SELECT doc_id, n_frames,
         |       unnest(range(0::BIGINT, n_frames::BIGINT, 30::BIGINT)) AS frame_idx
         |FROM m2 WHERE mime = 'video/mp4'""".stripMargin))

  /** Q:multimodal_resize_plan — resize planning: target bounding box 256×256
    * preserving aspect ratio (integer arithmetic, floor semantics in both
    * engines). The actual pixel work is the decoder seam's job.
    */
  /** Aspect-preserving 256-box resize targets (integer floor semantics) —
    * shared by the registry query and the Real-seam spec. */
  private[graft] def resizePlan(meta: DataFrame, mimePrefix: String = "image/"): DataFrame =
    meta
      .filter(col("mime").startsWith(mimePrefix))
      .select(col("doc_id"), col("width"), col("height"),
        when(col("width") >= col("height"), lit(256L))
          .otherwise(expr("width * 256 div height")).as("target_w"),
        when(col("width") >= col("height"), expr("height * 256 div width"))
          .otherwise(lit(256L)).as("target_h"))

  val multimodalResizePlan = GQuery(
    "multimodal_resize_plan",
    (s, d) =>
      resizePlan(extractMeta(mediaTable(s, d), decoderFor(s)).toDF(), "image/png"),
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
  /** One window per 16k samples (ceil) — shared by the registry query
    * (n_samples approximated from payload bytes, the only thing the fake
    * decoder knows) and the Real-seam spec. */
  private[graft] def audioWindowPlan(meta: DataFrame): DataFrame =
    meta
      .filter(col("mime").startsWith("audio/"))
      .withColumn("n_samples", expr("n_bytes div 2"))
      .withColumn("n_windows", expr("(n_samples + 15999) div 16000"))
      .filter(col("n_windows") > 0)
      .select(col("doc_id"), col("n_samples"), col("n_windows"),
        explode(sequence(lit(0L), col("n_windows") - 1)).as("window_idx"))
      .withColumn("start_sample", col("window_idx") * 16000L)

  val multimodalAudioWindows = GQuery(
    "multimodal_audio_windows",
    (s, d) => audioWindowPlan(extractMeta(mediaTable(s, d), decoderFor(s)).toDF()),
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
