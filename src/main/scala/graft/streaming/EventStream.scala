package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming variants of the reference's streaming surface
  * (SURVEY §2.7): the scoreboard function as an update-mode aggregation
  * (A1/A2, ScoreboardFunction.java:15-101), TableView compaction as keyed
  * state (S5, pulsar.go:160-167), flame-TTL timers as processing-time
  * timeouts (ST2, event.go:100-107/167-175), and the effectively-once KV
  * sink as idempotent overwrite-by-key in foreachBatch (ST6/S7).
  *
  * Batch/stream unification: every transform here reuses the SAME column
  * derivations as the batch queries (graft.operators.EventOps.gameColumns),
  * so the parity tests can assert stream result == batch result on the same
  * input files — the Spark restatement of "same initial state + same event
  * sequence ⇒ same result" (docs/en/game1-introduce.md:93-97).
  */
object EventStream {

  /** Wire schema of the events table for the file stream source. `ts`
    * declares the MODERN µs-timestamp generation; readEvents re-resolves
    * the field from the actual footer when files exist (nanos-long
    * generations override it to LongType). The start-before-producer
    * fallback therefore reads a µs generation correctly and fails LOUDLY
    * (reader type mismatch) on a nanos one — the previous nanos-long
    * default inverted that: a µs generation misread as nanos divided
    * every timestamp by 1000 with no error.
    */
  val EventsFileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** JSON payload schema for broker-delivered events (the reference
    * serializes one JSON event per Pulsar message, pulsar.go:133-138).
    */
  val EventsPayloadSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Source seam: which streaming connector delivers the event log. The
    * pipelines downstream of [[readEvents]] only see the normalized
    * events-shaped columns (event_id, ts, user_id, event_type, value,
    * props), so swapping the testbed file source for the Pulsar connector
    * is a config change, not a code change:
    *
    *   EventStream.readEvents(spark, EventSourceConfig.pulsar(
    *     serviceUrl = "pulsar://broker:6650",
    *     adminUrl   = "http://broker:8080",
    *     topicsPattern = "persistent://public/default/game-.*"))
    *
    * Broker-column mapping (reference semantics, pulsar.go:124-179):
    *   - topic (`__topic`, one topic per room — S6 regex fan-in via
    *     `topicsPattern`) carries the room: normalize parses it into a
    *     `room` output column (the deployment keys rooms by topic, unlike
    *     the testbed's user_id derivation);
    *   - `__sequenceId` (MessageID ledger order) → `event_id`/seq — the
    *     per-topic total order the reference's replay contract needs;
    *     unique only within a room, so global keys are (room, event_id);
    *   - `__publishTime` → `ts` (event time for watermarks);
    *   - message payload (JSON) → user_id/event_type/value/props via
    *     [[EventsPayloadSchema]].
    */
  final case class EventSourceConfig(
      format: String,
      path: Option[String] = None,
      options: Map[String, String] = Map.empty,
      schema: Option[StructType] = None)

  object EventSourceConfig {
    /** Testbed file source standing in for the broker; `maxFilesPerTrigger`
      * bounds micro-batch size the way the reference's receive loop drains
      * one event per frame. Glob form: the file source requires a directory
      * or glob, and the testbed stores each table as a single parquet file.
      */
    def file(dir: String): EventSourceConfig = EventSourceConfig(
      format = "parquet",
      path = Some(s"$dir/events.parque[t]"),
      options = Map("maxFilesPerTrigger" -> "1"),
      schema = Some(EventsFileSchema))

    /** Pulsar connector config — drops in unmodified where the connector
      * jar is on the classpath (none exists in this sandbox, so the LIVE
      * path is exercised only down to the DataStreamReader wiring; the
      * normalization it feeds is executed end-to-end by [[pulsarReplay]],
      * and the option-name contract by StreamingSpec's connector-contract
      * cases). Option names are the pulsar-spark-connector's documented
      * reader options: `service.url`, `admin.url`, exactly one of
      * `topic`/`topics`/`topicsPattern`, and `startingOffsets` —
      * `earliest` replays the topic from the start (S3 bounded replay /
      * the reference's watch mode), `latest` tails new messages only
      * (S2, the reference's subscribe-from-now default), and an offset
      * JSON resumes a specific position (S5/ST5 offset management).
      */
    def pulsar(serviceUrl: String, adminUrl: String,
               topicsPattern: String,
               startingOffsets: String = "earliest"): EventSourceConfig = {
      require(
        startingOffsets == "earliest" || startingOffsets == "latest" ||
          startingOffsets.trim.startsWith("{"),
        s"startingOffsets must be earliest | latest | offset JSON, got: $startingOffsets")
      EventSourceConfig(
        format = "pulsar",
        options = Map(
          "service.url" -> serviceUrl,
          "admin.url" -> adminUrl,
          "topicsPattern" -> topicsPattern,
          "startingOffsets" -> startingOffsets))
    }

    /** Captured-frame replay: a directory of parquet files holding RAW
      * broker frames ([[PulsarFrameSchema]] — the connector's output
      * columns, e.g. a topic dump), streamed through the file source and
      * the SAME `pulsar` normalization branch as the live connector. This
      * is how the topic→room / MessageID→seq / publishTime→ts mapping is
      * executed (not just config-inspected) without a broker.
      */
    def pulsarReplay(framesDir: String): EventSourceConfig = EventSourceConfig(
      format = "pulsar",
      path = Some(framesDir),
      options = Map("maxFilesPerTrigger" -> "1"),
      schema = Some(PulsarFrameSchema))
  }

  /** The connector's raw frame columns — what a Pulsar source (or a
    * captured topic dump) delivers before normalization.
    */
  val PulsarFrameSchema: StructType = StructType(Seq(
    StructField("__topic", StringType),
    StructField("__sequenceId", LongType),
    StructField("__publishTime", TimestampType),
    StructField("value", BinaryType)))

  /** S2/S3: the event log as an unbounded stream through the source seam —
    * build the reader from config, normalize to the events-shaped columns.
    */
  def readEvents(spark: SparkSession, cfg: EventSourceConfig): DataFrame = {
    if (cfg.format == "parquet")
      // nanos-timestamp testdata generations need this conf or the reader
      // rejects the column (Illegal-Parquet-TIMESTAMP(NANOS)); harmless on
      // µs generations — the file branch owns it so seam callers never care
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // frame replay: broker frames arrive via the parquet file source but
    // flow through the `pulsar` normalization branch below — the replay
    // and the live connector differ ONLY in the physical reader
    val readerFormat =
      if (cfg.format == "pulsar" && cfg.path.isDefined) "parquet"
      else cfg.format
    // the file source needs a declared schema, but the testbed's physical
    // ts type varies by generation (nanos long vs µs timestamp) — resolve
    // ONLY the ts field against the actual footer (other declared types
    // are contracts, not guesses), and keep the declared schema when the
    // path has no files yet (a stream may start before its producer)
    val resolvedSchema = cfg.schema.map { sch =>
      if (readerFormat == "parquet" && cfg.path.isDefined &&
          sch.fieldNames.contains("ts")) {
        // only the path-empty/unable-to-infer case falls back to the
        // declared schema (a stream may start before its producer);
        // genuine IO/corruption errors must surface, not be masked as a
        // silent schema downgrade
        val footerTs =
          try spark.read.parquet(cfg.path.get).schema.find(_.name == "ts")
          catch {
            case _: org.apache.spark.sql.AnalysisException => None
          }
        footerTs
          .map(tsField => StructType(sch.map(f =>
            if (f.name == "ts") tsField else f)))
          .getOrElse(sch)
      } else sch
    }
    var reader = spark.readStream.format(readerFormat)
    resolvedSchema.foreach(s => reader = reader.schema(s))
    reader = reader.options(cfg.options)
    val raw = cfg.path.map(reader.load).getOrElse(reader.load())
    normalize(cfg, raw)
  }

  /** Per-format normalization to the shared events shape. For broker
    * sources the output carries an extra `room` column (parsed from the
    * topic) and `event_id` is the PER-TOPIC MessageID order — unique only
    * within a room, exactly like the reference's per-topic MessageIDs; any
    * global key must be the (room, event_id) pair.
    */
  private[graft] def normalize(cfg: EventSourceConfig, raw: DataFrame): DataFrame =
    cfg.format match {
      case "pulsar" =>
        // broker framing → events shape (see EventSourceConfig scaladoc);
        // room = last topic path segment minus the "-event-topic" suffix
        // (C9/C10, pulsar.go:124-138). substring_index + anchored suffix
        // replace, NOT `regexp_extract('([^/]+?)(-event-topic)?$', 1)`:
        // the negated-class/lazy-quantifier extract measures ~9× slower
        // per topic (3.65 s vs 0.97 s over 20M topics) and this runs once
        // per EVENT on the broker ingest path. Output matches the old
        // regex on every shape except ONE degenerate edge: a segment
        // exactly equal to "-event-topic" parsed as room "-event-topic"
        // under the old regex (the lazy group cannot be empty) and parses
        // as room "" here — which is what the reference's own
        // TrimSuffix-style inverse of "{room}-event-topic" produces, so
        // the new behavior is the CORRECT one. PulsarSeamSpec pins all
        // the edges including this one.
        // \z, not $: Java's $ also matches before a final line terminator,
        // so a pathological topic "room-1-event-topic\n" would strip the
        // suffix mid-string and yield room "room-1\n". \z anchors to the
        // true end of input, which is exact TrimSuffix semantics — the
        // reference's inverse of "{room}-event-topic" strips only a TRUE
        // suffix (broker names can't contain newlines, but the anchor
        // costs nothing; PulsarSeamSpec pins the edge)
        raw.select(
          regexp_replace(substring_index(col("__topic"), "/", -1),
            "(-event-topic)\\z", "").as("room"),
          col("__sequenceId").as("event_id"),
          col("__publishTime").as("ts"),
          from_json(col("value").cast("string"), EventsPayloadSchema).as("e"))
          .select(col("room"), col("event_id"), col("ts"), col("e.user_id"),
            col("e.event_type"), col("e.value"), col("e.props"))
      case _ =>
        // testbed parquet: ts arrives as a nanos long or a µs timestamp
        // depending on the testdata generation (see Tables.events)
        graft.Tables.normalizeTs(raw)
    }

  /** Back-compat entry: the testbed file source for `dir`. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    readEvents(spark, EventSourceConfig.file(dir))

  /** A1 streaming: running kill-count per (room, killer) — update-mode hash
    * aggregation; Spark's state store is the BookKeeper counter analog.
    */
  def killCounts(events: DataFrame): DataFrame =
    graft.operators.EventOps.gameColumns(events)
      .filter(col("event_type") === "error")
      .filter(col("victim") =!= col("killer"))
      .groupBy(col("room"), col("killer"))
      .agg(count(lit(1)).as("kills"))

  /** C15/W-window streaming: tumbling 1-hour windowed count per room with a
    * watermark — the capability the reference sidesteps by assuming a totally
    * ordered log (SURVEY §2.7 note).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    graft.operators.EventOps.gameColumns(events)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("room"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket_start"), col("room"), col("n"))

  /** The stream-stream interval join — the one Structured Streaming
    * capability the rest of the streaming family doesn't exercise
    * (stream×static joins broadcast a fixed frame; HERE both sides are
    * unbounded and Spark must keep watermark-bounded join state). Same
    * semantics as the batch `join_followup_window` pair frame: an error
    * within [[graft.operators.AnalyticsOps.FollowupWindowMin]] minutes
    * after a purchase, per user. The time-range condition plus both
    * watermarks is exactly what lets Spark evict a purchase's state once
    * the error-side watermark passes its window end — unbounded streams,
    * bounded state. Append-mode safe (inner join, both sides
    * watermarked).
    */
  def followupJoin(events: DataFrame): DataFrame = {
    val win = graft.operators.AnalyticsOps.FollowupWindowMin
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u_p"), col("ts").as("t_p"),
        col("event_id").as("id_p"))
      .withWatermark("t_p", "2 hours")
    val e = events.filter(col("event_type") === "error")
      .select(col("user_id").as("u_e"), col("ts").as("t_e"))
      .withWatermark("t_e", "2 hours")
    p.join(e,
      col("u_p") === col("u_e") &&
        col("t_e") > col("t_p") &&
        col("t_e") <= col("t_p") + expr(s"INTERVAL $win MINUTES"))
      .select(col("u_p").as("user_id"), col("id_p"), col("t_p"), col("t_e"))
  }

  /** Sessionization on the live stream: gap-based session_window per victim —
    * the arrival-time twin of the batch `window_session` query (same
    * projection, so the parity spec compares them row-for-row). State is one
    * open session per (victim, gap-run): merging is Spark-native, and the
    * watermark bounds how long a session can stay open, which is what caps
    * state size on an unbounded stream.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    graft.operators.EventOps.gameColumns(events)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("victim"))
      .agg(count(lit(1)).as("n"),
        sum(expr(graft.operators.ExactSql.ValueE2)).as("sum_value_e2"))
      .select(
        unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("victim"), col("n"), col("sum_value_e2"))

  // ---- keyed state (S5 TableView / A2 changelog) ------------------------

  case class KeyedEvent(room: String, victim: String, seq: Long, value: Double)
  case class LastValue(room: String, victim: String, last_seq: Long, last_value: Double)

  /** S5: TableView compaction as explicit keyed state — emits the latest
    * value per (room, victim) on every update (changelog semantics, A2).
    */
  def lastPerKey(events: DataFrame): Dataset[LastValue] = {
    val spark = events.sparkSession
    import spark.implicits._
    graft.operators.EventOps.gameColumns(events)
      .select(col("room"), col("victim"), col("seq"), col("value"))
      .as[KeyedEvent]
      .groupByKey(e => (e.room, e.victim))
      .mapGroupsWithState[LastValue, LastValue](GroupStateTimeout.NoTimeout) {
        case ((room, victim), events, state) =>
          val prev = state.getOption
          val best = (events ++ prev.map(s =>
            KeyedEvent(room, victim, s.last_seq, s.last_value)).iterator)
            .maxBy(_.seq)
          val next = LastValue(room, victim, best.seq, best.value)
          state.update(next)
          next
      }
  }

  // ---- ST2: timer-derived events ---------------------------------------

  case class FlameState(bombName: String, litAtMs: Long)
  case class DerivedEvent(bomb_name: String, event_type: String)

  /** ST2: flame TTL — when a bomb's flame state times out (the 2s flameTime,
    * game.go:40-41), emit the derived UndoExplodeEvent exactly as the owner
    * client does in live mode (event.go:167-175). In replay these derived
    * events are already in the log, so the batch fold never needs timers.
    */
  def flameTimers(bombs: Dataset[String], ttlMs: Long): Dataset[DerivedEvent] = {
    val spark = bombs.sparkSession
    import spark.implicits._
    bombs
      .groupByKey(identity)
      .flatMapGroupsWithState[FlameState, DerivedEvent](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        case (bombName, rows, state) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator(DerivedEvent(bombName, "UndoExplodeEvent"))
          } else if (rows.nonEmpty && !state.exists) {
            state.update(FlameState(bombName, System.currentTimeMillis()))
            state.setTimeoutDuration(ttlMs)
            Iterator(DerivedEvent(bombName, "ExplodeEvent"))
          } else {
            // bomb already lit: re-arrivals are suppressed, mirroring the
            // reference's existence guard (event.go:118-121) — no duplicate
            // explode/undo pairs reach the derived-event stream. The
            // timeout MUST be re-armed for the REMAINING ttl: Spark
            // clears a group's pending timeout on every invocation with
            // data, so returning without re-setting it would leave the
            // flame lit forever (no UndoExplodeEvent, state never freed).
            state.getOption.foreach { st =>
              val remaining =
                math.max(1L, st.litAtMs + ttlMs - System.currentTimeMillis())
              state.setTimeoutDuration(remaining)
            }
            Iterator.empty
          }
      }
  }

  /** Streaming exact dedup keyed on event_id (globally unique in the
    * testbed's events shape; for a broker source, key on the
    * (room, event_id) PAIR — per-topic MessageIDs collide across rooms).
    * NOTE: without the event-time column among the keys, dropDuplicates
    * state grows with the number of distinct ids for the stream's
    * lifetime — use [[dedupedWithinWatermark]] for unbounded streams; this
    * variant exists for exact global dedup over bounded replays, and
    * deliberately carries NO watermark: a watermark here would buy no
    * state eviction (ts is not a dedup key) while silently DROPPING any
    * row later batches deliver behind it — an out-of-order replay file
    * would lose events from the "exact" output.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Stricter state bound: duplicates only matter within the watermark
    * delay, so state for an id is dropped as soon as the watermark passes
    * its event time (dropDuplicates keeps ids forever without an event-time
    * key column; this variant is the 100 TB-stream default).
    */
  def dedupedWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  // ---- ST3: leader-elected periodic map regeneration --------------------

  /** ST3: the reference's periodic map-regen job — every `updateObstacleTime`
    * seconds the exclusive-subscription winner emits an `UpdateMapEvent`
    * with a fresh random obstacle list (game.go:412-425; election
    * pulsar.go:198-227). In Spark the single driver IS the unique leader,
    * so election is structural, not code; the job itself is a rate-source
    * stream mapped through [[mapRegenEvents]].
    */
  def periodicMapRegen(spark: SparkSession, intervalSec: Int): DataFrame = {
    // pmod(value, 0) is NULL in Spark: a non-positive interval would
    // start a healthy-looking query that never emits a tick — fail at
    // construction instead (the pulsar() factory's require style)
    require(intervalSec > 0, s"intervalSec must be positive, got $intervalSec")
    mapRegenEvents(
      spark.readStream.format("rate")
        .option("rowsPerSecond", "1") // rate accepts whole rows/sec only
        .load()
        .filter(pmod(col("value"), lit(intervalSec.toLong)) === 0))
  }

  /** tick rows → UpdateMapEvent rows: the obstacle list is derived
    * DETERMINISTICALLY from the tick via the graft_polyhash rolling hash
    * (the deterministic restatement of genRandomObstacleList,
    * game.go:359-378 — replay then needs no reconciliation, matching the
    * log-is-truth contract; polyhash rather than xxhash64 so the DuckDB
    * oracle replays the derivation — Q:map_regen_grid). Codes use the
    * reference's +1-shifted sign encoding (event.go:229-246): positive =
    * indestructible.
    */
  def mapRegenEvents(ticks: DataFrame): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(ticks.sparkSession)
    ticks.select(
      col("value").cast("long").as("tick"),
      lit("UpdateMapEvent").as("event_type"),
      expr(
        """transform(sequence(0, 63), i ->
          |  CAST(IF(pmod(graft_polyhash(concat(value, ':', i, ':d')), 2) = 0,
          |     pmod(graft_polyhash(concat(value, ':', i)), 750) + 1,
          |     -(pmod(graft_polyhash(concat(value, ':', i)), 750) + 1)) AS INT))
          |""".stripMargin).as("list"))
  }

  // ---- ST7: lossy admission (bounded send buffer) -----------------------

  /** ST7: the reference's bounded send buffer (capacity-50 channel,
    * game.go:407; sendAsync drops the INCOMING event when full with a
    * warning, game.go:264-268). Micro-batch analog: per-key admission
    * control at the sink boundary — each batch admits the `capacity`
    * lowest-seq events per key and abandons the rest, deterministically
    * (the reference drops whatever raced in last; seq order is the
    * deterministic restatement). Returns (admitted, dropped-counts) so the
    * caller can emit the reference's abandonment warning as a metric.
    * Meant for foreachBatch — admission happens where sendAsync sits in
    * the reference, between pipeline and broker.
    */
  def admitLossy(batch: DataFrame, keyCols: Seq[String], seqCol: String,
                 capacity: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    // namespaced rank column: a pass-through payload column named "__rn"
    // must not be clobbered. NOTE: the two returned frames each
    // re-evaluate the ranking — a foreachBatch caller materializing BOTH
    // should cache the batch first, or the sink path pays the
    // window-sort twice per trigger.
    val rn = "__graft_admit_rn"
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    val ranked = batch.withColumn(rn, row_number().over(w))
    val admitted = ranked.filter(col(rn) <= capacity).drop(rn)
    val dropped = ranked.filter(col(rn) > capacity)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_abandoned"))
    (admitted, dropped)
  }

  // ---- ST8: paced replay ------------------------------------------------

  /** ST8: replay pacing — the reference replays one event per 200 ms tick
    * (watch.go:63-80) so playback isn't "too fast". Micro-batch analog:
    * batch size bounded by the source options (maxFilesPerTrigger) and
    * batches spaced by Trigger.ProcessingTime. Presentation-rate control
    * lives in the trigger, not the transforms — the same pipeline runs
    * un-paced for analytics.
    */
  def pacedReplay(df: DataFrame, name: String, tickMs: Long): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.ProcessingTime(tickMs))
      .start()

  // ---- sinks ------------------------------------------------------------

  /** ST6/S7: effectively-once KV sink — overwrite-by-key parquet "store"
    * refreshed per micro-batch. Idempotent overwrite + checkpointing =
    * the EFFECTIVELY_ONCE guarantee (ScoreboardFunction.java:93).
    */
  def kvSink(scores: DataFrame, kvDir: String, checkpointDir: String): StreamingQuery =
    scores.writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(kvDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  // ---- watermark late-data accounting ------------------------------------

  /** Rows DROPPED BY THE WATERMARK so far, per stateful operator — summed
    * over the query's retained progress events (the last
    * `spark.sql.streaming.numRecentProgressUpdates`, default 100; a
    * production monitor should fold each progress event into its own
    * counter from a StreamingQueryListener instead of re-reading the
    * bounded buffer).
    *
    * This is the number the streaming parity specs can't see: they replay
    * in order, so every watermarked op (windowedCounts, sessionCounts,
    * followupJoin, dedupedWithinWatermark) admits everything. On a real
    * stream a row arriving behind the watermark VANISHES from append-mode
    * results — correct eviction semantics, but silent unless this counter
    * is surfaced. Keyed by operator name (`stateStoreSave`,
    * `sessionWindowStateStoreSave`, `symmetricHashJoin`,
    * `dedupeWithinWatermark`) so a multi-stage query attributes its drops.
    */
  def lateDropsByOperator(q: StreamingQuery): Map[String, Long] =
    q.recentProgress.toSeq.flatMap(_.stateOperators)
      .groupBy(_.operatorName)
      .map { case (op, ps) => op -> ps.map(_.numRowsDroppedByWatermark).sum }

  /** Total watermark-dropped rows across all operators — the one-number
    * alert threshold. */
  def lateDrops(q: StreamingQuery): Long =
    lateDropsByOperator(q).values.sum

  // ---- state-store size accounting ---------------------------------------

  /** `numRowsTotal` per stateful operator across the retained progress
    * events, in batch order — the state-GROWTH trend line, the
    * production alarm that pairs with [[lateDropsByOperator]]: late
    * drops say rows vanished, this says state is (or is not) growing
    * without bound. For the bounded-state operators (lastPerKey = one
    * row per live key, StreamingTopK ≤ one ranking per query,
    * StreamingSketch ≤ k entries per group) the series must go FLAT
    * once the key universe saturates — StreamingSpec pins that over a
    * multi-batch run; an unbounded-state bug (e.g. keying on an
    * ever-growing attribute) shows up here as a monotone climb. Same
    * retention caveat as [[lateDropsByOperator]]: a production monitor
    * folds progress events from a StreamingQueryListener instead of
    * re-reading the bounded buffer. */
  def stateRowsHistory(q: StreamingQuery): Map[String, Seq[Long]] =
    q.recentProgress.toSeq
      .flatMap(p => p.stateOperators.toSeq.map(s =>
        (s.operatorName, p.batchId, s.numRowsTotal)))
      .groupBy(_._1)
      .map { case (op, xs) => op -> xs.sortBy(_._2).map(_._3) }

  /** Latest state footprint per operator: (numRowsTotal,
    * memoryUsedBytes) from the most recent progress event that ran it —
    * the two numbers a capacity dashboard charts per query. */
  def stateSizeByOperator(q: StreamingQuery): Map[String, (Long, Long)] =
    q.recentProgress.toSeq
      .flatMap(p => p.stateOperators.toSeq.map(s =>
        (s.operatorName, p.batchId, s.numRowsTotal, s.memoryUsedBytes)))
      .groupBy(_._1)
      .map { case (op, xs) =>
        val last = xs.maxBy(_._2)
        op -> (last._3, last._4)
      }

  /** Run any streaming DataFrame to a named memory sink until input drains. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): Unit = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    // stop on BOTH paths: a drain-time failure must not leak a running
    // query (and its checkpoint threads) on the shared session
    try q.processAllAvailable()
    finally q.stop()
  }
}
