package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream

/** Batch/stream parity (SURVEY §3.2's unification claim): the same
  * derivation run as a stream over the same files must equal the batch
  * result; keyed-state compaction must equal the batch max_by; timers must
  * emit the derived events the reference's owner-client emits.
  */
class StreamingSpec extends SparkSuite {

  private def batchKillCounts = {
    EventStream.killCounts(Tables.events(spark, smokeDir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
  }

  test("streaming kill-count (update mode) == batch aggregation") {
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      EventStream.killCounts(stream), "kills_stream", OutputMode.Complete)
    val streamed = spark.table("kills_stream")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batchKillCounts)
    assert(streamed.nonEmpty)
  }

  test("source seam: explicit EventSourceConfig runs the same pipeline") {
    // the Pulsar connector swaps in by handing readEvents a different
    // config; here the file config exercises the identical seam (which
    // owns the nanos-timestamp conf — no caller-side setup needed)
    val stream = EventStream.readEvents(
      spark, EventStream.EventSourceConfig.file(smokeDir))
    EventStream.runToMemory(
      EventStream.killCounts(stream), "kills_seam", OutputMode.Complete)
    val streamed = spark.table("kills_seam")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batchKillCounts)
    assert(streamed.nonEmpty)
  }

  test("pulsar config emits EXACTLY the documented connector option names") {
    // the "drops in unmodified" claim, as a contract: the option MAP must
    // equal the pulsar-spark-connector's documented reader options —
    // service.url, admin.url, one topic selector, startingOffsets — with
    // no stray keys for the connector to ignore silently
    val cfg = EventStream.EventSourceConfig.pulsar(
      "pulsar://broker:6650", "http://broker:8080",
      "persistent://public/default/game-.*")
    assert(cfg.format === "pulsar")
    assert(cfg.options === Map(
      "service.url" -> "pulsar://broker:6650",
      "admin.url" -> "http://broker:8080",
      "topicsPattern" -> "persistent://public/default/game-.*",
      "startingOffsets" -> "earliest"))
    // exactly ONE topic selector (the connector rejects ambiguity)
    assert(cfg.options.keySet.count(
      Set("topic", "topics", "topicsPattern")) === 1)
    assert(cfg.schema.isEmpty) // broker source infers its own schema
  }

  test("pulsar startingOffsets: replay/tail/resume map to S3/S2/ST5") {
    def offsets(so: String) = EventStream.EventSourceConfig.pulsar(
      "pulsar://b:6650", "http://b:8080", "t-.*", so).options("startingOffsets")
    assert(offsets("earliest") === "earliest") // S3 bounded replay
    assert(offsets("latest") === "latest")     // S2 tail-from-latest
    val json = """{"topic-1": [8, 11, 52]}"""  // ST5 offset resume
    assert(offsets(json) === json)
    intercept[IllegalArgumentException] {
      EventStream.EventSourceConfig.pulsar(
        "pulsar://b:6650", "http://b:8080", "t-.*", "beginning")
    }
  }

  test("pulsar normalize: topic → room, per-topic seq, payload decode") {
    import spark.implicits._
    // the connector's standard columns, as a batch frame (normalize is
    // format-level column mapping — no broker needed to verify it)
    val raw = Seq(
      ("persistent://public/default/room3-event-topic", 0L, 1700000000000L,
        """{"user_id": 7, "event_type": "error", "value": 1.5, "props": "{}"}"""),
      ("persistent://public/default/room4-event-topic", 0L, 1700000000001L,
        """{"user_id": 8, "event_type": "signup", "value": 2.0, "props": "{}"}"""))
      .toDF("__topic", "__sequenceId", "__publishTime", "value")
    val out = EventStream.normalize(
      EventStream.EventSourceConfig.pulsar("p://b", "h://b", ".*"), raw)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getString(4)))
    // rooms parsed from topics; the SAME per-topic seq 0 appears in both
    // rooms — which is why (room, event_id) is the documented global key
    assert(out.toSet === Set(
      ("room3", 0L, 7L, "error"), ("room4", 0L, 8L, "signup")))
  }

  test("gameColumns keeps a broker-derived room instead of re-fabricating it") {
    import spark.implicits._
    // normalize's output carries the TOPIC room; the game derivation must
    // pass it through (re-deriving from user_id % 8 would key every
    // per-room pipeline wrongly on a real deployment)
    val raw = Seq(
      ("persistent://public/default/roomX-event-topic", 5L, 1700000000000L,
        """{"user_id": 7, "event_type": "error", "value": 1.5, "props": "{\"k\": 3}"}"""))
      .toDF("__topic", "__sequenceId", "__publishTime", "value")
    val normalized = EventStream.normalize(
      EventStream.EventSourceConfig.pulsar("p://b", "h://b", ".*"), raw)
    val game = graft.operators.EventOps.gameColumns(normalized)
      .select("room", "seq", "victim").collect().head
    assert(game.getString(0) === "roomX") // NOT "room7" (user_id % 8)
    assert(game.getLong(1) === 5L)
    assert(game.getString(2) === "u7")
  }

  test("periodic map regen: deterministic obstacle lists per tick") {
    import spark.implicits._
    val ticks = Seq(0L, 1L, 2L, 1L).toDF("value")
    val rows = EventStream.mapRegenEvents(ticks)
      .collect().map(r => (r.getLong(0), r.getSeq[Int](2)))
    assert(rows.forall(_._2.length === 64))
    assert(rows.forall(_._2.forall(c => math.abs(c) >= 1 && math.abs(c) <= 750)))
    // same tick ⇒ same list (log-is-truth: replay needs no reconciliation)
    val byTick = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    assert(byTick.values.forall(_ === 1))
    // different ticks ⇒ different lists
    assert(rows.map(_._2).distinct.length === 3)
    // the production wiring is a rate-source stream (driver = leader)
    assert(EventStream.periodicMapRegen(spark, 60).isStreaming)
  }

  test("lossy admission: capacity bounds each key, drops are counted") {
    import spark.implicits._
    // 3 keys × 40 events, capacity 25 — mirrors sendAsync's cap-50 buffer
    val batch = (1 to 120).map(i => (s"r${i % 3}", i.toLong, s"e$i"))
      .toDF("room", "seq", "payload")
    val (admitted, dropped) =
      EventStream.admitLossy(batch, Seq("room"), "seq", capacity = 25)
    val perKey = admitted.groupBy("room").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perKey.values.toSet === Set(25L))
    // deterministic: the LOWEST seqs are admitted
    val maxAdmitted = admitted.groupBy("room").agg(max("seq").as("m"))
      .collect().map(_.getLong(1)).toSet
    assert(maxAdmitted.forall(_ <= 75), s"expected low seqs kept: $maxAdmitted")
    val drops = dropped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(drops.values.toSet === Set(15L)) // 40 - 25 per key
  }

  test("paced replay: ProcessingTime trigger drains the log") {
    // the reference paces RAW replay events into the fold client — pace the
    // events projection, not an aggregate (Append mode)
    val stream = EventStream.readEvents(spark, smokeDir)
    val q = EventStream.pacedReplay(
      graft.operators.EventOps.gameColumns(stream)
        .select("room", "seq", "event_type"), "paced", tickMs = 50)
    try {
      q.processAllAvailable()
      assert(spark.table("paced").count() > 0)
    } finally q.stop()
  }

  test("streaming windowed count with watermark == batch window agg") {
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      EventStream.windowedCounts(stream), "win_stream", OutputMode.Complete)
    val streamed = spark.table("win_stream")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    val batch = EventStream.windowedCounts(Tables.events(spark, smokeDir))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream followup join == batch pair frame") {
    // both join sides are unbounded streams: Spark keeps watermark-bounded
    // state instead of a broadcast — the parity proves the time-range
    // condition is the same window the batch query applies
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      EventStream.followupJoin(stream), "followup_stream", OutputMode.Append)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))
    val streamed = spark.table("followup_stream").collect().map(key).toSet
    val batch = graft.operators.AnalyticsOps
      .followupPairFrame(Tables.events(spark, smokeDir))
      .select(col("user_id"), col("id_p"), col("t_p"), col("t_e"))
      .collect().map(key).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming OHLC candles == batch ohlc_daily") {
    // the SAME declarative aggregate runs incrementally: min_by/max_by
    // partials are order-insensitive state, so the streamed candles
    // converge to the batch result whatever the micro-batch boundaries
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      graft.operators.AnalyticsOps.ohlcDaily(stream),
      "ohlc_stream", OutputMode.Complete)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getLong(7))
    val streamed = spark.table("ohlc_stream").collect().map(key).toSet
    val batch = graft.operators.AnalyticsOps
      .ohlcDaily(Tables.events(spark, smokeDir)).collect().map(key).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming session_window per victim == batch window_session") {
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      EventStream.sessionCounts(stream), "sess_stream", OutputMode.Complete)
    val streamed = spark.table("sess_stream")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    val batch = graft.operators.EventOps.windowSession.run(spark, smokeDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4)))
      .toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming burst changelog folds to the batch flag set") {
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      graft.streaming.StreamingAnomaly.bursts(stream).toDF(),
      "burst_stream", OutputMode.Append)
    // fold the changelog: latest emission per (user, hr) by seq
    val folded = spark.table("burst_stream")
      .groupBy("user_id", "hr")
      .agg(max_by(col("flagged"), col("seq")).as("fl"),
        max_by(col("cnt"), col("seq")).as("cnt"))
      .filter(col("fl"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val batch = graft.operators.AnalyticsOps.anomalyBurst(
        Tables.events(spark, smokeDir))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(folded === batch)
    assert(folded.nonEmpty)
  }

  test("streaming burst flags clear when later hours raise the baseline") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Long, Timestamp)]
    val q = graft.streaming.StreamingAnomaly
      .bursts(input.toDF().toDF("user_id", "ts")).toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("burst_batches").start()
    // batch 1: ten 1-event hours + one 21-event hour → n=11, s=31, q=451;
    // d = 11·21−31 = 200, d² = 40000 > 9·(11·451−31²) = 36000 ✓ flagged.
    // (The spike inflates its own variance: at 9 baseline hours the test
    // lands exactly ON the integer boundary and strict > rejects — the
    // 3σ bar is genuinely hard to clear with few baseline hours.)
    (0 until 10).foreach(h => input.addData((1L, t(f"2024-01-01 $h%02d:00:00"))))
    (0 until 21).foreach(m => input.addData((1L, t(f"2024-01-01 12:$m%02d:00"))))
    q.processAllAvailable()
    val afterSpike = spark.table("burst_batches")
      .orderBy("seq").collect()
      .map(r => (r.getLong(1), r.getBoolean(3))).toList
    assert(afterSpike.exists { case (_, fl) => fl }, "spike hour must flag")
    // batch 2: eleven more hours at 21 events each — the spike becomes
    // the NEW NORMAL and the flag must clear
    (13 until 24).foreach { h =>
      (0 until 21).foreach(m => input.addData((1L, t(f"2024-01-01 $h%02d:$m%02d:00"))))
    }
    q.processAllAvailable()
    q.stop()
    val last = spark.table("burst_batches")
      .groupBy("user_id", "hr")
      .agg(max_by(col("flagged"), col("seq")).as("fl"))
      .filter(col("fl")).count()
    assert(last === 0L, "baseline shift must clear every flag")
  }

  test("streaming KMV sketch == batch distinct estimate bit-for-bit") {
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      graft.streaming.StreamingSketch.distinctKmv(stream),
      "kmv_stream", OutputMode.Complete)
    val streamed = spark.table("kmv_stream")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.SketchOps.sketchDistinctKmv
      .run(spark, smokeDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming rank sketch == batch quantile estimate bit-for-bit") {
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      graft.streaming.StreamingSketch.quantileRank(stream),
      "qsketch_stream", OutputMode.Complete)
    val streamed = spark.table("qsketch_stream")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val batch = graft.operators.SketchOps.sketchQuantileRank
      .run(spark, smokeDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming funnel stage machine == batch funnel membership") {
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      graft.streaming.StreamingFunnel.stages(stream).toDF(),
      "funnel_stream", OutputMode.Update)
    // update mode emits a row per state change; last row per user wins
    val streamed = spark.table("funnel_stream")
      .groupBy("user_id").agg(max("stage").as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // batch membership: highest stage whose stageTimes frame contains the user
    val stages = graft.operators.AnalyticsOps.stageTimes(
      Tables.events(spark, smokeDir))
    val batch = scala.collection.mutable.Map.empty[Long, Int]
    for ((df, idx) <- stages.zipWithIndex; r <- df.collect())
      batch(r.getLong(0)) = idx + 1
    val streamedReached = streamed.filter(_._2 > 0)
    assert(streamedReached === batch.toMap)
    assert(streamedReached.nonEmpty)
  }

  test("streaming transitions == batch Markov matrix counts") {
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      graft.streaming.StreamingFunnel.transitions(stream).toDF(),
      "trans_stream", OutputMode.Append)
    val streamed = spark.table("trans_stream")
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.AnalyticsOps.transitions(
      Tables.events(spark, smokeDir))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming retention cells == batch cohort matrix") {
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      graft.streaming.StreamingFunnel.retentionCells(stream).toDF(),
      "ret_stream", OutputMode.Append)
    val streamed = spark.table("ret_stream")
      .groupBy("cohort_day", "day_offset").agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.operators.AnalyticsOps.retention(
      Tables.events(spark, smokeDir))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming transitions stitch the sequence across micro-batches") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Long, String, Timestamp, Long)]
    val q = graft.streaming.StreamingFunnel
      .transitions(input.toDF().toDF("user_id", "event_type", "ts", "event_id"))
      .toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("trans_batches").start()
    input.addData((1L, "view", t("2024-01-01 10:00:00"), 1L))
    q.processAllAvailable()
    // batch 2: the cross-batch step view→click must be emitted
    input.addData((1L, "click", t("2024-01-01 11:00:00"), 2L),
      (1L, "purchase", t("2024-01-01 12:00:00"), 3L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans_batches")
      .collect().map(r => (r.getString(0), r.getString(1))).toList.sorted
    assert(got === List(("click", "purchase"), ("view", "click")))
  }

  test("streaming funnel carries stage state across micro-batches") {
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = graft.streaming.StreamingFunnel
      .stages(input.toDF().toDF("user_id", "event_type", "ts")).toDF()
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("funnel_batches").start()
    // batch 1: u1 views; u2 clicks BEFORE ever viewing (must not convert)
    input.addData((1L, "view", t("2024-01-01 10:00:00")),
      (2L, "click", t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // batch 2: u1's click lands AFTER the batch-1 view (state carried);
    // u2 now views — the earlier click stays unconverted
    input.addData((1L, "click", t("2024-01-01 11:00:00")),
      (2L, "view", t("2024-01-01 11:00:00")))
    q.processAllAvailable()
    // batch 3: u1 purchases after the click; u2 purchases without a click
    input.addData((1L, "purchase", t("2024-01-01 12:00:00")),
      (2L, "purchase", t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("funnel_batches")
      .groupBy("user_id").agg(max("stage").as("stage"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(last === Map(1L -> 3, 2L -> 1))
  }

  test("keyed-state last-per-key == batch max_by compaction") {
    val stream = EventStream.readEvents(spark, smokeDir)
    EventStream.runToMemory(
      EventStream.lastPerKey(stream).toDF(), "last_stream", OutputMode.Update)
    // update mode emits one row per state change; final state = last per key
    val streamed = spark.table("last_stream")
      .groupBy("room", "victim")
      .agg(max_by(col("last_value"), col("last_seq")).as("v"),
           max("last_seq").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    val batch = graft.operators.EventOps.gameView(spark, smokeDir)
      .groupBy("room", "victim")
      .agg(max_by(col("value"), col("seq")).as("v"), max("seq").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(streamed === batch)
  }

  test("bounded-state trio holds flat numRowsTotal across batches (state-size accounting)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // (1) lastPerKey: one state row per live (room, victim) key — a fixed
    // key universe re-touched every batch must keep numRowsTotal flat
    def raw(id: Long, user: Long) =
      (id, new java.sql.Timestamp(1700000000000L + id * 1000),
        id.toDouble, "DeathEvent", user, s"""{"k":$id}""")
    val lastIn = MemoryStream[(Long, java.sql.Timestamp, Double, String, Long, String)]
    val lastDf = lastIn.toDF()
      .toDF("event_id", "ts", "value", "event_type", "user_id", "props")
    val lastQ = EventStream.lastPerKey(lastDf).toDF()
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("state_size_last").start()
    (0 until 3).foreach { b =>
      lastIn.addData((1L to 4L).map(u => raw(b * 10 + u, u)): _*)
      lastQ.processAllAvailable()
    }
    val lastHist = EventStream.stateRowsHistory(lastQ)
    lastQ.stop()
    val lastSeries = lastHist.values.flatten.toSeq
    assert(lastHist.nonEmpty && lastSeries.nonEmpty)
    // 4 users → 4 keys from batch 1 on; flat at 4 for every later batch
    // (dropWhile: a no-data startup batch may record 0 before data lands)
    assert(lastSeries.dropWhile(_ == 0L).distinct === Seq(4L),
      s"lastPerKey state must stay one row per key: $lastHist")

    // (2) StreamingTopK: ≤ one ranking state per query — candidate churn
    // (new ids every batch, fixed query set) must not grow state.
    // transformWithState needs the RocksDB provider (column families).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val (topkHist, topkSize) = try {
      val topkIn = MemoryStream[graft.streaming.StreamingTopK.Scored]
      val topkQ = graft.streaming.StreamingTopK.topkPerQuery(topkIn.toDS(), k = 3)
        .toDF().writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("state_size_topk").start()
      (0 until 3).foreach { b =>
        topkIn.addData((0 until 6).map(i =>
          graft.streaming.StreamingTopK.Scored(
            i.toLong % 2, 100L + b * 10 + i, 0.1 * i + 0.01 * b)): _*)
        topkQ.processAllAvailable()
      }
      val h = EventStream.stateRowsHistory(topkQ)
      val s = EventStream.stateSizeByOperator(topkQ)
      topkQ.stop()
      (h, s)
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val topkSeries = topkHist.values.flatten.toSeq
    assert(topkSeries.nonEmpty)
    // 2 queries → state saturates at its per-query bound on batch 1 and
    // stays flat while 18 candidates churn through
    assert(topkSeries.dropWhile(_ == 0L).distinct.size === 1,
      s"topk state must stay bounded per query: $topkHist")
    assert(topkSize.values.forall { case (rows, mem) => rows > 0 && mem > 0 },
      s"latest footprint must report both rows and bytes: $topkSize")

    // (3) StreamingSketch KMV: ≤ k entries per group, stored as one
    // aggregation row per event_type — flat for a fixed type set while
    // distinct users keep growing past k
    val kmvIn = MemoryStream[(Long, java.sql.Timestamp, Double, String, Long, String)]
    val kmvDf = kmvIn.toDF()
      .toDF("event_id", "ts", "value", "event_type", "user_id", "props")
    val kmvQ = graft.streaming.StreamingSketch.distinctKmv(kmvDf)
      .writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("state_size_kmv").start()
    (0 until 3).foreach { b =>
      kmvIn.addData((1L to 40L).map(u =>
        raw(b * 100 + u, b * 1000 + u)): _*)
      kmvQ.processAllAvailable()
    }
    val kmvHist = EventStream.stateRowsHistory(kmvQ)
    kmvQ.stop()
    val kmvSeries = kmvHist.values.flatten.toSeq
    assert(kmvSeries.nonEmpty)
    assert(kmvSeries.dropWhile(_ == 0L).distinct.size === 1,
      s"kmv state must stay one bounded row per group: $kmvHist")
  }

  test("flame timers emit derived UndoExplodeEvent after TTL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    // NOTE: with ProcessingTimeTimeout pending, the default (as-fast-as-
    // possible) trigger runs a hot no-data batch loop and processAllAvailable
    // never stabilizes — pace batches with a real trigger and poll the sink.
    val q = EventStream.flameTimers(input.toDS(), ttlMs = 300)
      .writeStream.outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      .format("memory").queryName("timers").start()
    input.addData("A-b1", "A-b2")
    // duplicate re-arrival WITHIN the TTL: Spark clears a group's pending
    // timeout on any invocation with data, so the suppression branch must
    // re-arm it — without that, b1's undo never fires (regression pin)
    input.addData("A-b1")
    val deadline = System.currentTimeMillis() + 60000
    def undone = spark.table("timers").as[EventStream.DerivedEvent].collect()
      .filter(_.event_type == "UndoExplodeEvent").map(_.bomb_name).toSet
    while (System.currentTimeMillis() < deadline &&
           !Set("A-b1", "A-b2").subsetOf(undone))
      Thread.sleep(250)
    q.stop()
    assert(Set("A-b1", "A-b2").subsetOf(undone),
      s"expected TTL-derived undo events within deadline, got $undone")
    // suppression held: exactly ONE explode per bomb despite the re-arrival
    val explodes = spark.table("timers").as[EventStream.DerivedEvent].collect()
      .filter(_.event_type == "ExplodeEvent").map(_.bomb_name).toList
    assert(explodes.sorted === List("A-b1", "A-b2"))
  }

  test("streaming dropDuplicates removes duplicate event_ids under watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.dedupedEvents(events)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_stream").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData((1L, t0, "click"), (2L, t0, "view"), (1L, t0, "click"))
    q.processAllAvailable()
    input.addData((2L, t0, "view"), (3L, t0, "error")) // dup across batches
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("dropDuplicatesWithinWatermark dedups in-window duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.dedupedWithinWatermark(events)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_wm_stream").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData((1L, t0, "click"), (1L, t0, "click"), (2L, t0, "view"))
    q.processAllAvailable()
    input.addData((2L, t0, "view"), (3L, t0, "error"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_wm_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("effectively-once KV sink: overwrite-by-key parquet store") {
    val kvDir = java.nio.file.Files.createTempDirectory("kv").toString + "/store"
    val ckDir = java.nio.file.Files.createTempDirectory("ck").toString
    val stream = EventStream.readEvents(spark, smokeDir)
    val q = EventStream.kvSink(EventStream.killCounts(stream), kvDir, ckDir)
    q.awaitTermination()
    val store = spark.read.parquet(kvDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(store === batchKillCounts)
  }

  // ---- watermark late-data accounting ------------------------------------
  // the parity tests above replay IN ORDER, so every watermarked op admits
  // everything; these plant rows BEHIND an advanced watermark and assert
  // they are COUNTED (EventStream.lateDrops), not silently lost, while the
  // on-time result stays correct

  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s)

  /** (event_id, ts, value, event_type, user_id, props) — the raw events
    * shape gameColumns consumes. */
  private def rawEvent(id: Long, at: String, user: Long = 1L)
      : (Long, Timestamp, Double, String, Long, String) =
    (id, ts(at), 1.0, "click", user, """{"k": 3}""")

  test("windowed agg: a row behind the watermark is counted as dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double, String, Long, String)]
    val events = input.toDF()
      .toDF("event_id", "ts", "value", "event_type", "user_id", "props")
    val q = EventStream.windowedCounts(events)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_win").start()
    try {
      // on-time 10:00-window rows + a 15:00 row that advances the
      // watermark to 13:00 (event-time max − 2h) after this batch
      input.addData(rawEvent(1, "2024-01-01 10:05:00"),
        rawEvent(2, "2024-01-01 10:20:00"), rawEvent(3, "2024-01-01 15:00:00"))
      q.processAllAvailable()
      // LATE: 10:40 is behind the 13:00 watermark → dropped, counted
      input.addData(rawEvent(4, "2024-01-01 10:40:00"))
      q.processAllAvailable()
      // flush the 15:00 window past the watermark so append emits it
      input.addData(rawEvent(5, "2024-01-01 20:00:00"))
      q.processAllAvailable()
      assert(EventStream.lateDrops(q) === 1L)
      assert(EventStream.lateDropsByOperator(q).keys.exists(_.contains("stateStore")))
    } finally q.stop()
    val counts = spark.table("late_win")
      .collect().map(r => r.get(0).toString -> r.getLong(2)).toMap
    // the late row did NOT sneak into its (already-emitted) 10:00 window
    assert(counts.find(_._1.contains("10:00")).map(_._2) === Some(2L))
  }

  test("dropDuplicatesWithinWatermark: late rows counted, on-time admitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val events = input.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.dedupedWithinWatermark(events)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_dedup").start()
    try {
      // watermark after batch 1: 14:00 − 1h = 13:00
      input.addData((1L, ts("2024-01-01 10:00:00"), "click"),
        (2L, ts("2024-01-01 14:00:00"), "view"))
      q.processAllAvailable()
      // id 3 is behind the watermark → dropped+counted; id 4 is on time
      input.addData((3L, ts("2024-01-01 10:30:00"), "error"),
        (4L, ts("2024-01-01 14:30:00"), "view"))
      q.processAllAvailable()
      assert(EventStream.lateDrops(q) === 1L)
    } finally q.stop()
    val ids = spark.table("late_dedup").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 4L))
  }

  test("stream-stream join: a late error is counted, not silently unpaired") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double, String, Long, String)]
    val events = input.toDF()
      .toDF("event_id", "ts", "value", "event_type", "user_id", "props")
    val q = EventStream.followupJoin(events)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_join").start()
    try {
      // a purchase at 10:00, plus far-future rows on BOTH sides — the
      // global watermark is the MIN across every event-time column, so
      // both t_p and t_e must advance for anything to become late
      input.addData(rawEvent(1, "2024-01-01 10:00:00").copy(_4 = "purchase"),
        rawEvent(2, "2024-01-01 18:00:00").copy(_4 = "purchase"),
        rawEvent(3, "2024-01-01 18:00:00").copy(_4 = "error"))
      q.processAllAvailable()
      // the error that WOULD have paired (10:10, inside the followup
      // window) arrives behind the 16:00 watermark → dropped, counted
      input.addData(rawEvent(4, "2024-01-01 10:10:00").copy(_4 = "error"))
      q.processAllAvailable()
      assert(EventStream.lateDrops(q) >= 1L,
        EventStream.lateDropsByOperator(q).toString)
    } finally q.stop()
    // and the pair is genuinely absent from the on-time result
    assert(spark.table("late_join").isEmpty)
  }
}
