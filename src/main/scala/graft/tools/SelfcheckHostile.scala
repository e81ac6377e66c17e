package graft.tools

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** The standing hostile-corpus gate (round 12; promoted from round 11's
  * one-off probes, which found three latent bug families the ASCII/clean
  * testbed could never show: UTF-8-bytes-vs-code-points in the text
  * oracles, Java-vs-RE2 control-character regex semantics, and
  * degenerate-embedding NULL/nan divergence). This tool writes a FULL
  * testbed directory whose `documents` and `embeddings` tables are
  * purpose-built hostile — non-ASCII scripts (German/French/Chinese),
  * astral-plane code points (surrogate pairs), control characters
  * (CR/VT/NEL/LS/TAB), empty and single-token texts, exact and near
  * duplicates, long repetitive spans, PII shapes, NULL text and NULL
  * lang/source rows, zero-norm / null-element / whole-vector-NULL /
  * near-duplicate / tiny-norm / large-magnitude vectors — and (round 12)
  * an `events` table carrying the source rows plus a hostile tail
  * (null/malformed/regex-vs-JSON-ambiguous props, null/empty/non-ASCII
  * event types, null/negative/Long.MaxValue user ids, null/epoch/
  * pre-epoch/far-future timestamps, identical-timestamp runs, null/−0.0/
  * extreme values) — while the seven TPC-H-only tables are byte-copies of
  * the smoke testbed, so the ENTIRE query registry runs against it
  * through the ordinary gate:
  *
  *   sbt "runMain graft.tools.SelfcheckHostile /tmp/graft_hostile/data"
  *   sbt "runMain graft.Verify /tmp/graft_hostile/data /tmp/graft_hostile/out"
  *   python3 scripts/selfcheck.py /tmp/graft_hostile/data /tmp/graft_hostile/out
  *
  * Expected: every registered query PASSES (N/N). Any FAIL is an engine/oracle divergence the
  * standard corpus masks — exactly the class of bug this gate exists to
  * catch each round.
  */
object SelfcheckHostile {

  /** Source testbed whose non-document tables are copied verbatim. */
  val SourceDir = "/root/testdata/sf0.001"

  private val CopiedTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem")

  // ---- hostile documents ---------------------------------------------------

  final case class Doc(doc_id: Long, text: String, lang: String,
                       source: String, n_chars: Long)

  private def doc(id: Long, text: String, lang: String, source: String): Doc =
    // n_chars = CODE POINTS (both engines' length()), not UTF-16 units —
    // the astral rows exist precisely to catch a utf16-units writer
    Doc(id, text, lang, source, text.codePointCount(0, text.length).toLong)

  private[tools] def hostileDocs: Seq[Doc] = {
    val ascii1 = "the quick brown fox jumps over the lazy dog near the river bank"
    val ascii2 = "pack my box with five dozen liquor jugs before the long winter"
    val spam = Seq.fill(80)("spam").mkString(" ")
    val repeatRun = "abc abc abc " * 30
    Seq(
      doc(0, ascii1, "en", "src0"),
      doc(1, ascii1, "en", "src1"), // exact dup of 0, different source
      doc(2, ascii1 + " today", "en", "src2"), // near dup of 0
      doc(3, ascii2, "en", "src3"),
      doc(4, "Größenwahn überall: die Bäume blühen früh — ein schönes Gefühl für März",
        "de", "src4"),
      doc(5, "l'été dernier, à Noël, ça coûtait déjà très cher près de chez François",
        "fr", "src5"),
      doc(6, "数据处理引擎需要正确处理多字节字符 否则散列就会发散 这是一个测试文档",
        "zh", "src6"),
      doc(7, "mixed ascii with émojis 😀😀 and music 𝄞 plus math 𝒜𝒷𝒸 inside one line",
        "en", "src7"),
      doc(8, "line one\r\nline two\u000Bvertical\u0085nel\u2028ls\tend", "en", "src8"),
      doc(9, "", "en", "src9"), // empty text
      doc(10, "single", "en", "src0"),
      doc(11, spam, "en", "src1"), // maximal repetition
      doc(12, repeatRun.trim, "en", "src2"), // periodic run for substring ops
      doc(13, "contact john.doe@example.com or call 555-123-4567 for details now",
        "en", "src3"),
      doc(14, "Üppige ölige Äpfel — ähnlich übel wie ößige Prüfung Straße",
        "de", "src4"),
      doc(15, ascii2, "en", "src5"), // exact dup of 3
      doc(16, ascii2.replace("winter", "summer"), "en", "src6"), // near dup of 3
      doc(17, "ça va? ÇA VA! Casing across accents: É é È è Ü ü ß", "fr", "src7"),
      doc(18, "𠀀𠀁𠀂 astral-only CJK extension block text 𠀃𠀄", "zh", "src8"),
      doc(19, "tabs\tand\tmore\ttabs\tbetween\tevery\tword\there", "en", "src9"),
      doc(20, "a b c d e f g h i j k l m n o p q r s t u v w x y z", "en", "src0"),
      doc(21, "'quotes' \"double\" `back` and $dollar %percent &amp; <tag>", "en", "src1"),
      doc(22, ("z" * 300) + " " + ("y" * 200), "en", "src2"), // giant tokens
      doc(23, "Der schnelle braune Fuchs springt über den faulen Hund am Fluss",
        "de", "src3"),
      doc(24, "le renard brun rapide saute par dessus le chien paresseux du fleuve",
        "fr", "src4"),
      doc(25, ascii1.split(" ").reverse.mkString(" "), "en", "src5"), // anagram doc
      // null rows (standing since round 12): the null-text probe found
      // three divergence families the non-null corpus masked — multimodal
      // ingest NPE'd on a null payload, and the fingerprint/BPE oracles
      // folded NULL to 0 where the native kernels null-propagate
      Doc(26, null, "en", "src6", 0L), // null text
      Doc(27, "null lang and source", null, null, 20L), // null lang+source
      // case-mapping probes: code points whose lower() disagrees between
      // naive per-char folds and full Unicode case mapping (Turkish
      // dotted İ lowers to i+combining-dot in Java, ẞ to ß, final sigma
      // stays ς, the ﬁ ligature has no single-char lower)
      doc(28, "İstanbul ve ısparta: DİYARBAKIR IĞDIR kayık", "tr", "src7"),
      doc(29, "GROẞE STRAẞE und die ﬁnale Σίσυφος ΟΔΥΣΣΕΥΣ ς σ", "de", "src8"),
      // ~8 KB document (an order of magnitude above every other row):
      // stresses the per-doc loops without blowing up the GATE itself —
      // a 100 KB probe ran the ENGINE in normal time (1m50s for all 182)
      // but the oracle side's DuckUtf8 byte-expansion folds took >10 min,
      // so the standing row stays at the largest size the DuckDB replay
      // handles in seconds (per-doc asymptotics beyond this are covered
      // by the scale smokes with planted exactness, not the oracle gate)
      doc(30, {
        val rnd = new scala.util.Random(42)
        val words = Array("alpha", "beta", "gamma", "delta", "epsilon",
          "zeta", "eta", "theta", "iota", "kappa", "la\u00efc", "m\u00fcde")
        Seq.fill(1300)(words(rnd.nextInt(words.length))).mkString(" ")
      }, "en", "src9")
    )
  }

  // ---- hostile embeddings --------------------------------------------------

  final case class Vec(vec_id: Long, embedding: Array[java.lang.Float], label: Int)

  private def mk(id: Long, f: Int => Float, label: Int): Vec =
    Vec(id, Array.tabulate(64)(j => java.lang.Float.valueOf(f(j))), label)

  private[tools] def hostileVecs: Seq[Vec] = {
    def base(i: Long)(j: Int): Float =
      (((i * 31 + j * 7) % 13).toInt - 6) / 3.0f
    val normals = (0L until 30L).map(i => mk(i, base(i), (i % 10).toInt))
    val nullElem = {
      val a = Array.tabulate(64)(j => java.lang.Float.valueOf(base(31L)(j)))
      a(17) = null // one null element: excluded identically by both engines
      Vec(31L, a, 1)
    }
    normals ++ Seq(
      mk(30L, _ => 0.0f, 0), // zero norm: excluded from cosine everywhere
      nullElem,
      mk(32L, base(32L), 2),
      mk(33L, j => base(32L)(j) * 1.0001f, 3), // near-dup of 32 (cos ≈ 1)
      mk(34L, j => -base(32L)(j), 4), // opposite of 32 (cos = −1)
      mk(35L, _ => 1e-8f, 5), // tiny but nonzero norm
      // large magnitude, but inside the IVF quantizer's documented
      // exactness domain (|x| ≲ 15: the composite argmin must stay under
      // 2^53 in doubles — see KMeansOps object doc). Probing BEYOND it
      // is what established the bound: ±10³ flips a double-vs-integer
      // argmin, ±10⁶ overflows BIGINT with an ANSI CAST_OVERFLOW throw.
      mk(36L, j => if (j % 2 == 0) 10f else -10f, 6),
      Vec(37L, null, 7), // whole-vector NULL: excluded like zero-norm rows
      // wrong-length and empty vectors, standing: re-ingest/corruption
      // shapes — excluded by the declared-dimension gate on both engines
      // (a 32-dim row once crashed the Lloyd iteration and shifted three
      // ANN row sets: the kernel walks the shorter array where DuckDB
      // null-pads the longer)
      Vec(38L, Array.tabulate(32)(j => java.lang.Float.valueOf(base(38L)(j))), 8),
      Vec(39L, Array.empty[java.lang.Float], 9),
      // one NaN element: nrm becomes NaN — which BOTH engines evaluate
      // as > 0 (NaN-sorts-greatest extends to comparisons), so this row
      // sailed past the old bare nrm > 0 filter and crashed the
      // quantizer/Lloyd kernels; the explicit isnan guard in
      // normalizedVecs (and its oracle twin) is what excludes it
      Vec(40L, {
        val a = Array.tabulate(64)(j => java.lang.Float.valueOf(base(40L)(j)))
        a(5) = java.lang.Float.valueOf(Float.NaN); a
      }, 0)
    )
  }

  // ---- hostile events ------------------------------------------------------

  /** One events row; boxed field types so any column can be NULL. */
  final case class Ev(event_id: java.lang.Long, ts: java.sql.Timestamp,
                      user_id: java.lang.Long, event_type: String,
                      value: java.lang.Double, props: String)

  private def t(iso: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  /** Appended to the source events (ids 2000+, far above the source's
    * 0..999): every field takes a turn being null, malformed, extreme, or
    * ambiguous — the shapes a 100 TB production log is guaranteed to
    * contain. Most rows are normal except for ONE hostile field, so they
    * flow deep into the per-room/per-user pipelines instead of dying at
    * the first projection.
    */
  private[tools] def hostileEventRows: Seq[Ev] = {
    def ts(off: Int) = t(f"2024-01-20T00:00:${off}%02dZ")
    val tdup = t("2024-01-21T12:00:00Z")
    Seq(
      // --- props: missing / malformed / mismatched payloads
      Ev(2000L, ts(0), 3L, "error", 10.0, null), // null props
      Ev(2001L, ts(1), 3L, "error", 10.0, "{}"), // no k key
      Ev(2002L, ts(2), 4L, "error", 10.0, "{\"j\": 5}"), // wrong key
      // no space after the colon: JSON parsers extract 95, the generator-
      // shaped regex '"k": (\d+)' does not — k > 90 so any json-vs-regex
      // disagreement between a query and its oracle becomes visible
      Ev(2003L, ts(3), 5L, "error", 10.0, "{\"k\":95}"),
      Ev(2004L, ts(4), 6L, "error", 10.0,
        "{\"k\": 999999999999999999999}"), // digits overflow BIGINT
      // invalid JSON that still MATCHES the regex: json path → NULL,
      // regex path → 96
      Ev(2005L, ts(5), 7L, "purchase", 10.0, "not json \"k\": 96 {{{"),
      Ev(2006L, ts(6), 8L, "error", 10.0, ""), // empty props
      // --- event_type: null / empty / case / non-ASCII
      Ev(2007L, ts(7), 9L, null, 10.0, "{\"k\": 3}"),
      Ev(2008L, ts(8), 10L, "", 5.0, "{\"k\": 4}"),
      Ev(2009L, ts(9), 11L, "ERROR", 5.0, "{\"k\": 5}"),
      Ev(2010L, ts(10), 12L, "café-購入", 5.0, "{\"k\": 6}"),
      // --- user_id: null / negative / extreme
      Ev(2011L, ts(11), null, "error", 5.0, "{\"k\": 7}"),
      Ev(2012L, ts(12), -5L, "error", 5.0, "{\"k\": 8}"),
      Ev(2013L, ts(13), Long.MaxValue, "error", 5.0, "{\"k\": 9}"),
      // --- ts: null / epoch / pre-epoch fractional / far future
      Ev(2014L, null, 13L, "error", 5.0, "{\"k\": 10}"),
      Ev(2015L, t("1970-01-01T00:00:00Z"), 14L, "signup", 5.0, "{\"k\": 11}"),
      Ev(2016L, t("1969-12-31T23:59:59.500Z"), 15L, "signup", 5.0, "{\"k\": 12}"),
      Ev(2017L, t("2260-01-01T00:00:00Z"), 16L, "signup", 5.0, "{\"k\": 13}"),
      // --- identical ts, one user: any per-user window ordered by ts
      // alone is nondeterministic here (a real log ALWAYS has collisions)
      Ev(2018L, tdup, 17L, "click", 1.0, "{\"k\": 14}"),
      Ev(2019L, tdup, 17L, "click", 2.0, "{\"k\": 14}"),
      Ev(2020L, tdup, 17L, "click", 3.0, "{\"k\": 14}"),
      // --- value: null / negative zero / huge / negative / rounding edge
      Ev(2021L, ts(21), 18L, "purchase", null, "{\"k\": 15}"),
      Ev(2022L, ts(22), 19L, "purchase", -0.0, "{\"k\": 16}"),
      // large but inside the documented money domain (AnalyticsOps
      // trendMoments: |value| ≲ 10¹¹ keeps the x·y moment in BIGINT for
      // the testbed's ts span; probing 10¹⁵ is what established that
      // bound — Σxy overflows long while DuckDB silently widens to
      // HUGEINT, the same double-vs-integer domain story as the IVF ±10³
      // probe)
      Ev(2023L, ts(23), 20L, "purchase", 1.0e9, "{\"k\": 17}"),
      Ev(2024L, ts(24), 21L, "purchase", -123.456, "{\"k\": 18}"),
      Ev(2025L, ts(25), 22L, "purchase", 0.005, "{\"k\": 19}"),
      // non-finite doubles (standing): one NaN once crashed 6 Spark
      // queries with ANSI overflow and 8 DuckDB oracles with conversion
      // errors — ValueE2 is TRY_CAST-tolerant since, with dq_value_domain
      // as the paired monitor
      Ev(2026L, ts(26), 23L, "purchase", Double.NaN, "{\"k\": 20}"),
      Ev(2027L, ts(27), 24L, "purchase", Double.PositiveInfinity, "{\"k\": 21}"),
      // an exact duplicate delivery (at-least-once replay shape): same
      // event_id, same everything — batch queries must count it twice
      // IDENTICALLY on both engines (streaming dedup is the dedicated
      // exactly-once operator; the batch surface does not silently dedup)
      Ev(2028L, ts(28), 25L, "click", 7.5, "{\"k\": 22}"),
      Ev(2028L, ts(28), 25L, "click", 7.5, "{\"k\": 22}"),
      // typed-payload shapes: a quoted k (JSON string, regex no-match), a
      // negative k (JSON −3; the \d+ regex sees only "3"), a float k
      // (JSON "8.5" TRY_CASTs to NULL on both engines; the regex stops at
      // the dot and reads 8) — each family must track ITS OWN parse rule
      // and its oracle twin, not the other family's
      Ev(2029L, ts(29), 26L, "error", 2.0, "{\"k\": \"87\"}"),
      Ev(2030L, ts(30), 27L, "error", 2.0, "{\"k\": -3}"),
      Ev(2031L, ts(31), 28L, "error", 2.0, "{\"k\": 8.5}")
    )
  }

  // ---- writing -------------------------------------------------------------

  /** Write `df` as ONE plain parquet FILE at `target` (DuckDB's view
    * registration reads a file path, not a Spark part-file directory). */
  private def writeSingleFile(spark: SparkSession,
                              df: org.apache.spark.sql.DataFrame,
                              target: Path): Unit = {
    val tmp = target.getParent.resolve(target.getFileName.toString + ".staging")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(p =>
      p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    // drop the staging dir remnants
    Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
  }

  def writeDataset(spark: SparkSession, dataDir: String): Unit = {
    import spark.implicits._
    val dir = Paths.get(dataDir)
    Files.createDirectories(dir)
    for (t <- CopiedTables)
      Files.copy(Paths.get(SourceDir, s"$t.parquet"),
        dir.resolve(s"$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    // events = source rows (ts normalized to µs by Tables.events) plus the
    // hostile tail — the whole event/game/analytics family runs over them
    writeSingleFile(spark,
      graft.Tables.events(spark, SourceDir)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .unionByName(hostileEventRows.toDF()
          .select("event_id", "ts", "user_id", "event_type", "value", "props")),
      dir.resolve("events.parquet"))
    writeSingleFile(spark, hostileDocs.toDF(),
      dir.resolve("documents.parquet"))
    writeSingleFile(spark,
      hostileVecs.toDF("vec_id", "embedding", "label")
        .selectExpr("vec_id", "CAST(embedding AS array<float>) AS embedding",
          "CAST(label AS int) AS label"),
      dir.resolve("embeddings.parquet"))
  }

  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/tmp/graft_hostile/data")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    writeDataset(spark, dataDir)
    println(s"[hostile] dataset written to $dataDir " +
      s"(${hostileDocs.size} docs, ${hostileVecs.size} vectors); next:")
    println(s"[hostile]   sbt 'runMain graft.Verify $dataDir <outDir>'")
    println(s"[hostile]   python3 scripts/selfcheck.py $dataDir <outDir>")
    spark.stop()
  }
}
