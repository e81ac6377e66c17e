package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper

/** Cross-round bench diff, mechanized (judge r18, next-round item 2):
  * every round's verdict so far hand-rolled the per-query r{n-1}→r{n}
  * comparison. This tool reads two BENCH_DETAIL_r{n}.json files,
  * compares their NORMALIZED warm maps (each sample is already scaled
  * by its own pass's calibration, so machine-day speed differences are
  * out of the comparison by construction), lists every mover beyond the
  * threshold with its plan-shape ceiling from PLANS.md's appendix as
  * cross-reference (a real plan regression moves the exchange count; a
  * contention mover doesn't), and writes a one-table markdown report.
  *
  *   sbt "runMain graft.tools.BenchDiff"                       # two newest
  *   sbt "runMain graft.tools.BenchDiff BENCH_DETAIL_r17.json BENCH_DETAIL_r18.json"
  *
  * Output: BENCH_DIFF_r{a}_r{b}.md (committed at round close so the
  * judge reads the diff instead of recomputing it) + the same table on
  * stdout. Movers are classified: `small-abs` when both sides are under
  * [[SmallAbsSec]] (the class the r18 review measured as pure machine
  * noise — every >1.4× mover was ≤0.73 s absolute), `plan?` when the
  * query's PLANS.md exchange row exists for manual cross-check, and
  * `new`/`gone` for registry membership changes.
  */
object BenchDiff {

  /** Movers below this ratio are uninteresting. */
  val RatioThreshold = 1.5

  /** Both-sides-under this ⇒ the mover is machine-noise class, flagged
    * rather than hidden (no silent caps). */
  val SmallAbsSec = 0.25

  private final case class Detail(file: String, round: Int, mapUsed: String,
      warmNorm: Map[String, Option[Double]],
      headlineNorm: Double, totalAllNorm: Double, calibMin: Double)

  private def parse(path: String): Detail = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    // pre-r18 details carry only the raw warm map; the diff still runs,
    // stamped with which map each side used (a raw-vs-norm comparison is
    // meaningful only to the extent the two machine-days matched — the
    // report says so instead of refusing)
    val mapUsed =
      if (root.has("queries_warm_norm")) "queries_warm_norm"
      else if (root.has("queries_warm")) "queries_warm"
      else sys.error(s"$path has no queries_warm[_norm] map — not a " +
        "BENCH_DETAIL file")
    val m = scala.collection.mutable.Map.empty[String, Option[Double]]
    root.get(mapUsed).fields().forEachRemaining { e =>
      m(e.getKey) =
        if (e.getValue.isNull) None else Some(e.getValue.asDouble())
    }
    val round = "r(\\d+)".r.findFirstMatchIn(new java.io.File(path).getName)
      .map(_.group(1).toInt).getOrElse(0)
    val calib = root.path("passes")
    val calibMin = Seq("warm1", "warm2")
      .map(p => calib.path(p).path("calibration_sec").asDouble(Double.NaN))
      .filterNot(_.isNaN) match { case Nil => Double.NaN; case xs => xs.min }
    def tot(norm: String, raw: String): Double = {
      val v = root.path(norm).asDouble(Double.NaN)
      if (v.isNaN) root.path(raw).asDouble(Double.NaN) else v
    }
    Detail(path, round, mapUsed, m.toMap,
      tot("headline_norm_sec", "headline_sec"),
      tot("total_all_norm_sec", "value"), calibMin)
  }

  /** query -> exchange/nested-loop counts from PLANS.md's appendix table
    * (`| query | exchanges | bhj | smj | nested-loop | codegen stages |`);
    * empty map when the file or table is absent — the diff still runs. */
  private def planShapes(): Map[String, (Int, Int)] =
    try {
      val src = scala.io.Source.fromFile("PLANS.md", "UTF-8")
      try {
        val row = "^\\|\\s*([a-z0-9_]+)\\s*\\|\\s*(\\d+)\\s*\\|\\s*\\d+\\s*\\|\\s*\\d+\\s*\\|\\s*(\\d+)\\s*\\|".r
        src.getLines().flatMap(l => row.findFirstMatchIn(l)
          .map(m => m.group(1) -> ((m.group(2).toInt, m.group(3).toInt))))
          .toMap
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  def main(args: Array[String]): Unit = {
    val (oldPath, newPath) = args.toSeq match {
      case Seq(a, b) => (a, b)
      case Seq() =>
        val details = Option(new java.io.File(".").listFiles()).toSeq.flatten
          .filter(_.getName.matches("BENCH_DETAIL_r\\d+\\.json"))
          .sortBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt)
        require(details.size >= 2,
          s"need two BENCH_DETAIL_r*.json in cwd, found ${details.size}")
        (details(details.size - 2).getName, details.last.getName)
      case other => sys.error(
        s"usage: BenchDiff [old.json new.json]; got ${other.size} args")
    }
    val o = parse(oldPath)
    val n = parse(newPath)
    val shapes = planShapes()

    val names = (o.warmNorm.keySet ++ n.warmNorm.keySet).toSeq.sorted
    final case class Mover(q: String, oldS: Option[Double],
        newS: Option[Double], ratio: Option[Double], tags: Seq[String])
    val movers = names.flatMap { q =>
      val ov = o.warmNorm.get(q).flatten
      val nv = n.warmNorm.get(q).flatten
      (ov, nv) match {
        case (Some(a), Some(b)) if a > 0 =>
          val r = b / a
          if (r >= RatioThreshold || r <= 1.0 / RatioThreshold) {
            val tags = Seq.newBuilder[String]
            if (math.max(a, b) < SmallAbsSec) tags += "small-abs"
            shapes.get(q).foreach { case (ex, nl) =>
              tags += s"plan-pin ex=$ex nl=$nl" }
            Some(Mover(q, ov, nv, Some(r), tags.result()))
          } else None
        case (None, Some(_)) => Some(Mover(q, None, nv, None, Seq("new")))
        case (Some(_), None) => Some(Mover(q, ov, None, None, Seq("gone")))
        case _ => None
      }
    }.sortBy(m => -m.ratio.getOrElse(Double.MaxValue))

    def f(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def fOpt(v: Option[Double]): String = v.map(f).getOrElse("—")
    val sb = new StringBuilder
    sb ++= s"# Bench diff: r${o.round} → r${n.round} (normalized warm)\n\n"
    sb ++= s"- old: `${o.file}` (map: ${o.mapUsed}, warm calib min ${f(o.calibMin)} s)\n"
    sb ++= s"- new: `${n.file}` (map: ${n.mapUsed}, warm calib min ${f(n.calibMin)} s)\n"
    if (o.mapUsed != n.mapUsed)
      sb ++= "- NOTE: the two sides use different maps (one side predates " +
        "normalization) — ratios carry the machine-day difference.\n"
    sb ++= s"- headline_norm: ${f(o.headlineNorm)} s → ${f(n.headlineNorm)} s " +
      s"(${f(n.headlineNorm / o.headlineNorm)}×)\n"
    sb ++= s"- total_all_norm: ${f(o.totalAllNorm)} s → ${f(n.totalAllNorm)} s " +
      s"(${f(n.totalAllNorm / o.totalAllNorm)}×)\n"
    val ratios = names.flatMap(q =>
      for { a <- o.warmNorm.get(q).flatten; b <- n.warmNorm.get(q).flatten
            if a > 0 } yield b / a).sorted
    if (ratios.nonEmpty)
      sb ++= s"- per-query ratio median ${f(ratios(ratios.size / 2))}, " +
        s"n=${ratios.size}, >${RatioThreshold}×: " +
        s"${ratios.count(_ >= RatioThreshold)}, " +
        s"<${f(1 / RatioThreshold)}×: ${ratios.count(_ <= 1 / RatioThreshold)}\n"
    sb ++= s"\nMovers beyond ${RatioThreshold}× (either direction):\n\n"
    if (movers.isEmpty) sb ++= "(none)\n"
    else {
      sb ++= "| query | old s | new s | ratio | notes |\n"
      sb ++= "|---|---|---|---|---|\n"
      movers.foreach { m =>
        sb ++= s"| ${m.q} | ${fOpt(m.oldS)} | ${fOpt(m.newS)} | " +
          s"${m.ratio.map(f).getOrElse("—")} | ${m.tags.mkString(", ")} |\n"
      }
      sb ++= "\n`small-abs` = both sides under " + f(SmallAbsSec) +
        " s — the machine-noise class; `plan-pin` = the query's " +
        "PLANS.md exchange/nested-loop counts for cross-checking " +
        "whether the plan itself moved (PlanInventorySpec enforces " +
        "these as ceilings in `sbt test`).\n"
    }
    val report = sb.result()
    val out = s"BENCH_DIFF_r${o.round}_r${n.round}.md"
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.print(report) finally w.close()
    print(report)
    println(s"\n[benchdiff] wrote $out")
  }
}
