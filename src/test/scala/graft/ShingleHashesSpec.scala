package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** The native one-call shingle hasher must agree exactly with the HOF chain
  * it replaces (split → filter empties → 3-gram → polyhash → distinct),
  * including edge cases the corpus may not cover.
  */
class ShingleHashesSpec extends SparkSuite {

  private def hofChain = {
    expr("array_distinct(transform(sequence(1, size(t) - 2), " +
      "i -> graft_polyhash(concat_ws(' ', element_at(t, i), " +
      "element_at(t, i + 1), element_at(t, i + 2)))))")
  }

  test("graft_polyhash folds UTF-8 BYTES, pinned on non-ASCII strings") {
    // the oracle dialect (DuckDB reads code points) replays this fold via
    // DuckUtf8's arithmetic byte expansion — this pin is the engine half
    // of that contract: 2-byte (é, ß), 3-byte (CJK), and 4-byte (astral
    // emoji) characters against a plain Scala fold over getBytes("UTF-8")
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 131 + (b & 0xff)) % 2147483647L)
    val samples = Seq("café", "straße", "机器学习", "🎉🎊 party", "𝕏 astral", "mixed é中🎉")
    val got = samples.toDF("s")
      .select(expr("graft_polyhash(s)")).collect().map(_.getLong(0)).toSeq
    assert(got === samples.map(ref))
  }

  test("matches the HOF chain on the document corpus and edge cases") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val edge = Seq(
      "", " ", "a", "a b", "a b c", "a  b   c", " a b c ",
      "a b c d e", "x x x x", "héllo wörld déjà vu", "tab\tis one token b c"
    ).zipWithIndex.map { case (t, i) => (10000L + i, t) }.toDF("doc_id", "text")
    val docs = Tables.documents(spark, smokeDir).select("doc_id", "text")
      .union(edge)

    val viaHof = docs
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => w =!= "").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), hofChain.as("tks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    val viaNative = docs
      .select(col("doc_id"), expr("graft_shingle_hashes(text)").as("tks"))
      .filter(size(col("tks")) > 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    assert(viaNative.keySet === viaHof.keySet)
    viaHof.foreach { case (id, tks) =>
      assert(viaNative(id) === tks, s"doc $id diverges")
    }
    assert(viaNative.nonEmpty)
  }

  test("graft_shingle_rows == explode+distinct of the string HOF chain") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    val edge = Seq("", "a b", "a b c", "a  b   c d", "x x x x x")
      .zipWithIndex.map { case (t, i) => (20000L + i, t) }.toDF("doc_id", "text")
    val docs = Tables.documents(spark, smokeDir).select("doc_id", "text")
      .union(edge)

    val viaHof = docs
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => w =!= "").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 2),
          i => concat_ws(" ",
            element_at(col("t"), i),
            element_at(col("t"), i + 1),
            element_at(col("t"), i + 2)))).as("sh"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val viaGen = docs.selectExpr("doc_id", "graft_shingle_rows(text)")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(viaGen === viaHof)
    assert(viaGen.nonEmpty)
  }

  test("graft_simhash == the 32-aggregate HOF vote it replaces") {
    VectorExpressions.ensureRegistered(spark)
    val tks = Tables.documents(spark, smokeDir)
      .selectExpr("doc_id", "graft_shingle_hashes(text) AS tks")
      .filter(size(col("tks")) > 0)
    val voteCols = (0 until 32).map(j =>
      expr(s"aggregate(tks, CAST(0 AS BIGINT), " +
        s"(acc, t) -> acc + IF(shiftright(t, $j) & 1 = 1, 1, -1))").as(s"s$j"))
    val sh32Hof = (0 until 32)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)
    val viaHof = tks.select(col("doc_id") +: voteCols: _*)
      .select(col("doc_id"), sh32Hof.as("sh32"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaNative = tks.selectExpr("doc_id", "graft_simhash(tks) AS sh32")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaNative === viaHof)
    assert(viaNative.nonEmpty)
  }

  test("graft_simhash(tks, 64) == the 64-aggregate HOF vote, sign bit live") {
    VectorExpressions.ensureRegistered(spark)
    val (a, b) = (VectorExpressions.SimhashSignature.MixA,
      VectorExpressions.SimhashSignature.MixB)
    // the >32-bit path spreads each 31-bit shingle key through the
    // xorshift-multiply finalizer before voting. ANSI SQL rejects the
    // wrapping multiply, so the reference vote is computed in plain Scala
    // long arithmetic over the collected raw arrays.
    def mix(t: Long): Long = {
      var z = t + b
      z = (z ^ (z >>> 30)) * a
      z = (z ^ (z >>> 27)) * a
      z ^ (z >>> 31)
    }
    def vote(ts: Seq[Long]): Long = {
      val votes = new Array[Int](64)
      ts.foreach { t0 =>
        val t = mix(t0)
        (0 until 64).foreach(j =>
          if (((t >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1)
      }
      (0 until 64).foldLeft(0L)((s, j) => if (votes(j) > 0) s | (1L << j) else s)
    }
    val df = Tables.documents(spark, smokeDir)
      .selectExpr("doc_id", "graft_shingle_hashes(text) AS raw")
      .filter(size(col("raw")) > 0)
    val viaScala = df.collect()
      .map(r => r.getLong(0) -> vote(r.getSeq[Long](1))).toMap
    val viaNative = df.selectExpr("doc_id", "graft_simhash(raw, 64) AS sig")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaNative === viaScala)
    // the widened signature must actually use the upper half somewhere
    assert(viaNative.values.exists(s => (s >>> 32) != 0L))
  }

  test("participates in whole-stage codegen (no fallback)") {
    VectorExpressions.ensureRegistered(spark)
    // a local Seq collapses to LocalTableScan (eager interpreted eval);
    // range() forces a real projection stage
    val df = spark.range(4)
      .selectExpr("concat('a b c d', id) AS text")
      .selectExpr("graft_shingle_hashes(text) AS tks")
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd stages render with the `*(n)` prefix
    assert(plan.contains("*(1) Project"), s"expected codegen'd Project in:\n$plan")
    assert(df.collect().forall(_.getSeq[Long](0).nonEmpty))
  }

  test("graft_window_hashes == the polyhash-of-array_join HOF chain") {
    VectorExpressions.ensureRegistered(spark)
    import spark.implicits._
    // widths 1, 3 and 20 (the substring family's), corpus + edge cases:
    // multi-space runs, exact-width docs, one-under-width docs, repeats
    val edge = Seq(
      "", " ", "a", "a b c", "a  b   c  d e", " lead trail ",
      ((1 to 20).map(i => s"w$i").mkString(" ")),
      ((1 to 19).map(i => s"w$i").mkString(" ")),
      "x x x x x x x x x x x x x x x x x x x x x x",
      "héllo wörld déjà vu ñ ü ö ß µ § ¶ † ‡ ° ™ © ® ¿ ¡ ¢ £"
    ).zipWithIndex.map { case (t, i) => (30000L + i, t) }.toDF("doc_id", "text")
    val docs = Tables.documents(spark, smokeDir).select("doc_id", "text")
      .union(edge)
    Seq(1, 3, 20).foreach { w =>
      val viaHof = docs
        .select(col("doc_id"),
          filter(split(col("text"), " "), x => x =!= "").as("t"))
        .filter(size(col("t")) >= w)
        .select(col("doc_id"), expr(
          s"transform(sequence(1, size(t) - ${w - 1}), " +
            s"j -> graft_polyhash(array_join(slice(t, j, $w), ' ')))").as("wh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val viaNative = docs
        .select(col("doc_id"), expr(s"graft_window_hashes(text, $w)").as("wh"))
        .filter(size(col("wh")) > 0)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(viaNative.keySet === viaHof.keySet, s"width $w row sets differ")
      viaHof.foreach { case (id, whs) =>
        assert(viaNative(id) === whs, s"width $w doc $id diverges")
      }
      assert(viaNative.nonEmpty)
    }
  }
}
