package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup scale smoke: run the full MinHash LSH pipeline (row-local
  * signatures → banding → candidates-only verification) over a SYNTHETIC
  * corpus orders of magnitude bigger than the testbed, with planted
  * near-dups, and report throughput + recall. The corpus is generated
  * distributed (xxhash64 word streams — no driver data), so N scales to
  * whatever the machine holds.
  *
  *   N_DOCS=200000 sbt "runMain graft.tools.DedupScaleSmoke"
  *
  * Every 100th doc is a near-copy of its predecessor (79 of 80 words
  * shared ⇒ shingle Jaccard ≈ 0.95), so expected pairs ≈ N/100 and every
  * planted pair must surface — banding with 4×4 bands catches J ≥ ~0.8
  * with near-certainty.
  */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("N_DOCS", "200000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.ensureRegistered(spark)

    // 80 words/doc from a 5000-word vocabulary; doc i≡99 (mod 100) copies
    // doc i-1's words at positions 1..79 (distinct word at position 0)
    val docs = spark.range(n).repartition(32)
      .select(col("id").as("doc_id"),
        expr(
          """concat_ws(' ', transform(sequence(0, 79), i ->
            |  concat('w', pmod(xxhash64(
            |    CASE WHEN id % 100 = 99 AND i > 0 THEN id - 1 ELSE id END,
            |    i), 5000))))""".stripMargin).as("text"))

    val t0 = System.nanoTime()
    val pairs = graft.operators.DedupOps.minhashPairsOf(docs)
      .select("doc_a", "doc_b").collect()
    val secs = (System.nanoTime() - t0) / 1e9

    val planted = pairs.count { case row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      b == a + 1 && b % 100 == 99
    }
    val expected = n / 100
    println(f"DEDUPSCALE docs=$n%d pairs=${pairs.length}%d " +
      f"planted_found=$planted%d/$expected%d " +
      f"${secs}%.2f s ${n / secs / 1e3}%.1f K docs/s")
    assert(planted >= expected * 95 / 100,
      s"recall too low: $planted of $expected planted pairs found")
    spark.stop()
  }
}
