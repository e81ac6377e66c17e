package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup scale smoke: run the full MinHash LSH pipeline (row-local
  * signatures → banding → hot-bucket cap → candidates-only verification)
  * over a SYNTHETIC corpus orders of magnitude bigger than the testbed,
  * with planted near-dups AND a planted boilerplate cluster, and report
  * throughput + recall. The corpus is generated distributed (xxhash64 word
  * streams — no driver data), so N scales to whatever the machine holds.
  *
  *   N_DOCS=200000 N_BOILER=10000 sbt "runMain graft.tools.DedupScaleSmoke"
  *
  * Every 100th doc is a near-copy of its predecessor (79 of 80 words
  * shared ⇒ shingle Jaccard ≈ 0.95), so expected pairs ≈ N/100 and every
  * planted pair must surface — banding with 4×4 bands catches J ≥ ~0.8
  * with near-certainty.
  *
  * The boilerplate cluster is N_BOILER IDENTICAL docs (disjoint 'z'
  * vocabulary): all of them share one (band, signature) bucket per band,
  * so WITHOUT the DedupOps.LshBucketCap guard the band self-join would
  * emit NumBands·N_BOILER²/2 candidate pairs (2×10⁸ at the default —
  * hours on one reducer, the 100 TB boilerplate blowup in miniature);
  * WITH the cap the hot buckets drop before the join and runtime stays
  * linear in the corpus size. The smoke asserts both effects: planted
  * recall on the normal corpus is unharmed, and no boilerplate pair
  * survives (identical docs are the exact-dedup stage's job).
  */
object DedupScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("N_DOCS", "200000").toLong
    val nb = sys.env.getOrElse("N_BOILER", "10000").toLong
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
    // the boilerplate cluster: nb byte-identical docs, ids n..n+nb-1, on a
    // vocabulary ('z…') disjoint from the normal corpus so every candidate
    // it could generate is boilerplate×boilerplate
    val boiler = spark.range(nb).repartition(32)
      .select((col("id") + n).as("doc_id"),
        lit((0 until 80).map(i => s"z$i").mkString(" ")).as("text"))

    val t0 = System.nanoTime()
    val pairs = graft.operators.DedupOps.minhashPairsOf(docs.union(boiler))
      .select("doc_a", "doc_b").collect()
    val secs = (System.nanoTime() - t0) / 1e9

    val planted = pairs.count { case row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      b == a + 1 && b % 100 == 99
    }
    val boilerPairs =
      pairs.count(r => r.getLong(0) >= n || r.getLong(1) >= n)
    val expected = n / 100
    val total = n + nb
    println(f"DEDUPSCALE docs=$n%d boiler=$nb%d pairs=${pairs.length}%d " +
      f"planted_found=$planted%d/$expected%d boiler_pairs=$boilerPairs%d " +
      f"${secs}%.2f s ${total / secs / 1e3}%.1f K docs/s")
    assert(planted >= expected * 95 / 100,
      s"recall too low: $planted of $expected planted pairs found")
    assert(boilerPairs == 0,
      s"bucket cap failed: $boilerPairs boilerplate pairs survived the " +
        "hot-bucket drop (expected 0 — the cluster exceeds LshBucketCap)")
    spark.stop()
  }
}
