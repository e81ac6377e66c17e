package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE runtime re-planning on skew: the engine's answer to hot keys is
  * salting where the key is known (agg_salted_skew) and AQE skew-join
  * splitting where it is not — this pins the latter actually firing.
  */
class AqeSkewSpec extends SparkSuite {

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the testbed-sized partitions register as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force SMJ
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // left: 200k rows, 95% on one key + padding that must SURVIVE the
      // shuffle (referenced downstream — else pruning empties the hot
      // partition) so it is big in BYTES; right: uniform small. The
      // downstream agg is GLOBAL: a groupBy(k) would require hash
      // distribution on k, which forbids splitting skewed partitions.
      val left = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 1000).as("k"),
          concat(lit("x" * 64), col("id")).as("pad"))
      val right = spark.range(1000).select(col("id").as("k"), lit(1L).as("v"))
      val joined = left.join(right, "k")
        .agg(sum(length(col("pad"))).as("bytes"))
      joined.collect() // execute so AQE finalizes the plan
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$finalPlan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  /** Corpus with one mega-bigram (95% of all bigram occurrences) plus a
    * unique tail — the planted hot key for the LM-join skew cases.
    */
  private def megaCorpus = {
    val mega = "megabigramword" * 4
    spark.range(30000)
      .select(col("id").as("doc_id"),
        when(col("id") % 20 =!= 0, lit(s"$mega $mega $mega"))
          .otherwise(concat(lit("u"), col("id"), lit("a u"), col("id"),
            lit("b"))).as("text"))
  }

  test("discovery: AQE cannot skew-split the aggregate-fed LM join") {
    import graft.operators.TextOps
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // the LM aggregate is tiny at test scale and would broadcast,
      // hiding the path the 100 TB co-keyed join takes — force SMJ
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the PRE-separation join shape (probe JOIN aggregated-LM): the
      // model side's final aggregate fuses between its shuffle stage and
      // the join sort, so OptimizeSkewedJoin's Sort-over-ShuffleStage
      // pattern cannot match — even with every skew threshold forced
      // tiny and a 95%-hot key planted. This is WHY bigramLogfreqOf does
      // hot-key separation instead of trusting AQE.
      val t = megaCorpus.select(col("doc_id"),
        filter(split(col("text"), " "), w => w =!= "").as("t"))
        .filter(size(col("t")) >= 2)
      val bi = t.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1),
          i => concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1)))).as("bigram"))
      val naive = bi.join(bi.groupBy("bigram").agg(count(lit(1)).as("n")),
        Seq("bigram"))
        .groupBy("doc_id").agg(sum("n").as("s"))
      naive.collect()
      val finalPlan = naive.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("SortMergeJoin"), "shape must be an SMJ")
      assert(!finalPlan.contains("skew=true"),
        "AQE learned to split aggregate-fed joins — revisit the hot-key " +
          s"separation in bigramLogfreqOf:\n$finalPlan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("hot-key separation keeps the mega-bigram out of the LM join") {
    import graft.operators.TextOps
    val out = TextOps.bigramLogfreqOf(megaCorpus)
    // the hot path engaged: hot/tail Union with the count literal baked
    // into the map lookup ("element_at" alone would be ambiguous — the
    // bigram construction lambda uses it on both paths)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("Union"), s"hot/tail split missing from plan:\n$plan")
    assert(plan.contains("57000"),
      "the mega-bigram's count must ride in the literal map")
    // result parity with the naive single-join pipeline (no separation)
    val t = megaCorpus.select(col("doc_id"),
      filter(split(col("text"), " "), w => w =!= "").as("t"))
      .filter(size(col("t")) >= 2)
    val bi = t.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => concat_ws(" ", element_at(col("t"), i),
          element_at(col("t"), i + 1)))).as("bigram"))
    val naive = bi.join(bi.groupBy("bigram").agg(count(lit(1)).as("n")),
        Seq("bigram"))
      .select(col("doc_id"),
        (length(bin(col("n"))) - 1).cast("long").as("r"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("r")).cast("long").as("sum_log2f"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_log2f"),
        expr("sum_log2f * 10000 div n_bigrams").as("avg_log2f_e4"))
    assert(out.except(naive).count() === 0)
    assert(naive.except(out).count() === 0)
    // and on a corpus with NO hot key the plan stays the plain join
    val unif = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("u"), col("id"), lit("a u"), col("id"), lit("b")).as("text"))
    val plain = TextOps.bigramLogfreqOf(unif).queryExecution.optimizedPlan.toString
    assert(!plain.contains("Union"),
      "uniform corpus must take the single co-keyed join path")
  }
}
