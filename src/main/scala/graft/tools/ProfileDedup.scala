package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the dedup pipelines (not part of the driver
  * contract). Times each stage of dedup_minhash_lsh in isolation.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorExpressions.ensureRegistered(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(col("doc_id"),
      filter(split(col("text"), " "), w => w =!= "").as("t"))
      .repartition(32)
    val sh = toks.select(col("doc_id"),
      when(size(col("t")) >= 3,
        transform(sequence(lit(1), size(col("t")) - 2),
          i => concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
        .otherwise(array().cast("array<string>")).as("shs"))
      .select(col("doc_id"), explode(col("shs")).as("sh"))
    time("shingles (no distinct)")(sh.count())
    val shd = sh.distinct()
    time("shingles distinct")(shd.count())
    val shc = time("localCheckpoint")(shd.localCheckpoint())
    val keyed = shc.withColumn("tk", expr("graft_polyhash(sh)"))
    time("polyhash")(keyed.count())
    val minCols = (0 until 16).map(j =>
      min((col("tk") * graft.operators.DedupOps.HashA(j) +
        graft.operators.DedupOps.HashB(j)) % graft.operators.DedupOps.P).as(s"mh$j"))
    val sig = keyed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    time("16-min signature agg")(sig.count())
    val sigC = sig.localCheckpoint()
    val bandCols = (0 until 4).map(b =>
      concat_ws("-", (0 until 4).map(r => col(s"mh${b * 4 + r}")): _*))
    val bands = sigC.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "sig")))
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("band self-join candidates")(cand.count())
    val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shc.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
      .join(shc.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
    time("verify join")(inter.count())
    spark.stop()
  }
}
