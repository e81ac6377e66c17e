package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: isolate which sub-expression makes shingling slow. */
object ProfileShingle {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"T $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(col("doc_id"),
      filter(split(col("text"), " "), w => w =!= "").as("t"))
      .repartition(32)
    time("tokenize+repartition")(toks.count())
    time("posexplode tokens")(
      toks.select(col("doc_id"), explode(col("t"))).count())
    time("transform trivial lambda")(
      toks.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 2), i => i))).count())
    time("transform 1x element_at")(
      toks.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 2),
          i => element_at(col("t"), i)))).count())
    time("transform 3x element_at+concat")(
      toks.select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 2),
          i => concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1), element_at(col("t"), i + 2))))).count())
    time("with when-guard wrapper")(
      toks.select(col("doc_id"),
        when(size(col("t")) >= 3,
          transform(sequence(lit(1), size(col("t")) - 2),
            i => concat_ws(" ", element_at(col("t"), i),
              element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
          .otherwise(array().cast("array<string>")).as("shs"))
        .select(col("doc_id"), explode(col("shs"))).count())
    time("when-guard + distinct")(
      toks.select(col("doc_id"),
        when(size(col("t")) >= 3,
          transform(sequence(lit(1), size(col("t")) - 2),
            i => concat_ws(" ", element_at(col("t"), i),
              element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
          .otherwise(array().cast("array<string>")).as("shs"))
        .select(col("doc_id"), explode(col("shs")).as("sh")).distinct().count())
    time("without repartition, same")(
      docs.select(col("doc_id"),
        filter(split(col("text"), " "), w => w =!= "").as("t"))
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("t")) - 2),
            i => concat_ws(" ", element_at(col("t"), i),
              element_at(col("t"), i + 1), element_at(col("t"), i + 2))))).count())
    // the round-2 native kernels, for comparison against the chains above
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val rdocs = docs.repartition(32)
    time("NATIVE graft_shingle_rows")(
      rdocs.selectExpr("doc_id", "graft_shingle_rows(text)").count())
    time("NATIVE graft_shingle_hashes")(
      rdocs.selectExpr("doc_id", "graft_shingle_hashes(text) AS tks")
        .selectExpr("doc_id", "explode(tks)").count())
    time("HOF hash chain (pre-round-2)")(
      rdocs
        .select(col("doc_id"),
          filter(split(col("text"), " "), w => w =!= "").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"),
          expr("array_distinct(transform(sequence(1, size(t) - 2), " +
            "i -> graft_polyhash(concat_ws(' ', element_at(t, i), " +
            "element_at(t, i + 1), element_at(t, i + 2)))))").as("tks"))
        .selectExpr("doc_id", "explode(tks)").count())
    spark.stop()
  }
}
