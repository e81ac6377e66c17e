package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorExpressions

/** graft_q8 (int8 scalar quantization) must agree exactly with the HOF
  * encoding it replaces — floor(x·127/max|x|) per element, all-zero codes
  * for all-zero/empty vectors, null poisoning on a null element — and the
  * quantized ANN ranking must stay close to the exact cosine ranking on
  * the real corpus (the whole point of scoring on codes).
  */
class Quantize8Spec extends SparkSuite {

  import spark.implicits._

  private val hof =
    expr("CASE WHEN aggregate(v, 0D, (m, x) -> greatest(m, abs(x))) > 0 " +
      "THEN transform(v, x -> floor(x * 127 / " +
      "aggregate(v, 0D, (m, x) -> greatest(m, abs(x))))) " +
      "ELSE transform(v, x -> 0D) END")

  test("matches the HOF encoding on the corpus plus edge vectors") {
    VectorExpressions.ensureRegistered(spark)
    val edge = Seq(
      (10000L, Seq(0.0, 0.0, 0.0)), // all-zero → all-zero codes
      (10001L, Seq.empty[Double]), // empty → empty
      (10002L, Seq(-1.5, 0.75, 1.5)), // negative extremum
      (10003L, Seq(1e-30, -1e-30)), // tiny but nonzero scale
      (10004L, Seq(5.0)) // single element → code 127
    ).toDF("vec_id", "v")
    val corpus = Tables.embeddings(spark, smokeDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .union(edge)

    val viaHof = corpus.select(col("vec_id"), hof.as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaNative = corpus
      .select(col("vec_id"), expr("graft_q8(v)").as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

    assert(viaNative.keySet === viaHof.keySet)
    viaHof.foreach { case (id, c) =>
      assert(viaNative(id) === c, s"vec $id diverges")
    }
    assert(viaNative(10002L) === Seq(-127.0, 63.0, 127.0))
    assert(viaNative(10004L) === Seq(127.0))
  }

  test("a null element poisons the result to null") {
    VectorExpressions.ensureRegistered(spark)
    val schema = StructType(Seq(
      StructField("v", ArrayType(DoubleType, containsNull = true))))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Seq[java.lang.Double](1.0, null, 2.0))), schema)
    assert(df.select(expr("graft_q8(v)")).collect()(0).isNullAt(0))
  }

  test("codes are bounded int8 values and the top extremum hits ±127") {
    VectorExpressions.ensureRegistered(spark)
    val stats = Tables.embeddings(spark, smokeDir)
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(expr("graft_q8(v)").as("c"))
      .select(
        min(expr("array_min(c)")).as("lo"),
        max(expr("array_max(c)")).as("hi"),
        sum(expr("CAST(array_max(transform(c, x -> abs(x))) = 127.0 AS INT)"))
          .as("n_sat"))
      .collect().head
    assert(stats.getDouble(0) >= -127.0 && stats.getDouble(1) <= 127.0)
    // every nonzero vector's extremal |element| quantizes to exactly 127
    assert(stats.getLong(2) === Tables.embeddings(spark, smokeDir).count())
  }

  test("quantized top-10 recalls most of the exact cosine top-10") {
    val exact = graft.operators.SimilarityOps.annCosineTopk
      .run(spark, smokeDir).collect().map(_.getLong(0)).toSet
    val quant = graft.operators.SimilarityOps.annQuantizedTopk
      .run(spark, smokeDir).collect().map(_.getLong(0)).toSet
    assert(quant.size === 10)
    // int8 distortion on 64-dim unit-ish vectors keeps most of the head
    assert((exact intersect quant).size >= 6,
      s"recall ${(exact intersect quant).size}/10")
  }
}
