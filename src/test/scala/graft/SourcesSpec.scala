package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth (S-family): the engine's tables survive
  * round trips through the other supported wire formats — CSV and JSON
  * lines — with schema intact (S1 append + S10 schema enforcement across
  * formats).
  */
class SourcesSpec extends SparkSuite {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/data"

  test("events round-trip through CSV preserves rows and aggregates") {
    val dir = tmp("csv")
    val src = Tables.events(spark, smokeDir)
      .select("event_id", "user_id", "event_type", "value")
    src.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .csv(dir)
    assert(back.count() === src.count())
    val aggOf = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum("event_id"), round(sum("value"), 2), countDistinct("event_type"))
        .collect()(0).toSeq
    assert(aggOf(back) === aggOf(src))
  }

  test("events round-trip through ORC preserves schema and aggregates") {
    // ORC is the columnar alternative a warehouse migration hands us;
    // unlike CSV/JSON it carries its own schema and types
    val dir = tmp("orc")
    val src = Tables.events(spark, smokeDir)
      .select("event_id", "user_id", "event_type", "value")
    src.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === src.schema)
    assert(back.count() === src.count())
    val aggOf = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum("event_id"), round(sum("value"), 2), countDistinct("event_type"))
        .collect()(0).toSeq
    assert(aggOf(back) === aggOf(src))
  }

  test("events round-trip through JSON lines preserves schema and values") {
    val dir = tmp("json")
    val src = Tables.events(spark, smokeDir)
      .select("event_id", "user_id", "event_type", "value", "props")
    src.write.json(dir)
    val back = spark.read
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .json(dir)
    assert(back.count() === src.count())
    // nested JSON string column survives (C13 still works after round trip)
    val k = back.select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(sum("k")).collect()(0).getLong(0)
    val k0 = src.select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(sum("k")).collect()(0).getLong(0)
    assert(k === k0)
  }

  test("corrupt JSON rows are quarantined, not silently dropped") {
    val dir = tmp("badjson")
    val good = """{"event_id": 1, "event_type": "click"}"""
    val bad = """{"event_id": oops"""
    import spark.implicits._
    Seq(good, bad, good).toDF("value").write.text(dir)
    val parsed = spark.read
      .schema("event_id BIGINT, event_type STRING, _corrupt_record STRING")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
    val rows = parsed.cache()
    assert(rows.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(rows.filter(col("event_id").isNotNull).count() === 2)
    rows.unpersist()
  }
}
