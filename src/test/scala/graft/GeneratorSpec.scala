package graft

import org.apache.spark.sql.functions._
import graft.functions.FlameRayGenerator

/** The native UDTF (G1) must agree with the relational sequence+explode
  * encoding it accelerates, and must plan through GenerateExec like explode.
  */
class GeneratorSpec extends SparkSuite {

  test("graft_flame_rays == relational flame candidates") {
    FlameRayGenerator.ensureRegistered(spark)
    import spark.implicits._
    val bombs = Seq((0L, 0L), (15L, 12L), (29L, 24L), (3L, 24L))
      .toDF("bx", "by")

    val viaGenerator = bombs
      .selectExpr("bx", "by", "graft_flame_rays(bx, by)")
      .select("bx", "by", "dir", "dist", "fx", "fy")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

    // reference-exact asymmetric rays (utils.go:132-175): R/D start at the
    // bomb cell (dist 0), L/U one off (dist 1)
    val dirs = Seq(("R", 1L, 0L, 0L), ("L", -1L, 0L, 1L),
        ("D", 0L, 1L, 0L), ("U", 0L, -1L, 1L))
      .toDF("dir", "dx", "dy", "d0")
    val relational = bombs.crossJoin(dirs)
      .withColumn("dist", explode(sequence(col("d0"), lit(6L))))
      .withColumn("fx", col("bx") + col("dx") * col("dist"))
      .withColumn("fy", col("by") + col("dy") * col("dist"))
      .filter(col("fx").between(0, 29) && col("fy").between(0, 24))
      .select("bx", "by", "dir", "dist", "fx", "fy")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

    assert(viaGenerator === relational)
    assert(viaGenerator.nonEmpty)
  }

  test("generator plans through GenerateExec") {
    FlameRayGenerator.ensureRegistered(spark)
    import spark.implicits._
    val plan = Seq((5L, 5L)).toDF("bx", "by")
      .selectExpr("graft_flame_rays(bx, by)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), s"expected GenerateExec in:\n$plan")
  }
}
