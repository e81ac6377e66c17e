package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev-only: dump `explain("formatted")` for named queries into
  * plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
  * format (judge checks plan claims against these files).
  *
  * Usage: runMain graft.tools.DumpQueryPlans <tag> <suffix> <query...>
  */
object DumpQueryPlans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // like graft.Bench: memo frames handed to later queries must survive
    // the per-query unpersist (reliable checkpoint files, not blocks)
    val ckptDir = java.nio.file.Files
      .createTempDirectory("graft_plans_ckpt").toString
    spark.conf.set(graft.Materialize.SharedDirConfKey, ckptDir)
    Files.createDirectories(Paths.get(s"plans/$tag"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val shape = PlanShape.of(df.queryExecution.executedPlan)
      val body =
        s"# $name ($suffix) — explain(formatted) at $dir\n" +
          s"# PlanShape: exchanges=${shape.exchanges} bhj=${shape.bhj} " +
          s"smj=${shape.smj} nestedLoop=${shape.nestedLoop} " +
          s"codegenStages=${shape.codegenStages}\n\n" + formatted
      Files.writeString(Paths.get(s"plans/$tag/${name}_$suffix.txt"), body)
      println(s"dumped $name ($suffix)")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
