package graft.tools

import graft.{SparkEntry, Tables}

/** Dev tool: print the first differing canonical row between one query's
  * DataFrame plan and its DIALECT-TRANSLATED oracle run through spark.sql
  * — the cell-level debugging loop for DuckSqlDialect rules (XlateDump
  * shows the text; this shows the first value divergence).
  *
  *   sbt "runMain graft.tools.DiffProbe <query_name> [sfDir]"
  */
object DiffProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.registerViews(spark, dir)
    val q = SparkEntry.all.find(_.name == name).get
    val sqlText = DuckSqlDialect.toSpark(SparkEntry.oracleSql(name))
    val viaSql = SqlParityProbe.withRawLiterals(spark)(
      SqlParityProbe.canon(spark.sql(sqlText)))
    val viaDf = SqlParityProbe.canon(q.run(spark, dir))
    println(s"[diff] rows sql=${viaSql.size} df=${viaDf.size}")
    viaSql.zip(viaDf).zipWithIndex.collectFirst {
      case ((a, b), i) if a != b =>
        println(s"[diff] first at $i:\n[diff] sql: ${a.take(400)}\n[diff] df : ${b.take(400)}")
    }.getOrElse(println("[diff] identical"))
    spark.stop()
  }
}
