package graft.tools

/** Dev tool: print the DuckDB oracle text and its Spark translation for
  * one query — the debugging loop for DuckSqlDialect rules.
  *
  *   sbt "runMain graft.tools.XlateDump <query_name>"
  */
object XlateDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: XlateDump <query>"))
    val sql = graft.SparkEntry.oracleSql(name)
    println("==== DUCKDB ====")
    println(sql)
    println("==== SPARK ====")
    println(DuckSqlDialect.toSpark(sql))
  }
}
