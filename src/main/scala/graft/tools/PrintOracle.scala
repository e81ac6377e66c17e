package graft.tools

/** Dev tool: print ONE registry query's DuckDB oracle SQL to stdout — the
  * text graft.Verify ships in oracle_sql.json, for iterating on a
  * generated oracle (e.g. PqOps' composed CTE chains) without a full dump.
  *
  *   sbt "runMain graft.tools.PrintOracle <query_name>"
  */
object PrintOracle {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    println(graft.SparkEntry.oracleSql.getOrElse(name,
      sys.error(s"query $name has no oracle (or is unknown)")))
  }
}
