package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time named queries in isolation, twice each. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"TIME $name%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}
