package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainOverlap {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE $tag run$i ${(System.nanoTime()-t0)/1e9}%7.2f s rows=$n")
      }
    }
    val iv = graft.operators.RelationalOps.lineitemIntervals(spark, d)
    val B = 50L
    val bkts = iv.select(col("key"), col("id"), col("s"), col("e"),
      explode(array_distinct(array(expr(s"s div $B"), expr(s"e div $B")))).as("bkt"))
    time("explode-only")(bkts.count())
    val a = bkts.select(col("key"), col("bkt"), col("id").as("id_a"), col("s").as("s_a"), col("e").as("e_a"))
    val bb = bkts.select(col("key"), col("bkt"), col("id").as("id_b"), col("s").as("s_b"), col("e").as("e_b"))
    val cand = a.join(bb, Seq("key", "bkt"))
    time("candidates")(cand.count())
    val candSh = a.hint("shuffle_hash").join(bb, Seq("key", "bkt"))
    time("cand-shuffle-hash")(candSh.count())
    val candMg = a.hint("merge").join(bb, Seq("key", "bkt"))
    time("cand-merge")(candMg.count())
    time("full-default")(graft.SparkEntry.queries("join_interval_overlap")(spark, d).count())
    spark.stop()
  }
}
