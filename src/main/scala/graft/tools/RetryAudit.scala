package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev gate: every registered query must produce the SAME result set when
  * its tasks FAIL AND RETRY. On a 1000-executor cluster task attempts are
  * routine — preemption, spot-instance loss, executor OOM-kills, fetch
  * failures — and Spark's recovery contract is that a retried task is
  * indistinguishable from a first attempt. Any query that violates that
  * (attempt-level side effects double-applied, per-attempt non-determinism
  * like an uncached rand() or wall-clock read feeding a result column,
  * a memo keyed so a re-run poisons it) is wrong at scale in a way every
  * single-attempt gate — oracle, geometry, mode, layout, concurrency —
  * structurally cannot see. This is the retry axis of the invariance set.
  *
  * Mechanics: [[graft.Tables.RetryFaultKey]] turns every table load into a
  * pass-through barrier whose task throws on attempt 0, so the scan stage
  * of every query executes twice per partition under REAL TaskSetManager
  * retry (master `local[32, 4]` — local mode with maxFailures=4; plain
  * local[N] aborts the job on the first failure). The faulted run's
  * canonical digest ([[Canon]]) must equal a clean reference run's, query
  * by query.
  *
  * Scope, stated honestly: the injection points are the scan stages —
  * Tables.table (the choke point all parquet reads share) AND the DSV2
  * GameEventsSource (whose reader factory fails attempt 0 under the same
  * conf, so the lcg_* queries retry through the V2 read path too).
  * Post-shuffle stages retry only on fetch failures, which local mode
  * cannot produce.
  *
  *   sbt "runMain graft.tools.RetryAudit" [sfDir]
  */
object RetryAudit {

  private def runAll(label: String, master: String, fault: Boolean,
                     sfDir: String): Map[String, Either[String, (String, Int)]] = {
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // many tiny scan tasks ⇒ many injected failures per stage, and the
      // per-TASK failure count stays 1 « maxFailures
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config(graft.Tables.RetryFaultKey, fault.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.SparkEntry.all.map { q =>
      q.name -> (try Right(Canon.digestDf(q.run(spark, sfDir)))
      catch {
        case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      })
    }.toMap
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    println(s"[retry] $label done: ${out.size} queries")
    out
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    // reference first: a clean single-attempt run on the same split size
    val ref = runAll("reference (no faults)", "local[32]", fault = false,
      sfDir = sfDir)
    val faulted = runAll("faulted (every scan task fails attempt 0)",
      "local[32, 4]", fault = true, sfDir = sfDir)
    val names = ref.keySet.toSeq.sorted
    val bad = names.flatMap { n =>
      (ref(n), faulted(n)) match {
        case (Right((dr, _)), Right((df, _))) if dr == df => None
        case (Right((dr, rr)), Right((df, rf))) =>
          Some(s"$n: DIVERGED rowsRef=$rr rowsFaulted=$rf " +
            s"digestRef=${dr.take(12)} digestFaulted=${df.take(12)}")
        case (Left(e), _) => Some(s"$n: reference threw $e")
        case (_, Left(e)) => Some(s"$n: faulted run threw $e")
      }
    }
    bad.foreach(m => println(s"[retry] FAIL $m"))
    println(s"[retry] done: ${names.size} queries, ${bad.size} divergent")
    require(bad.isEmpty, s"${bad.size} queries are task-retry-sensitive")
  }
}
