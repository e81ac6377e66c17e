package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures graft.Bench's calibration workload on THIS machine — the tool
  * that produced (and re-validates) the pinned `Bench.CalibrationRefSec`.
  * Run on an idle box:
  *
  *   sbt "runMain graft.tools.CalibrationProbe"
  *
  * Prints N probe runs plus their min; the pin is the idle min at the
  * DRIVER'S bench settings — the probe parallelizes, so always pin at
  * the same SPARK_GRAFT_CPUS the driver benches with (32 — BENCH_r16
  * records cpus: 32; the current pin is the cpus=32 idle min). If the calibration WORKLOAD in
  * Bench.calibrationOnce ever changes, re-run this and move the pin
  * with it; nothing else should move it (it is a unit, not a target).
  */
object CalibrationProbe {
  def main(args: Array[String]): Unit = {
    // default matches the DRIVER's bench config (cpus=32), because the
    // pin must be measured at the worker count the bench runs with
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.headOption.map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // one unmeasured warmup run (codegen compile)
    graft.Bench.calibrationProbeOnce(spark)
    val times = (1 to runs).map { i =>
      val t = graft.Bench.calibrationProbeOnce(spark)
      println(f"[calib] run $i: $t%.3f s")
      t
    }
    println(f"[calib] min of $runs: ${times.min}%.3f s  " +
      f"(pinned Bench.CalibrationRefSec = ${graft.Bench.CalibrationRefSec}%.3f)")
    spark.stop()
  }
}
