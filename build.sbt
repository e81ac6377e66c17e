ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "playwithpulsarspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Default `sbt test` = the CORE profile (<20 min): suites tagged
// @org.scalatest.tags.Slow — the multi-JVM lease races, scale-shaped
// property sweeps and streaming-wait matrices — are excluded so the
// driver's budgeted run completes (VERIFY r19 recorded tests_ok:false
// because the ~49-min full suite was killed at budget; ADVICE r18/r19
// item). The graph/dedup property suites guarding rewritten kernels
// stay in the core profile. Round close still runs the full matrix:
//   GRAFT_FULL_TESTS=1 sbt test
Test / testOptions ++= (
  if (sys.env.contains("GRAFT_FULL_TESTS")) Nil
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "org.scalatest.tags.Slow")))
// Pass forked-run stdout through UNPREFIXED: the driver parses Bench's
// one-line JSON from stdout, and sbt's default logger wraps every child
// line in "[info] ", which breaks a strict json parse of the line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
