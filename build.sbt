ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "filebeattoclickhousespark"
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
// Driver-parseability (round 14, VERDICT r13 task 8 — every
// BENCH_r*.json since round 1 carries `parsed: null`): the driver
// tail-captures `sbt "runMain graft.Bench"` and parses the LAST output
// line, but sbt (a) prefixes the forked JVM's stdout with "[info] "
// (not valid JSON) and (b) appends its own "[success] Total time" as
// the final line. StdoutOutput passes the forked process's stdout
// through RAW, and showSuccess drops the trailer — so graft.Bench's
// shutdown-hook metric line is both unprefixed AND last.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
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
  // local[32] means driver + all 32 executor threads share this one
  // heap; the box has 128 GiB, and 8g (the old default) left the
  // wide-aggregation benches GC-bound under the driver harness
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
