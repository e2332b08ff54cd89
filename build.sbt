ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cenetondatabasetoolsspark"
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
// Forked-run stdout bypasses sbt's logger: without this, every line the
// Bench/Verify mains print is prefixed with "[info] ", which broke the
// external driver's JSON-tail parse two rounds running (parsed:null in
// BENCH_r01/r02). StdoutOutput inherits the parent's raw stdout instead.
run / outputStrategy := Some(StdoutOutput)
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
  // The bench/verify gauntlet JIT-compiles ~260 distinct whole-stage-
  // codegen'd query plans in one JVM; at the JDK-17 default code cache
  // (240 MB) the later, largest queries run partially de-optimized —
  // measured round 8: x46 costs 26 s after a 1x gauntlet but 40-54 s
  // after a 2x gauntlet in the SAME JVM, and an explicit System.gc()
  // does not restore it (heap is not the debt; compiled code is).
  "-XX:ReservedCodeCacheSize=512m",
)
