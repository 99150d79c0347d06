ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "calpcvatrackingpipelinespark"
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
// Pass forked run output through verbatim: sbt's default logger prefixes
// every line with "[info] ", which breaks downstream parsers expecting a
// bare JSON line from Bench/Verify (BENCH_r01.json recorded parsed:null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The bench driver keeps only the LAST 2000 chars of output and parses the
// JSON line from it. sbt's trailing "[success] Total time: ..." line eats
// ~95 chars of that window and pushed the (long) JSON line out of it in r2
// (BENCH_r02.json parsed:null). Suppress it so the JSON line is last.
Global / showSuccess := false
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
// Opt-in JVM forensics for full-session bench pathologies (a query can
// run 20x slower after ~100 predecessors than standalone — GC debt and
// code-cache churn hide from query-level timers): set
// SPARK_GRAFT_JVM_LOG=/tmp/x.log to capture a unified GC log.
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_LOG").toSeq.map(p =>
  s"-Xlog:gc*=info:file=$p:time,uptime")
