ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "optbinningspark"
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
// The round driver parses the bench's one-line stdout JSON. With sbt's
// default LoggedOutput strategy every forked-process line is re-emitted
// with an "[info] " prefix, which is not valid JSON — the driver's parse
// came back null twelve rounds running (BENCH_r01..r12 all have
// parsed:null while the JSON line sits complete-but-prefixed in the
// stored tail). StdoutOutput passes the child's stdout through raw.
run / outputStrategy := Some(StdoutOutput)
// ...and drop the "[success] Total time ..." trailer so the JSON line is
// the last thing on stdout for parsers that only read the final line.
// (Read by sbt's command layer, not a task — excluded from lintUnused.)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // local[32] = driver + 32 executor threads in ONE JVM; 8g thrashes GC
  // under the bench suite's concurrent shuffles (the host has 128 GiB)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
