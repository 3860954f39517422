ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kapacitorspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the bench's
// one-line JSON from the process output. sbt's default LoggedOutput wraps
// every forked-JVM stdout line in an `[info] ` prefix, which is not valid
// JSON — every round's BENCH artifact carried `parsed: null` because of it.
// StdoutOutput passes the child's stdout through verbatim, and
// showSuccess := false drops the trailing `[success] Total time: ...` line
// so the JSON line is the last thing on stdout.
run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // ~74 whole-stage-codegen plans live in one benchmark JVM; the JDK 17
  // default 240 MB code cache evicts hot compiled methods under that load
  // (measured: the heaviest query records 2.5x its isolated time purely
  // from sharing the JVM with the other warmed plans)
  "-XX:ReservedCodeCacheSize=1g",
)
