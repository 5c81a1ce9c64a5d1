ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "oamapspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Nine rounds of BENCH_r*.json carried `parsed: null` because sbt wraps the
// forked bench JVM's stdout: every line got an `[info] ` prefix and sbt
// appended a `[success] Total time: …` footer, so the bench's terminal
// {"metric":"total"} JSON was never a bare final stdout line (r9 VERDICT #1).
// StdoutOutput passes forked stdout through verbatim; showSuccess drops the
// footer. With both, the bench summary IS the last line sbt prints.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// suites share one SparkSession and some (ScaleSpec) mutate session confs
// that others (PlanSpec) assert against — run suites sequentially
Test / parallelExecution := false
run / fork := true
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
  // 8g thrashed once the bench/verify working set grew to ~95 queries × 2
  // scale factors of persisted intermediates (measured: full bench 389 s at
  // 8g vs 239 s at 24g, with the 8g run losing 10-30 s stretches to GC).
  // The box has 128 GiB; local[32] with this cache population needs room.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
)
