ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkgraphspark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as
// JSON (BENCH_r*.json "parsed"). Two things defeated that through round 6:
// sbt's trailing "[success] Total time ..." line, and the logger's
// "[info] " prefix on every forked-process line. Pass the forked run's
// stdout/stderr through verbatim and drop the success banner so the
// bench's compact JSON line is genuinely last and genuinely bare.
// DELIBERATELY GLOBAL (ADVICE r7 #4 decision): sbt evaluates showSuccess
// per top-level command, not per task, so a `run`-scoped setting would
// not reach the driver's `sbt "runMain graft.Bench"` invocation — and
// every sbt entry point here (driver bench/verify, CI-style test runs)
// wants machine-parseable output. The lint exclusion below records that
// the key is consumed by sbt's command loop, not by another task.
showSuccess := false
Global / excludeLintKeys += showSuccess
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
  "-Duser.timezone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
