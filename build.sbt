ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "definalprojectspark"
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
// Forked `run` output goes STRAIGHT to this process's stdout/stderr —
// no `[info] `/`[error] ` logger prefixes. The driver parses Bench's
// one-line JSON summary from stdout; three rounds of its BENCH
// artifacts recorded `parsed: null` against the prefixed form (r19
// verdict #2). Spark's log4j writes to stderr, so stdout carries ONLY
// the program's own println lines.
run / outputStrategy := Some(StdoutOutput)
// ... and nothing may follow that line: sbt's `[success] Total time:`
// epilogue was the other candidate for the driver's parse failure.
Global / showSuccess := false
// sbt's unused-key lint doesn't track this global flag (it IS honored —
// compile/run output ends without the epilogue).
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
  // 24g default (was 8g): the r19 baseline bench measured the 8g heap
  // GC-thrashing mid-session — t72 35.4 s vs 7.0 s at 16g with IDENTICAL
  // job counts (BENCH_raw_r19_baseline vs _mem16; OPTIMIZATION_r19.md §heap).
  // A long session accumulates persisted/localCheckpoint blocks faster
  // than the async unpersist + ContextCleaner retire them; the sandbox
  // has 128 GiB, so headroom is the right default. Env-overridable for
  // smaller boxes (local[2] CI runs fine at 8g).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
