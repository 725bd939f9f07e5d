ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbteconomicindicatorseuspark"
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
// Forked-run output normally routes through sbt's logger, which prefixes
// every line with "[info] " — that prefix breaks line-oriented JSON
// consumers of Bench/Verify stdout. StdoutOutput passes the child's
// stdout through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// runMain resolves its own outputStrategy scope and does NOT delegate to
// run/ (same sbt scoping gotcha as the -Xms floor below) — without this,
// `sbt "runMain graft.Bench"` stdout carries "[info] " prefixes that
// break JSON consumers (tools/ab.sh bit this in round 17).
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] runs every task in THIS one JVM: with the 253-query bench
  // suite's session-memoized state resident, an 8g heap spent ~17% of
  // serve wall in allocation-pressure GC (measured round 14: serve 216s
  // at 8g vs 179s at 32g, same queries, zero spills either way). The
  // box has 125 GiB; 32g keeps young-gen pressure off the critical path.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
// Round-16 same-box A/B finding: with -Xms unset, G1 commits lazily
// (~3-7g observed against the 32g ceiling) and back-to-back bench runs
// of IDENTICAL code swung 253.7s/99s-GC vs 215.6s/59s-GC purely on
// ergonomics luck. A 16g floor gives the collector headroom from the
// first query and removes that run-to-run mode. Scoped to the run tasks
// (Bench/Verify/ScaleRehearsal — the timing-bearing mains) ONLY: an
// unconditional floor would make every `sbt test` JVM demand 16 GiB at
// startup and fail outright on a smaller box (round-16 advice). BOTH
// task axes needed: `runMain` (how every main is actually invoked)
// resolves javaOptions at its own scope and does NOT delegate to run/.
run / javaOptions += s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MIN_MEM", "16g")}"
Compile / runMain / javaOptions +=
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MIN_MEM", "16g")}"
// Test JVMs get their own, smaller ceiling (round-17 advice: a fresh
// checkout must `sbt test` on a 16 GiB box with NO env vars). The suite
// runs at sf0.001/sf0.01 where 12g is ample; Bench/Verify keep the 32g
// run-scope default above. Appended AFTER the inherited -Xmx32g — the
// JVM honors the last -Xmx flag, so this override wins in Test scope.
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_TEST_DRIVER_MEM", "12g")}"
