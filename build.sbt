ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tiadatapipelinespark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`.
// Bench prints its compact summary line last, but sbt then appends
// "[success] Total time: …" AFTER the forked JVM exits — no in-JVM trick
// (shutdown hook included) can print after that, so BENCH_r{10..15}.json
// all carried "parsed": null. Suppress sbt's success banner (exit code
// still reports build/run status) so the program's own last line is the
// process's last line. (r15 verdict task 2)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// …and sbt's default output strategy routes the forked JVM's stdout through
// its logger, prefixing every line with "[info] " — which breaks a strict
// JSON parse of the last line. Send the forked process's streams straight
// through instead (stdout stays stdout, stderr stays stderr, no prefixes).
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
  // local[32] keeps up to 32 concurrent tasks' shuffle/agg state in ONE JVM;
  // an 8g default starved the GC and turned plan-sound queries into 100s+
  // outliers. 32g leaves headroom for the 128 GiB sandbox without promising
  // more than CI machines have.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
