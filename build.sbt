ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkastreamingpolymarketpipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Specs share one SparkSession; streaming tests use named memory sinks —
// keep suites serial so sessions/sinks don't interleave.
Test / parallelExecution := false
run / fork := true
// Pass the forked program's stdout straight through instead of routing
// it via sbt's logger: the bench/verify mains print one machine-read
// JSON line, and the logger's "[info] " prefix breaks the driver's
// line-anchored parse (BENCH_r11.json "parsed": null).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

// One-command adversarial robustness gate: `sbt adversarial` regenerates
// five pathological corpora (sub-shingle docs, dup cliques, null/malformed
// events, zero/duplicate embeddings, skewed/dangling TPC keys) and runs
// the full DuckDB-oracle compare against each (scripts/adversarial.py).
// The task exports this build's classpath + JVM options so compare.py
// runs graft.Verify via plain `java` — NO nested sbt (a child sbt would
// deadlock on the project lock this task already holds), and no per-sweep
// sbt startup tax. Fails the build on any oracle mismatch.
lazy val adversarial = taskKey[Unit]("adversarial oracle sweeps over degenerate corpora")
adversarial := {
  val cp = (Runtime / fullClasspath).value.files
    .map(_.getAbsolutePath).mkString(java.io.File.pathSeparator)
  // newline-delimited so an option containing a space (a quoted -D
  // value) survives the round-trip; compare.py splits on newlines
  val opts = (run / javaOptions).value.mkString("\n")
  val rc = scala.sys.process.Process(
    Seq("python3", "scripts/adversarial.py"), baseDirectory.value,
    "GRAFT_JAVA_CP" -> cp, "GRAFT_JAVA_OPTS" -> opts).!
  if (rc != 0) sys.error(s"adversarial sweep failed (exit $rc) — see output above")
}
