ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "matchyspark"
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
// Pass the forked process' stdout through UNPREFIXED — the driver parses
// Bench/Verify JSON lines from stdout and sbt's default logger prepends
// "[info] " which breaks line-oriented parsers.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Shared-VM heap pathology (BENCH.md): when this host's memory subsystem
// is in a degraded phase, JVMs with heaps >= ~32g run the 8-core scan up
// to 10x slower (fresh-eden page-touch storms hit the host's paging path;
// -Xms48g/-Xmx48g reproduces it, -Xms8g..16g is immune, measured
// 2026-08-17). Nothing in this repo needs more than ~12g (6-12M-turn
// fixtures, KB-scale broadcasts), so the requested driver memory is capped
// at 16g and pinned Xms=Xmx so the heap never resizes mid-benchmark.
val driverMemGb: Int = {
  val req = sys.env.get("SPARK_DRIVER_MEM")
    .flatMap(s => scala.util.Try(s.toLowerCase.stripSuffix("g").toInt).toOption)
    .getOrElse(16)
  math.max(2, math.min(req, 16))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${driverMemGb}g",
  s"-Xms${driverMemGb}g",
  // throughput GC for the batch scan workload: the 32-thread scan is
  // allocation-heavy (per-candidate rows/strings) and ParallelGC sustains
  // a higher allocation rate than G1's pause-targeted collection here
  "-XX:+UseParallelGC",
)
