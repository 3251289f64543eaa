ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projectsamanvayatruehybridhtapdatabasespark"
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
run / connectInput := true
// The driver parses the LAST lines of captured stdout as JSON
// (BENCH_r{N}.json). sbt's default LoggedOutput prefixes every forked
// line with "[info] " and appends a "[success] Total time..." trailer,
// which left the artifact `parsed: null` two rounds running (r19
// What's-wrong #1). StdoutOutput passes the app's stdout through raw,
// and showSuccess drops the trailer — the final stdout line is the
// bench's own compact JSON, unwrapped.
outputStrategy := Some(StdoutOutput)
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
  // Bench/Verify emit JSON via the locale-sensitive f-interpolator; a
  // comma-decimal default locale would corrupt the machine-read output
  "-Duser.language=en", "-Duser.country=US",
  // local[32] runs 32 concurrent tasks in one JVM; 8g left the bench
  // GC-bound (dedup/ANN timings swung 2-3x run to run on a 128 GiB box)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
