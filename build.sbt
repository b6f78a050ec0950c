ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "anomalydetectionspark"
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
  // 8g starved the 69-query bench session: accumulated broadcasts /
  // checkpoint blocks / memory-sink tables pushed the old gen to the
  // GC wall and the run's tail degraded 10-50x (369 s vs 89 s total).
  // The box has 128 GiB; size the single local[32] JVM accordingly.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 260 bench queries generate thousands of codegen classes; the JDK
  // default 240m code cache fills mid-suite, JIT compilation stops,
  // and late compute-heavy entries run interpreted (observed: q108
  // 61s in-suite INCLUDING its end-of-suite retime vs 25s isolated
  // on identical code — not GC, gc_sec was 1.3s). Size the cache for
  // the whole suite.
  "-XX:ReservedCodeCacheSize=512m",
)
