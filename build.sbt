ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkastreamsinactionspark"
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
  // 48g default on the 128 GiB host: local[32] runs 32 concurrent tasks in
  // ONE JVM, and an 8g heap GC-thrashed at sf0.1 once the query surface
  // passed ~100 entries (round-3 bench died on executor-heartbeat timeouts
  // mid-pass — classic full-GC stall, not a slow query).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 242 queries × 2 bench passes generate thousands of whole-stage-codegen
  // classes; the JDK17 default 240 MB code cache fills mid-run, the JIT
  // disables itself, and compute-dense queries (decimal aggs) degrade
  // ~8× ONLY inside long runs (sf2 bench: pricing_summary 109 s in-run vs
  // 12.7 s isolated). Standard Spark-driver sizing for codegen-heavy
  // workloads.
  "-XX:ReservedCodeCacheSize=1g",
)
