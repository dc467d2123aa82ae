ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kustopreforgespark"
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
// Pass forked-run output straight through to sbt's own stdout/stderr
// instead of the logger: the grading driver greps stdout for Bench's one
// JSON line, and the logger's "[info] " prefix made it unparseable (r1).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Throughput collector for the forked Spark JVMs (r21): under G1,
  // the JNI-critical-heavy codec kernels (Deflater/snappy/zstd in the
  // x98 fixture path and Spark's own lz4) drove "GCLocker Initiated
  // GC" young-collection storms on a preempting host — 100-300 ms
  // young pauses, post-GC heap ballooning to 5+ GB with only ~140 MB
  // truly live, x98_avro_scan at 8-51 s vs its 0.85 s baseline.
  // ParallelGC has no G1 GCLocker-retry spiral: x98 measured
  // 1.1-1.7 s stable across consecutive runs (20-30x on that host).
  // Override with SPARK_GRAFT_GC=UseG1GC to compare.
  s"-XX:+${sys.env.getOrElse("SPARK_GRAFT_GC", "UseParallelGC")}",
)
