ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sqlgrepspark"
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
// The driver greps the LAST parseable stdout line of `sbt runMain
// graft.Bench` for the benchmark artifact. By default sbt routes forked
// output through its logger (prefixing `[info] `) and appends a
// `[success] Total time: ...` line — both kept the artifact unparseable
// for four straight rounds (`parsed: null`). StdoutOutput passes the
// forked JVM's stdout through verbatim; showSuccess drops the trailer.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — exclude
// it from the unused-key lint
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
  // Fixed-size heap: growing a large G1 heap on this VM causes multi-
  // second page-fault/zeroing stalls that wreck benchmark stability;
  // 12g is ample now that the hot path allocates primitively (TokenGen).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // Throughput collector: measured ~20% faster than G1 on the batch
  // pipeline at both 4 and 16 cores (pause latency is irrelevant here).
  "-XX:+UseParallelGC",
)
