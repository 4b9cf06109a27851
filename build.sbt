ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "covid19i2b2spark"
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
// The bench/verify harness parses the LAST stdout line as JSON. Two sbt
// behaviors break that: the "[success] Total time ..." trailer printed
// after the run, and the "[info] " prefix sbt's logger adds to forked
// process output. Suppress both so a main's final println IS the final
// stdout line.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // used by commands, lint can't see it
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
  // 16g default: the 77-query bench run accumulates cached tables +
  // memory-sink results; at 8g the late-alphabet queries ran 2-4x slower
  // from GC pressure (host has 128 GiB — headroom is free locally)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// dev-only passthrough for A/B measurements (e.g.
// -Dspark.graft.labelprop.broadcast=false, state-store provider
// experiments) without editing this file per run; the driver never
// sets it, so round artifacts always measure the defaults
javaOptions ++= sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
