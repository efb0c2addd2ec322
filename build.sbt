ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "polars_ds_extensionspark"
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
// Pass the forked program's stdout through verbatim (no "[info] " prefix):
// the bench/verify drivers scan stdout for a raw JSON line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Drop sbt's trailing "[success] Total time: ..." line so the bench
// JSON line is the LAST stdout line a wrapper sees.
ThisBuild / showSuccess := false
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
  // local[32] runs 32 executor threads in ONE JVM: size the heap like
  // 32 executors' worth of shuffle/agg buffers, not like a driver. 8g
  // forced constant old-gen GC at sf0.1 (measured: 5-30x slowdowns on
  // queries run late in a long session); the box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "40g")}",
) ++ sys.env.get("GRAFT_JAVA_OPTS")
  .map(_.trim.split("\\s+").toSeq).getOrElse(Seq.empty)
