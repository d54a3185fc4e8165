ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cs562_sdpgspark"
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
  // shuffle/spill on tmpfs: the sandbox disk sustains ~100 MB/s with high
  // variance and throttles local shuffles; the box has 125 GiB RAM
  "-Dspark.local.dir=/dev/shm/spark-local",
  // local mode: the forked JVM IS the whole cluster — size it like one
  // (8g starves a 32-thread run into GC thrash; box has 125g)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // whole-stage codegen emits a large compiled method per query stage; with
  // the JDK default (240m) the code cache can fill across a many-query
  // session, and a full cache silently stops JIT compilation — profiling
  // caught single trials of an unchanged plan burning 20-40x the CPU
  // (interpreted codegen) with best-trial behavior restored afterwards
  "-XX:ReservedCodeCacheSize=512m",
)
