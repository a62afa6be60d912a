ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pypondspark"
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
// Pass the forked JVM's stdout through verbatim: sbt's default logger
// prefixes every line with [info], which breaks machine parsing of the
// one-line JSON that graft.Bench prints (the driver json-parses it).
outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and drop the trailing "[success] Total time: ..." summary line, so
// the JSON line graft.Bench emits (printed after spark.stop, i.e. last)
// is the final line of stdout — parsers that read the last line work.
Global / showSuccess := false
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
  // local-mode Spark = driver-only: size the heap for the 32-thread
  // executor pool (8g caused GC-bound bench variance at local[32])
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Spark's whole-stage codegen emits hundreds of janino classes per
  // query; a 100+ query session overflows the JDK-17 default 240m code
  // cache, HotSpot stops JIT-compiling, and identical stages
  // nondeterministically run interpreted at 50-60x the CPU (measured:
  // doc_lm_score's final stage 6.4 -> 422 CPU-seconds on the same
  // rows). Size it so the JIT never turns off.
  "-XX:ReservedCodeCacheSize=1g",
)
