ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "batchprocessdplaindexspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// spark-avro is NOT in that directory (the one Spark module absent from
// this image). The engine carries a two-legged Avro source: the module
// path (sources/AvroSource) used when spark-avro is on the classpath, and
// a self-contained container reader/writer fallback (sources/AvroDirect).
// To arm the module leg, drop the matching jar into the unmanaged dir —
//   cp spark-avro_2.13-4.1.2.jar /opt/spark/jars/
// — and the conditional parity spec (AvroSpec "module path matches
// AvroDirect"), which reports `canceled` on a jar-less classpath, runs
// automatically. No build change needed beyond the file copy.
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output passes through unprefixed: the round driver parses the
// bench JSON line from stdout, and sbt's default LoggedOutput would wrap it
// as "[info] {...}" (breaking json.loads — BENCH_r01 recorded parsed:null).
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
  // The 138-query sweep generates thousands of whole-stage-codegen
  // classes; the JVM's default 240 MB code cache fills mid-sweep, the
  // JIT compiler shuts off, and everything after runs interpreted —
  // observed as end-of-sweep replays measuring SLOWER than the same
  // query in-sweep (q_lr_auc 2.2 s in-sweep vs 6.3 s replayed).
  "-XX:ReservedCodeCacheSize=1g",
)
