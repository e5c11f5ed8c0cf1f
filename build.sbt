ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "citeconnectdatapipelinespark"
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
// Forked `run` inherits sbt's raw stdout instead of being re-logged with
// an `[info] ` prefix: Bench's contract is ONE machine-parseable JSON
// line on stdout, and the prefix is exactly what kept the driver's
// `parsed` field null (it looks for a line-initial `{`). Logs from the
// forked JVM go to stderr either way.
run / outputStrategy := Some(StdoutOutput)
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
  // Whole-stage-codegen class cache (STATIC conf, so set at JVM level
  // for every entry point uniformly): the default 100 entries is
  // ~50× too small for a 242-query engine — a full interleaved sweep
  // generates ~4.6k codegen units, so at the default EVERY query
  // recompiled EVERY unit on EVERY pass (measured: 4558 janino
  // compilations per warm pass, ~12 ms each ≈ 54 s/pass of pure
  // recompilation; at 20k entries a warm pass compiles ~90). The cache
  // holds generated classes for the JVM's lifetime only — nothing
  // persists across invocations; ~2.6k distinct classes ≈ tens of MB.
  "-Dspark.sql.codegen.cache.maxEntries=20000",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // dev passthrough for A/B-ing static SQL confs (e.g.
  // -Dspark.sql.codegen.cache.maxEntries=...) without touching the
  // session builders; empty by default
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
