ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dhstodatabasespark"
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
// Raw pass-through for forked run output: sbt's default LoggedOutput
// prefixes every program line with "[info] "/"[error] ", which makes the
// bench's machine-readable stdout JSON line unparseable to the driver
// (BENCH_r*.json `parsed: null` every round). StdoutOutput forwards the
// forked JVM's stdout/stderr verbatim; JVM options are unaffected.
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
  // local[32] puts driver + all 32 executor threads in ONE heap: at 8g the
  // tail of a long query sequence degrades into GC churn (measured: same
  // query 12x slower late in a 100-query run than isolated). The box has
  // 128 GiB; give the single JVM a real executor's worth.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
) ++ sys.env.get("SPARK_GRAFT_GC_LOG").map(p => s"-Xlog:gc*:file=$p").toSeq ++
  (if (sys.env.get("SPARK_GRAFT_PARALLEL_GC").contains("1")) Seq("-XX:+UseParallelGC") else Seq.empty)
