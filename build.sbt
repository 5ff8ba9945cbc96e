ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fintechdatalakeascodespark"
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
// Pass the forked JVM's stdout through unprefixed: sbt's default logger
// prepends "[info] " to every line, which breaks line-oriented JSON
// consumers of Bench/Verify output (the bench JSON line must parse as-is).
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
// local[32] runs 32 concurrent tasks in ONE JVM: at 8g the shuffle-heavy
// bench queries were GC-bound (total dropped 23% at 24g on the 128 GiB
// bench box). But a fixed 24g default breaks JVM startup on smaller hosts,
// so derive the default from physical RAM (override with SPARK_DRIVER_MEM).
val defaultHeap: String = {
  // MemTotal line shape: "MemTotal:       131072000 kB" — parse the kB
  // figure explicitly (a blanket digit-filter would silently misread any
  // other unit) and close the file handle via Using.
  val MemTotal = """MemTotal:\s*(\d+)\s*kB""".r
  val memGb: Long =
    scala.util.Using(scala.io.Source.fromFile("/proc/meminfo")) { src =>
      src.getLines().collectFirst { case MemTotal(kb) => kb.toLong / (1024L * 1024L) }
    }.toOption.flatten.getOrElse(8L) // non-Linux: conservative default
  if (memGb >= 64) "24g" else if (memGb >= 16) "8g" else "4g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // 88 query shapes x whole-stage-codegen classes overflow the 240m JDK17
  // default late in the bench sequence; code-cache flushing then deopts
  // hot loops for a sustained window (observed round 8: l34-l36 ran 3-4x
  // slower with TIGHT min/max in the 88-query run while the same-run d01
  // sentinel was fast — a plan-independent, position-dependent slowdown).
  // Env-overridable so a matched pair at a different reserve (the round-10
  // deopt-arbitration experiment) needs no code change; Bench emits the
  // actual occupancy per query, so the artifact self-reports whether the
  // reserve was approached.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODE_CACHE", "512m")}",
)
