ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "echochambersdetectionspark"
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
// The driver json-parses the LAST 2000 bytes of the bench run's output.
// Forked output normally goes through sbt's logger, which prefixes every
// line with "[info] " and appends a "[success] Total time" epilogue —
// both of which have made the contract line unparseable for 7 rounds.
// StdoutOutput lets the forked JVM write raw stdout; showSuccess drops
// the epilogue. (Bench also mirrors the line to BENCH_LAST.json.)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local-mode Spark = one JVM; the heap IS the cluster memory. 8g on a
  // 128 GiB box starved the block manager (cached projections +
  // checkpointed round states + 32 concurrent task buffers) into the
  // GC-pressure regime — the full bench dropped 50 s → 42 s at 48g. The
  // default scales with physical RAM so smaller hosts aren't handed a
  // heap the OS can't back; SPARK_DRIVER_MEM always overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val memTotalGb = try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .find(_.startsWith("MemTotal"))
        .map(_.replaceAll("[^0-9]", "").toLong / (1024 * 1024))
        .getOrElse(0L)
    } catch { case _: Throwable => 0L }
    if (memTotalGb >= 96) "48g"
    else if (memTotalGb >= 32) "16g"
    else "6g"
  })}",
)
