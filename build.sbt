ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "memoryenginespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
scalacOptions += "-deprecation" // keep the build deprecation-clean
// The bench driver parses the LAST stdout line as the result JSON;
// sbt's "[success] Total time ..." trailer otherwise prints after the
// forked program's output and breaks that parse (two rounds of
// parsed:null). These settings remove the trailer entirely.
Global / showSuccess := false
Global / showTiming := false
// pass the forked program's stdout/stderr through verbatim instead of
// re-logging each line with an "[info] " / "[error] " prefix — the
// driver json-parses the final stdout line
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// the two keys are read by sbt's command layer, not by tasks — exclude
// them from the unused-key lint so the build stays warning-clean
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // heap pre-size, default = the max: growing a multi-ten-GB heap
  // region-by-region under allocation pressure costs tens of seconds
  // and lands on whichever query runs during the growth, reading as
  // super-linear query time (round-14 probe: the same sf2 census
  // measured 39 s with -Xms48g, 55 s in a clean growing process, and
  // 105-272 s after unrelated allocations aged the heap — the entire
  // "alpha ~2 census" signal and much of the q268 in-sweep penalty
  // class). -Xms pages lazily on Linux, so pre-sizing commits no
  // physical memory upfront; SPARK_DRIVER_XMS overrides for A/B runs.
  Seq(s"-Xms${sys.env.get("SPARK_DRIVER_XMS")
    .getOrElse(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}") ++
  // extra JVM flags for diagnosis runs (GC logs etc.), space-separated
  sys.env.get("GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
