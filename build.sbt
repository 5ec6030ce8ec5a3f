ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "appinsightsgeneratorspark"
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
// Fast suite (<10 min even on the storm-prone host): everything except
// the handful of minutes-long exhaustive tests tagged graft.Slow (full
// 14-col powerset cube golden, all-queries smoke, randomized
// mode-equivalence). `sbt test` still runs everything.
addCommandAlias("fastTest", "testOnly * -- -l graft.Slow")
// The bench/verify driver scrapes the LAST stdout line for the JSON
// result. Two sbt behaviors break that: the "[success] Total time"
// footer printed after the forked process exits, and the "[info] "
// prefix added to forked stdout. Disable both so `runMain graft.Bench`
// ends with the bare JSON line.
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // The k=14 insights cube alone generates >240 MB of method code (one
  // projection per grouping set in the Expand, ×codegen stages): the JVM
  // default ReservedCodeCacheSize fills, the JIT shuts off ("compilation
  // disabled"), and the whole job runs interpreted — measured before this
  // bump. spark-submit deployments need the same flag on driver+executors
  // for wide grouping-set workloads.
  "-XX:ReservedCodeCacheSize=1g",
)
