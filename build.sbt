ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bighousespark"
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
// Driver bench contract (VERDICT r19 next #1): the driver invokes
// `sbt "runMain graft.Bench"` and extracts the one-line JSON metric from
// the process stdout, but the default LoggedOutput strategy frames every
// forked line as "[info] …" — the driver's extractor has recorded
// "parsed": null in every BENCH artifact since r15 because of it.
// StdoutOutput hands the forked JVM the sbt process's own stdout/stderr,
// so Bench's println reaches the capture raw and machine-parseable.
Compile / run / outputStrategy := Some(StdoutOutput)
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
  // 24g default: at 8g the bench's 10x object-agg section GC-thrashes
  // (one 25 s outlier iteration measured); the machine has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ sys.env.get("GRAFT_JVM_EXTRA").toSeq.flatMap(_.trim.split("\\s+").toSeq)
