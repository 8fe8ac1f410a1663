ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "automatic_etlspark"
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
// A deleted spec's leftover report XML must not pollute the green signal
// (a stale red file reads as a failure forever): wipe the report dir
// before every test invocation so only specs that exist in src report.
Test / testOptions += Tests.Setup { () =>
  val dir = new java.io.File("target/test-reports")
  if (dir.isDirectory) dir.listFiles().foreach(_.delete())
}
// Pass the forked process's stdout through RAW (no "[info] " prefix):
// Bench/Verify print machine-readable JSON lines that a parent process
// parses, and sbt's logged output strategy would corrupt them.
outputStrategy := Some(StdoutOutput)
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
  // local[32] = driver + 32 executor threads in ONE JVM; on this 128 GiB
  // box an 8g heap left the bench GC-bound (run-to-run variance up to
  // 2x). 48g keeps task memory + broadcast + page-cache headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:+UseG1GC",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
