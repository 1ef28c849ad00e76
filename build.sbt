ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.3.0"
name := "dsqspark"
// Single source of truth for the `-v` version string: generate a tiny
// BuildInfo object from the sbt version (the reference stamps its build
// version via ldflags the same way — main.go:369-373).
Compile / sourceGenerators += Def.task {
  val f = (Compile / sourceManaged).value / "graft" / "dsq" / "BuildInfo.scala"
  IO.write(f,
    s"""package graft.dsq
       |private[dsq] object BuildInfo { val version: String = "${version.value}" }
       |""".stripMargin)
  Seq(f)
}.taskValue
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
)
run / connectInput := true
// Forked run/runMain output goes raw to this process's stdout/stderr,
// not through sbt's logger — so graft.Bench's single JSON line is
// parseable by the driver (no "[info] " decoration) and Spark's INFO
// spam isn't re-tagged "[error]". runMain resolves its ForkOptions in
// its own task scope, so scope the setting to both tasks explicitly.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
