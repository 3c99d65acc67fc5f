ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "arrowexperimentsspark"
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
// The driver parses graft.Bench's one-line stdout JSON out of the sbt
// invocation's output. sbt's default LoggedOutput strategy for forked
// runs re-emits the child's stdout as "[info] {...}" and stderr as
// "[error] ...", and appends "[success] Total time..." — decoration
// that defeated the driver's parser in rounds 3 and 4 (BENCH_r0{3,4}
// .json parsed:null). StdoutOutput passes the forked JVM's stdout and
// stderr through verbatim, and showSuccess drops the trailing banner,
// so the bench JSON is the LAST, undecorated stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  "-Duser.timezone=UTC",
  // TCP_NODELAY for the JDK HttpServer, set before ANY class init so
  // ArrowHttpServer's lazy fallback can never lose the ServerConfig
  // static-init race (r12 ADVICE; Nagle stalls measured ~65 ms/request)
  "-Dsun.net.httpserver.nodelay=true",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
