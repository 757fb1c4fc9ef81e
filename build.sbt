ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wiserspark"
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
)
// local mode = single JVM: the heap must hold all concurrent task memory.
// Tests run small corpora at local[4] — a modest heap suffices; the bench
// entrypoints (run) index 600k docs at local[8] where 8g GC-thrashes on
// map-heavy stages, so `run` defaults higher. Both honor SPARK_DRIVER_MEM.
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}"
run / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "40g")}"
// Xms = Xmx for `run` (the bench): G1 returns idle regions to the OS after
// each trial's session stop, and on a lazily-backed VM (see BASELINE.md)
// the host reclaims those frames, so the NEXT trial re-materializes them at
// ~10-25 MB/s inside its timing window. Pinning the committed heap keeps
// once-touched pages resident across all trials. Virtual commit without
// touch is free, so Verify (same config) is unaffected.
run / javaOptions += s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "40g")}"
