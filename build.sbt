ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hiveprocessorspark"
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
// Forward the forked JVM's stdout directly (no [info] log prefix): the
// bench/verify mains print machine-parseable JSON lines that downstream
// tooling scrapes from the captured output.
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
  // 8g forced multi-second G1 pauses mid-bench on the allocation-heavy
  // HOF/minhash queries (32 executor threads at sf0.1); the machine has
  // 128 GiB, so give the single local JVM real headroom by default.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Every Spark whole-stage-codegen compilation adds Janino classes to
  // the JVM code cache; at the default 240 MB the cache fills mid-bench
  // and UseCodeCacheFlushing evicts HOT compiled methods — stages then
  // run interpreted at ~7x CPU (observed: the same stage at 6.5s vs 47s
  // aggregate CPU, intermittently). 1 GB is reserved address space, not
  // committed memory, and makes the spikes vanish entirely.
  "-XX:ReservedCodeCacheSize=1g",
)
// One-off JIT/GC experiments (e.g. -XX:+PrintCompilation when chasing a
// compilation storm) without editing the build: space-separated flags.
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JVM")
  .toSeq.flatMap(_.split("\\s+")).filter(_.nonEmpty)
