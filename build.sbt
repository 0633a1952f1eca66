ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataworksauditdataingestspark"
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
// Forked run output goes STRAIGHT to stdout — no "[info] " logger prefix.
// The bench/verify harness captures only the tail of stdout and parses
// the one JSON line; a logger prefix breaks a strict json.loads.
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
  // Arrow's netty-backed allocator (q102 Arrow IPC interop) wants
  // reflective access to direct buffers; spark-submit sets this too.
  "-Dio.netty.tryReflectionSetAccessible=true",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] on a 128 GiB box: a small heap makes GC dominate the heavy
  // dedup/similarity queries (observed 10x bench noise at 8g).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Whole-stage codegen makes a 273-query suite a JIT stress test
  // (~54k nmethods/run). Two knobs close x06's two-round "residual
  // bimodality" (slow reps burned 49-63 s of task CPU on the crypto
  // loops vs 11-14 s compiled — same tasks, same stages, zero GC, and
  // the flip could land BETWEEN reps inside one JVM):
  //  - 512 MB code cache: the 240 MB default runs its sweeper hot
  //    (22 s of sweeper CPU measured) and a deliberately tiny 40 MB
  //    cache reproduces the flip in isolation (rep 1 at 11 s CPU,
  //    rep 2 at 30 s after eviction evicts the hot crypto methods);
  //  - static compiler threads: JDK 17 spawns compiler threads ON
  //    DEMAND (one C2 thread existed at snapshot despite
  //    CICompilerCount=15) and that single thread measured 237 s of
  //    CPU in one suite run — a saturated compile queue, so whether
  //    the LAST queries' hot loops (x06 is dead last alphabetically)
  //    are compiled by rep time depends on queue luck. Pre-spawning
  //    the full complement removes the backlog; cores are plentiful.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:-UseDynamicNumberOfCompilerThreads",
)
