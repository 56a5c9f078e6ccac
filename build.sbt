ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "omaspark"
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
// Forked `sbt run` output goes straight to stdout, NOT through sbt's
// logger: the driver parses Bench's one-line JSON from stdout and the
// `[info] ` prefix broke its extraction in round 1 (BENCH_r01.json
// "parsed": null).
run / outputStrategy := Some(StdoutOutput)
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
  // Sort shuffle writer everywhere: the bypass-merge writer opens one file
  // per reduce partition per map task, and at local shuffle widths (32)
  // filesystem latency dominated every small shuffle (A/B: a 1M-row
  // groupBy 0.38 s -> 0.17 s). Clusters with wide shuffles (> 200 reduce
  // partitions) never used the bypass writer, so this only changes the
  // small-shuffle regime.
  "-Dspark.shuffle.sort.bypassMergeThreshold=1",
  // local[N] default: shuffle blocks never cross a NIC (loopback + local
  // disk), so lz4 framing is pure CPU overhead (A/B: minhash_lsh 1.32 ->
  // 0.84 s, span_dup 1.56 -> 1.37 s, others flat). A network deployment
  // sets SPARK_GRAFT_SHUFFLE_COMPRESS=true (and prefers zstd) — see
  // OPTIMIZATION_r06.md.
  s"-Dspark.shuffle.compress=${sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "false")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
