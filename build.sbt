ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "diagnosisextraction_mlspark"
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
// raw child stdout: the bench/verify JSON lines must reach the log
// without sbt's "[info] " logger prefix so the driver can parse them
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
// Deliberately NOT adding --add-modules=jdk.incubator.vector: it lets
// netlib's SIMD VectorBLAS load instead of F2jBLAS, but the measured
// boards said no — the MLlib fit family regressed broadly with the
// flag (ML-subset A/B 60.9 -> 66.8 s; full board q_ml_mean_roc
// 2.7 -> 13.0 s, q_ml_coefficients 3.6 -> 11.9 s, q_ml_named_importance
// 10.0 -> 20.5 s) — the incubator vector path loses to the JIT'd
// scalar fallback on this sparse-feature workload.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] needs heap for 32 concurrent tasks' shuffle/broadcast
  // buffers: 8g thrashes GC under load and timings swing 20-30x run to
  // run; the host has 128 GiB, so size generously
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
)
