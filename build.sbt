ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreducewordoccurencesspark"
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
// Forked program output must reach stdout/stderr verbatim: the bench
// harness greps stdout for a bare one-line JSON record, and sbt's
// default LoggedOutput prefixes every line with [info]/[error].
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
// Heap sizing: honor SPARK_DRIVER_MEM but cap at 32 GiB — every workload
// here (sf<=0.1 plus the x20 scaled corpora) peaks far below that, and an
// oversized heap is actively slower: the OS commits pages lazily, so a
// 90 GiB -Xmx pays page-fault cost *inside* the first timed runs, and the
// collector's generation sizing scales with the cap. Fixing -Xms == -Xmx
// with AlwaysPreTouch moves all commit cost to JVM startup (untimed).
val graftHeap: String = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").trim.toLowerCase
  val capMb = 32L * 1024
  val reqMb = "^(\\d+)\\s*([gmk]?)b?$".r.findFirstMatchIn(req) match {
    case Some(m) =>
      val n = m.group(1).toLong
      m.group(2) match {
        case "g" | "" => n * 1024
        case "m"      => n
        case "k"      => n / 1024
      }
    case None => 8L * 1024
  }
  // floor of 1 GiB: a sub-MB request (e.g. "512k") must not integer-
  // divide down to -Xmx0m, and Spark local[32] won't start usefully
  // below ~1g anyway
  s"${math.min(math.max(reqMb, 1024L), capMb)}m"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$graftHeap", s"-Xms$graftHeap", "-XX:+AlwaysPreTouch",
  // Throughput collector: this is a batch engine (no latency SLO), and
  // G1's pause-target heuristics over-expand + over-collect on very
  // large heaps (external runners may override -Xmx upward), costing
  // ~4-10x on allocation-heavy queries until the heap settles.
  "-XX:+UseParallelGC",
)
