package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (dev loop only;
    // the driver always calls with exactly two args = full dump)
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Engine.builder, not an ad-hoc builder: the pinned confs (UTC TZ,
    // nanosAsLong, inferTimestampNTZ=false, AQE) must hold here too —
    // this main IS the correctness gate, and a conf drift between it
    // and the query sessions is exactly the r07 failure shape.
    val spark = Engine.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A query that fails to dump silently vanishes from the driver's
    // correctness compare (the r07 lesson: 18 queries dropped from the
    // gate with only stderr noise). Track failures and leave a
    // failed.json artifact next to the dumps so shrinkage is visible in
    // the output directory itself, then say so loudly on stdout.
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/failed.json"),
      failed.sorted.map(q(_)).mkString("[", ",", "]"))
    if (failed.nonEmpty)
      println(s"[verify] ${failed.size}/${selected.size} queries FAILED " +
        s"to dump: ${failed.sorted.mkString(", ")}")
    else
      println(s"[verify] all ${selected.size} queries dumped")
    spark.stop()
  }
}
