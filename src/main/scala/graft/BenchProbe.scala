package graft

import org.apache.spark.sql.DataFrame

/** Scratch harness: time one named query repeatedly to find steady state.
  * Usage: runMain graft.BenchProbe <name|ref> [reps]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "ref"
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("local[32]", shufflePartitions = 32)
    val mb = sys.env.getOrElse("SPARK_GRAFT_MAXPART_MB", "8").toLong
    spark.conf.set("spark.sql.files.maxPartitionBytes", (mb << 20).toString)

    def mk(): DataFrame =
      if (name == "ref") {
        val p = Bench.prepareRefCorpus(spark)
        Bench.refWordcount12m(spark, p)
      } else SparkEntry.queries(name)(spark, sfDir)

    if (name == "refsweep") {
      // one JVM, alternating maxPartitionBytes: JIT/GC state is shared,
      // so differences are attributable to the scan split size
      val p = Bench.prepareRefCorpus(spark)
      for (i <- 1 to reps; m <- Seq(8L, 16L, 32L, 64L)) {
        spark.conf.set("spark.sql.files.maxPartitionBytes", (m << 20).toString)
        val t0 = System.nanoTime()
        Bench.refWordcount12m(spark, p).write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[probe] refsweep ${m}MB round $i: $s%.3f s")
      }
    } else for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").format("noop").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name run $i: $s%.3f s")
    }
    spark.stop()
  }
}
