package graft

/** Dev harness: print the formatted physical plan of one named query.
  * Usage: runMain graft.ExplainProbe <name> [sfDir]
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Engine.session("local[4]", shufflePartitions = 4)
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
