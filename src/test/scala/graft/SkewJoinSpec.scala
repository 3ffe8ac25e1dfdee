package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew handling: a join where one key owns ~90% of rows must (a)
  * produce correct results and (b) get split by AQE's skew-join
  * optimization when thresholds are lowered to match the test scale.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("skewed join is correct and AQE splits the hot partition") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90k rows on key 0, a few on everything else
      val fact = spark.range(100000)
        .select(when(col("id") < 90000, 0L).otherwise(col("id") % 100).as("k"),
          col("id").as("v"))
      val dim = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = fact.join(dim, "k")
      // run the action through THIS queryExecution so the adaptive
      // final plan (with skew splits) is observable on it
      val n = joined.collect().length
      assert(n == 100000) // every fact row matches exactly one dim row
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark skew:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
