package graft

import graft.functions.MisraGries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property the two-phase heavy-hitters pattern consumes: every
  * item with true frequency > n/(k+1) survives the MG summary under
  * Spark's arbitrary partial/merge order.
  */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("guaranteed superset: hot items survive heavy noise across partitions") {
    // 3 hot items at ~10% each + 70k distinct noise singletons, spread
    // over 16 partitions so partial summaries must merge
    val hot = (1 to 3).flatMap(h => Seq.fill(10000)(s"hot$h"))
    val noise = (1 to 70000).map(i => s"noise$i")
    val df = spark.sparkContext
      .parallelize(scala.util.Random.shuffle(hot ++ noise), 16)
      .toDF("w")
    val summary = df
      .select(MisraGries.summary(spark, col("w"), 40).as("mg"))
      .select(explode(col("mg"))).as[(String, Long)].collect().toMap
    assert(summary.size <= 40)
    for (h <- Seq("hot1", "hot2", "hot3"))
      assert(summary.contains(h), s"$h missing from ${summary.keys}")
    // counters are lower bounds on true frequency
    for (h <- Seq("hot1", "hot2", "hot3"))
      assert(summary(h) <= 10000L)
  }

  test("rejects non-string input at analysis time") {
    spark.range(0, 10).createOrReplaceTempView("mg_typed")
    MisraGries.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_heavy_hitters(id, 8) FROM mg_typed").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
