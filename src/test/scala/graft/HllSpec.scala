package graft

import graft.functions.HllDistinct
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy + merge-semantics gate for the HLL sketch (the oracle can't
  * value-check it; this spec is its correctness story).
  */
class HllSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def estimate(n: Long, parts: Int): Long =
    spark.range(0, n, 1, parts)
      .select(HllDistinct.hll(spark, col("id").cast("string")).as("e"))
      .as[Long].head()

  test("estimate within 2% of exact across cardinality scales") {
    for (n <- Seq(100L, 1000L, 20000L, 300000L)) {
      val e = estimate(n, 8)
      val err = math.abs(e - n).toDouble / n
      // theoretical rsd at p=12 is 1.04/sqrt(4096) = 1.6%; 2.5% bound
      // keeps headroom for the linear-counting regime at small n
      assert(err <= 0.025, s"n=$n est=$e err=$err")
    }
  }

  test("estimate is partitioning-invariant (merge = elementwise max)") {
    val e1 = estimate(50000L, 1)
    val e16 = estimate(50000L, 16)
    assert(e1 === e16)
  }

  test("duplicates don't move the estimate (idempotent update)") {
    val once = spark.range(0, 5000, 1, 4)
      .select(col("id").cast("string").as("s"))
    val dup = once.union(once).union(once)
    val e1 = once.select(HllDistinct.hll(spark, col("s")).as("e")).as[Long].head()
    val e3 = dup.select(HllDistinct.hll(spark, col("s")).as("e")).as[Long].head()
    assert(e1 === e3)
  }

  test("grouped sketches see only their group") {
    val df = spark.range(0, 3000, 1, 4)
      .select((col("id") % 3).as("g"), col("id").cast("string").as("s"))
    val rows = df.groupBy("g")
      .agg(HllDistinct.hll(spark, col("s")).as("e"))
      .as[(Long, Long)].collect().toMap
    for ((_, e) <- rows) assert(math.abs(e - 1000L) < 40, s"got $e")
  }

  test("linear-counting regime is exact-ish at tiny cardinalities") {
    assert(estimate(10L, 2) === 10L)
  }
}
