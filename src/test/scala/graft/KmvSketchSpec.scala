package graft

import java.security.MessageDigest

import graft.functions.{KmvDistinct, KmvSketchAgg}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KmvSketchAgg (the sketch-VALUED KMV twin): the emitted synopsis must
  * be exactly the k smallest distinct md5-48 hashes, sorted ascending,
  * invariant to partitioning (merge order), and consistent with
  * KmvDistinct's scalar estimate — (k-1)*2^48/last == the estimate.
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hash48(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (0 until 6).foldLeft(0L)((h, b) => (h << 8) | (d(b) & 0xffL))
  }

  private val values: Seq[String] =
    (1 to 200).map(i => s"v${i % 73}") // dups on purpose: 73 distinct

  private def sketchOf(k: Int, parts: Int): Seq[Long] = {
    import spark.implicits._
    values.toDF("v").repartition(parts)
      .agg(KmvSketchAgg.sketch(spark, col("v"), k).as("sk"))
      .collect()(0).getSeq[Long](0)
  }

  test("synopsis = k smallest distinct hashes, sorted") {
    val expect = values.distinct.map(hash48).sorted.take(16)
    assert(sketchOf(16, 1) == expect)
  }

  test("synopsis is partition-invariant (merge order free)") {
    val one = sketchOf(16, 1)
    assert(sketchOf(16, 7) == one)
    assert(sketchOf(16, 32) == one)
  }

  test("under-full synopsis is the whole distinct hash set") {
    val expect = values.distinct.map(hash48).sorted
    assert(sketchOf(100, 5) == expect)
  }

  test("estimate consistency with KmvDistinct") {
    import spark.implicits._
    val row = values.toDF("v").agg(
      KmvSketchAgg.sketch(spark, col("v"), 16).as("sk"),
      KmvDistinct.kmv(spark, col("v"), 16).as("est")).collect()(0)
    val sk = row.getSeq[Long](0)
    val est = row.getDouble(1)
    assert(15.0 * 281474976710656.0 / sk.last.toDouble == est)
  }

  test("non-string argument fails analysis") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(1L).toDF("v")
        .agg(KmvSketchAgg.sketch(spark, col("v"), 16)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string"))
  }
}
