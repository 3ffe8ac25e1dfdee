package graft

import graft.functions.CountMinAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min Sketch: hand-computed counter matrix on a tiny sketch,
  * the one-sided bound (estimates never under-count) on a hashed
  * corpus, exactness when the width eliminates collisions, and
  * partition invariance of the merge path.
  */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def keyed(ids: Seq[Long]) = ids.toDF("id")
    .select(col("id"),
      expr("CAST(conv(substr(md5(CAST(id AS STRING)), 1, 12), 16, 10) AS BIGINT)").as("h1"),
      expr("CAST(conv(substr(md5(CAST(id AS STRING)), 13, 12), 16, 10) AS BIGINT)").as("h2"),
      lit(1L).as("cnt"))

  test("hand-computed matrix: w=4, d=2, chosen hashes") {
    // key A: (h1=1, h2=2) -> row0 bucket 1, row1 bucket (1+2)%4=3
    // key B: (h1=3, h2=1) -> row0 bucket 3, row1 bucket (3+1)%4=0
    // key C: (h1=5, h2=3) -> row0 bucket 5%4=1, row1 bucket (5+3)%4=0
    val rows = Seq((1L, 2L, 10L), (3L, 1L, 7L), (5L, 3L, 2L))
      .toDF("h1", "h2", "cnt")
    val sk = rows.agg(CountMinAgg.cms(spark,
      col("h1"), col("h2"), col("cnt"), 4, 2).as("sk"))
      .as[Seq[Long]].head()
    // row 0: [0, 10+2, 0, 7]; row 1: [7+2, 0, 0, 10]
    assert(sk === Seq(0L, 12L, 0L, 7L, 9L, 0L, 0L, 10L))

    // estimates: A = min(12, 10) = 10 (exact); C = min(12, 9) = 9 (over)
    val probes = Seq((1L, 2L, 10L), (3L, 1L, 7L), (5L, 3L, 2L))
      .toDF("h1", "h2", "exact")
    val est = probes.crossJoin(
        rows.agg(CountMinAgg.cms(spark,
          col("h1"), col("h2"), col("cnt"), 4, 2).as("sk")))
      .select(col("exact"),
        CountMinAgg.estimate(col("sk"), col("h1"), col("h2"), 4, 2).as("est"))
      .as[(Long, Long)].collect().toMap
    assert(est(10L) === 10L) // A: min(12, 10) — row1 is collision-free
    assert(est(7L) === 7L)   // B: min(7, 9) — row0 is collision-free
    assert(est(2L) === 9L)   // C collides in BOTH rows: min(12, 9) over-counts
  }

  test("one-sided: estimates never under-count, and a wide sketch is exact") {
    // 200 keys, weights = id % 13 + 1
    val data = keyed(0L until 200L)
      .withColumn("cnt", col("id") % 13 + 1)
    val narrow = data.agg(CountMinAgg.cms(spark,
      col("h1"), col("h2"), col("cnt"), 32, 4).as("sk"))
    val under = data.crossJoin(broadcast(narrow))
      .filter(CountMinAgg.estimate(col("sk"), col("h1"), col("h2"), 32, 4)
        < col("cnt"))
      .count()
    assert(under === 0L, "CMS must never under-count")

    // 2^16 buckets for 200 keys: collisions essentially impossible in
    // EVERY one of the 4 rows simultaneously -> min recovers exactly
    val wide = data.agg(CountMinAgg.cms(spark,
      col("h1"), col("h2"), col("cnt"), 65536, 4).as("sk"))
    val inexact = data.crossJoin(broadcast(wide))
      .filter(CountMinAgg.estimate(col("sk"), col("h1"), col("h2"), 65536, 4)
        =!= col("cnt"))
      .count()
    assert(inexact === 0L, "wide sketch should be exact on 200 keys")
  }

  test("merge path: sketch identical at 1 and 7 partitions") {
    val data = keyed(0L until 500L).withColumn("cnt", col("id") % 7 + 1)
    def build(parts: Int) = data.repartition(parts)
      .agg(CountMinAgg.cms(spark,
        col("h1"), col("h2"), col("cnt"), 64, 4).as("sk"))
      .as[Seq[Long]].head()
    assert(build(1) === build(7))
  }
}
