package graft

import graft.functions.BloomFilterAgg
import graft.queries.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-filter build/probe: no false negatives ever, false-positive
  * rate in the designed ballpark, and the decontamination wrapper's
  * results identical with the prefilter on or off.
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 1 << 16
  private val K = 7

  private def keyed(ids: Seq[Long]) = ids.toDF("id")
    .select(col("id"),
      expr("CAST(conv(substr(md5(CAST(id AS STRING)), 1, 12), 16, 10) AS BIGINT)").as("h1"),
      expr("CAST(conv(substr(md5(CAST(id AS STRING)), 13, 12), 16, 10) AS BIGINT)").as("h2"))

  test("every inserted key probes true; non-members mostly probe false") {
    val members = keyed(0L until 500L)
    val bloom = members.agg(
      BloomFilterAgg.bloom(spark, col("h1"), col("h2"), M, K).as("bf"))

    val memberHits = members.crossJoin(broadcast(bloom))
      .filter(BloomFilterAgg.mightContain(col("bf"), col("h1"), col("h2"), M, K))
      .count()
    assert(memberHits === 500L, "bloom filters must never false-negative")

    // 65536 bits / 500 keys ≈ 131 bits/key -> FP rate is tiny; allow
    // a generous margin so the test is load-out-of-the-question stable
    val strangers = keyed(1000000L until 1010000L)
    val fp = strangers.crossJoin(broadcast(bloom))
      .filter(BloomFilterAgg.mightContain(col("bf"), col("h1"), col("h2"), M, K))
      .count()
    assert(fp < 100L, s"false-positive count $fp way above design rate")
  }

  test("bloom-prefiltered decontamination equals the exact inner join") {
    val benchText = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = Seq(
      (1L, benchText),
      (2L, benchText + " with a small unique suffix appended here"),
      (3L, "completely unrelated content speaking of other matters entirely today"),
      (4L, "more filler prose that shares nothing with the benchmark sentences")
    ).toDF("doc_id", "text")
    val bench = docs.filter($"doc_id" === 1L)
    val got = Dedup.bloomContaminationFrom(docs, bench)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    val exact = Dedup.contaminationFrom(docs, bench)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    assert(got === exact)
    // and at a tiny m the exact join still kills the extra FP probes
    val tiny = Dedup.bloomContaminationFrom(docs, bench, mBits = 64, k = 2)
      .select("doc_id", "n_hit").as[(Long, Long)].collect().toMap
    assert(tiny === exact)
  }
}
