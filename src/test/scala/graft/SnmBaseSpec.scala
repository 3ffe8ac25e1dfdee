package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused [[graft.functions.SnmBase]] byte scan bit-equal to
  * the Column formulation it replaced in sortedNeighborhoodPairsFrom
  * (r18 optimization — the 7.8 s normalize+token-set map stage):
  *
  *   k1 = substring(regexp_replace(lower(t), "[^a-z0-9]+", ""), 1, 12)
  *   k2 = substring(reverse(<same>), 1, 12)
  *   ts = array_sort(array_distinct(tokens(lower(t))))
  *
  * over inputs engineered to stress every equivalence claim: multi-byte
  * UTF-8 separators, Unicode lowercase expansions that EMIT ascii
  * (U+0130), strings shorter/longer than the 12-byte keys, duplicate
  * and unsorted tokens, empty and all-separator strings.
  */
class SnmBaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cases = Seq(
    "Hello, World! hello WORLD 42",
    "", // empty
    "!!! ---  éü世界", // separators + non-ascii only
    "ab", // shorter than the key
    "abcdefghijklmnopqrstuvwxyz0123456789", // one long token
    "The quick brown fox jumps over the lazy dog the fox",
    "İstanbul İ KK kelvin", // lower() emits ascii 'i'/'k'
    "  leading and trailing   ",
    "a1b2c3 A1B2C3 zz9 zz9 zz9",
    "café touché résumé naive",
    "x".repeat(11), "y".repeat(12), "z".repeat(13),
    "one\ttwo\nthree four five",
    "😀 emoji 7 separators 🌀 mixed",
    "9876543210 0123456789 punct,punct;punct"
  )

  test("fused struct equals the Column formulation on every stress case") {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val norm = regexp_replace(lower(col("text")), "[^a-z0-9]+", "")
    val expected = df.select(col("doc_id"),
      substring(norm, 1, 12).as("k1"),
      substring(reverse(norm), 1, 12).as("k2"),
      array_sort(array_distinct(
        graft.functions.Text.tokensLower(col("text")))).as("ts"))
    val fused = df.select(col("doc_id"),
        graft.functions.SnmBase.of(spark, lower(col("text"))).as("sb"))
      .select(col("doc_id"), col("sb.k1").as("k1"), col("sb.k2").as("k2"),
        col("sb.ts").as("ts"))
    val e = expected.orderBy("doc_id").collect()
    val f = fused.orderBy("doc_id").collect()
    assert(e.length === f.length)
    e.zip(f).foreach { case (er, fr) =>
      assert(er.getString(1) === fr.getString(1), s"k1 for ${er.get(0)}")
      assert(er.getString(2) === fr.getString(2), s"k2 for ${er.get(0)}")
      assert(er.getSeq[String](3) === fr.getSeq[String](3),
        s"ts for ${er.get(0)}: '${cases(er.getAs[Long](0).toInt)}'")
    }
  }

  test("fused scan over corpus docs matches the Column formulation") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val norm = regexp_replace(lower(col("text")), "[^a-z0-9]+", "")
    val expected = docs.select(col("doc_id"),
      substring(norm, 1, 12).as("k1"),
      substring(reverse(norm), 1, 12).as("k2"),
      array_sort(array_distinct(
        graft.functions.Text.tokensLower(col("text")))).as("ts"))
    val fused = docs.select(col("doc_id"),
        graft.functions.SnmBase.of(spark, lower(col("text"))).as("sb"))
      .select(col("doc_id"), col("sb.k1").as("k1"), col("sb.k2").as("k2"),
        col("sb.ts").as("ts"))
    assert(expected.exceptAll(fused).isEmpty && fused.exceptAll(expected).isEmpty)
  }
}
