package graft

import graft.queries.{Dedup, Similarity, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-14 extension operators, checked on
  * constructed inputs where the property is decidable by hand (the
  * driver's DuckDB gate pins engine parity; these pin the MEANING).
  */
class Round14ExtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("MMR pick 2 prefers the diverse candidate over the near-duplicate of pick 1") {
    // Query 0 = x-axis. Candidate 10 is the clear top hit; candidate
    // 11 is 1 degree away from it (a near-duplicate); candidate 12 has
    // the SAME relevance as 11 but sits on the other side of the
    // query. Plain top-k ranks (10, 11, ...) — 11 by the vec_id tie
    // rule. MMR's diversity penalty (sim(11,10) = cos 1 deg ~ 1 vs
    // sim(12,10) = cos 51 deg ~ 0.63) must flip pick 2 to 12.
    def unit(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f)
    }
    val e = Seq(
      (0L, Array(1f, 0f, 0f), 0),
      // the other probe slots point away so they never rank
      (1L, Array(-1f, 0f, 0f), 0),
      (2L, Array(-1f, 0.1f, 0f), 0),
      (3L, Array(-1f, -0.1f, 0f), 0),
      (4L, Array(-1f, 0f, 0.1f), 0),
      (10L, unit(25), 1),
      (11L, unit(26), 1),
      (12L, unit(-26), 1)
    ).toDF("vec_id", "embedding", "label")
    val picks = Similarity.mmrRerankFrom(spark, e)
      .filter($"q_id" === 0L)
      .orderBy("pick")
      .select("pick", "vec_id").as[(Long, Long)].collect().toList
    assert(picks.take(2) == List((1L, 10L), (2L, 12L)),
      s"expected diverse pick 2, got $picks")
  }

  test("harmonic centrality on a path graph matches the hand computation") {
    // path 1-2-3-4-5, every node a seed (BFS_SEEDS covers all):
    // harm(3) = 2/1 + 2/2 = 3e6 (the center), harm(1) = 1/1 + 1/2 +
    // 1/3 + 1/4 = 2,083,333 in floored per-term integer arithmetic
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a_id", "b_id")
    val rows = Dedup.harmonicFromPairs(pairs)
      .select("doc_id", "n_seeds_reached", "harmonic_e6")
      .as[(Long, Long, Long)].collect().toList
    assert(rows.head == ((3L, 4L, 3000000L)), rows.toString)
    val h1 = rows.find(_._1 == 1L).get
    assert(h1 == ((1L, 4L, 1000000L + 500000L + 333333L + 250000L)),
      rows.toString)
  }

  test("PII Luhn verdicts match an out-of-band checksum of the injected numbers") {
    // doc_ids divisible by 3 get a card "4" + lpad15(id * 7919); the
    // operator's HOF fold must agree with a plain Scala Luhn on every
    // constructed number — validity is emergent, not planted
    def luhnValid(num: String): Boolean = {
      val digits = num.map(_ - '0')
      val sum = digits.reverse.zipWithIndex.map { case (d, i) =>
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      sum % 10 == 0
    }
    val ids = Seq(3L, 6L, 9L, 12L, 15L, 18L, 21L, 24L, 27L, 30L)
    val expectValid = ids.count { id =>
      luhnValid("4" + ("%015d".format(id * 7919)))
    }
    val docs = ids.map(id => (id, "plain words only")).toDF("doc_id", "text")
    val r = TextAnalysis.piiScanFrom(docs).collect().head
    assert(r.getAs[Long]("n_card") === ids.size.toLong)
    assert(r.getAs[Long]("n_card_luhn_valid") === expectValid.toLong,
      s"expected $expectValid valid, got $r")
  }

  test("dataset diff reconciles: added + removed + changed + unchanged cover both releases") {
    val sf = "/root/testdata/sf0.001"
    val r = SparkEntry.queries("pipe_dataset_diff")(spark, sf).collect().head
    val (add, rem, chg, same) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))
    val docs = Tables.documents(spark, sf)
    val nPrev = docs.filter($"doc_id" % 7 =!= 0).count()
    val nCur = docs.filter($"doc_id" % 5 =!= 0).count()
    assert(add + chg + same === nCur, r.toString)
    assert(rem + chg + same === nPrev, r.toString)
    assert(chg > 0 && add > 0 && rem > 0, r.toString)
  }
}
