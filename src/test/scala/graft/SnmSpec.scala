package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Sorted-neighborhood blocking (Hernández-Stolfo multi-pass SNM) and
  * the round-14-extension event-analytics invariants.
  */
class SnmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  /** k1 2-char block prefix as sortedNeighborhoodPairsFrom derives it. */
  private def blk1(text: String): String =
    text.toLowerCase.replaceAll("[^a-z0-9]+", "").take(2)

  test("multi-pass SNM: reversed-key pass catches the boundary pair the forward pass cannot see") {
    // Pair (1, 2): identical 12+-char normalized PREFIX -> same forward
    // block, adjacent in the pass-1 sort. Pair (3, 4): first token
    // differs ('aaa' vs 'qqq' -> forward blocks "aa" vs "qq" — pass 1
    // can never bucket them together) but the normalized SUFFIX is
    // identical for 16 chars, so the reversed-text pass sorts them
    // adjacent. Filler docs give every block rank-window company
    // without coming within Jaccard range.
    val docs = Seq(
      (1L, "zzcommon report alpha beta gamma delta"),
      (2L, "zzcommon report alpha beta gamma epsilon"),
      (3L, "aaa alpha beta gamma delta epsilon zeta"),
      (4L, "qqq alpha beta gamma delta epsilon zeta"),
      (5L, "aardvark population census results winter"),
      (6L, "quarterly earnings diverge sharply downward"),
      (7L, "zebra crossing paint maintenance schedule")
    ).toDF("doc_id", "text")
    // precondition of the scenario: the boundary pair's forward blocks
    // really differ (else this test would stop proving multi-pass)
    assert(blk1("aaa alpha") !== blk1("qqq alpha"))
    val pairs = Dedup.sortedNeighborhoodPairsFrom(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"forward-pass pair missing: $pairs")
    assert(pairs.contains((3L, 4L)), s"reversed-pass pair missing: $pairs")
    // the filler docs are not near-duplicates of anything
    assert(!pairs.exists(p => p._1 >= 5L || p._2 >= 5L), s"spurious: $pairs")
  }

  test("SNM verification floor: candidates below 300 per-mille Jaccard are dropped") {
    // adjacent in the sort (shared 12-char prefix) but token sets far
    // apart -> candidate generated, verification must reject it
    val docs = Seq(
      (1L, "sharedprefix alpha beta gamma"),
      (2L, "sharedprefix delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    assert(Dedup.sortedNeighborhoodPairsFrom(docs).count() === 0L)
  }

  test("attribution credit reconciles: linear and last-touch sums agree to the cent") {
    // Both schemes distribute each attributed purchase's full pool
    // exactly once — last-touch gives it to one touch, linear splits
    // cents DIV n with the remainder on the last touch. If the
    // remainder handling ever drifts, the two totals diverge.
    val out = SparkEntry.queries("ev_attribution")(spark, SF)
      .selectExpr("sum(last_cents) AS l", "sum(linear_cents) AS n")
      .collect().head
    assert(out.getLong(0) > 0L)
    assert(out.getLong(0) === out.getLong(1),
      s"last=${out.getLong(0)} linear=${out.getLong(1)}")
  }

  test("RFM quintile scores partition every user into 1..5 per metric") {
    val seg = SparkEntry.queries("ev_rfm")(spark, SF).collect()
    val users = Tables.events(spark, SF)
      .select("user_id").distinct().count()
    assert(seg.map(_.getLong(3)).sum === users)
    for (r <- seg; i <- 0 to 2) {
      val q = r.getLong(i)
      assert(q >= 1 && q <= 5, s"quintile out of range: $r")
    }
  }

  test("MAD outlier counts stay within their per-type totals") {
    val rows = SparkEntry.queries("ev_anomaly_mad")(spark, SF).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, mad, out) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(out >= 0 && out < n, s"outliers out of range: $r")
      assert(mad >= 0, s"negative MAD: $r")
    }
  }
}
