package graft

import graft.functions.WindowHashExplode
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property gate for the 128-bit rolling window fingerprint behind
  * exact-substring dedup (`WindowHashExplode`): the O(1)-per-window
  * ROLL must induce exactly the same equality classes as the window
  * CONTENT — equal L-token windows always share (h1, h2) (the roll
  * never drifts from a direct recompute), and across a tiny-vocabulary
  * corpus dense in repeated windows, distinct windows never collide
  * (2^-128 per pair; any systematic roll bug — wrong roll-off power,
  * operator order — collapses whole classes and fails loudly here).
  */
class WindowHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val L = 4

  /** Reference tokenizer (engine contract: maximal [A-Za-z0-9]+ runs). */
  private def tokens(s: String): Seq[String] =
    "[A-Za-z0-9]+".r.findAllIn(s).toSeq

  test("property: fingerprint equality == window-content equality") {
    // ~tiny vocabulary + mixed separators: dense REPEATED windows (the
    // equal-content direction gets real coverage), plus casing variants
    // so near-miss windows (differing in one byte) exercise the
    // distinct direction
    val word = Gen.oneOf("a", "b", "ab", "ba", "A", "x9", "9x", "aa")
    val sep = Gen.oneOf(" ", "\t", ", ", ".", " \n")
    val docGen = for {
      n <- Gen.chooseNum(0, 30)
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(n, sep)
    } yield ws.zip(ss).map { case (w, s) => w + s }.mkString

    val docs = Gen.listOfN(120, docGen).sample.get.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    import spark.implicits._
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        WindowHashExplode.windowHashes(spark, col("text"), L)
          .as(Seq("pos", "h1", "h2")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    // oracle: the window's token sequence, straight from the regex
    val want = docs.flatMap { case (id, s) =>
      val ts = tokens(s)
      (0 to ts.size - L).map(p => (id, p.toLong) -> ts.slice(p, p + L))
    }.toMap

    assert(got.keySet == want.keySet,
      "emitted positions differ from the oracle's window positions")
    // same content => same fingerprint (roll == direct recompute)
    want.groupBy(_._2).values.foreach { grp =>
      val fps = grp.keys.map(got).toSet
      assert(fps.size == 1, s"equal windows got ${fps.size} fingerprints")
    }
    // distinct content => distinct fingerprint on this corpus
    val classes = want.groupBy(_._2).keys.size
    assert(got.values.toSet.size == classes,
      "distinct windows collided in (h1, h2)")
  }

  test("sub-L-token docs emit nothing; exactly-L emits one window") {
    import spark.implicits._
    val rows = Seq((1L, "a b c"), (2L, "a b c d"), (3L, ""), (4L, "only.three,tokens"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        WindowHashExplode.windowHashes(spark, col("text"), L)
          .as(Seq("pos", "h1", "h2")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((2L, 0L)))
  }
}
