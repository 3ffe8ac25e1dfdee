package graft

import graft.queries.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** PMI collocation mining: a planted always-adjacent pair outranks
  * frequent-but-independent pairs, the support floor drops rare
  * bigrams, and the micronat score matches ln computed out-of-band.
  */
class PmiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted collocation ranks first; support floor holds; score matches ln") {
    import spark.implicits._
    // "alpha beta" always adjacent (8x); "the" is everywhere, so
    // "the the" is frequent but expected under independence; a
    // 2-occurrence pair sits below the support floor
    val docs = (
      (1 to 8).map(i => (i.toLong, "the the the alpha beta the the")) ++
      Seq((9L, "rare pair the the the the the"),
          (10L, "rare pair the the the the the"))
    ).toDF("doc_id", "text")
    val got = TextAnalysis.pmiFrom(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(got.head._1 === "alpha beta", s"top bigram was ${got.head._1}")
    assert(got.head._2 === 8L)
    assert(!got.exists(_._1 == "rare pair"), "support floor must drop c12=2")

    // expected micronats: floor(ln(c12 * N / (ca * cb)) * 1e6); DetMath
    // is within 6e-16 relative of libm, so allow +-1 on the floor
    val n = 8 * 7 + 2 * 7 // total tokens
    def expected(c12: Long, ca: Long, cb: Long): Long =
      math.floor((math.log(c12.toDouble * n) - math.log(ca.toDouble * cb)) * 1e6).toLong
    val byBg = got.map(r => r._1 -> r._3).toMap
    assert(math.abs(byBg("alpha beta") - expected(8, 8, 8)) <= 1L)
    // "the the": 3 adjacent the-pairs in each of 8 docs + 4 in each of
    // 2 docs -> 32; ln(32*70/2500) < 0, so this pins the negative-PMI
    // floor path too
    val theThe = byBg("the the")
    assert(theThe < 0L)
    assert(math.abs(theThe - expected(32, 50, 50)) <= 1L)
    assert(byBg("alpha beta") > theThe, "collocation must outscore chance pair")
  }
}
