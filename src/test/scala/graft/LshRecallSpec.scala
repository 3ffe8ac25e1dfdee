package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Recall floor for the banded-LSH near-dup pipeline against exact
  * PPJoin ground truth (see Dedup.lshRecallFrom). The corpus is seeded
  * and the minhash permutations are hash-derived, so the measured
  * recall is DETERMINISTIC — the floor guards against a semantic
  * regression in banding/signature code, not against sampling noise.
  */
class LshRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("LSH recall >= 0.8 on seeded twins; guard drops nothing here") {
    // 40 vocabulary-disjoint base docs of 50 tokens; the first 20 get
    // a planted twin sharing tokens 1..47 (both sides have 48 word
    // trigrams, 45 shared -> exact J = 45/51 ~ 0.882, comfortably
    // above the banding S-curve midpoint of ~0.63). Ground truth at
    // t = 1/2 is exactly the 20 planted pairs; disjoint vocabularies
    // mean zero cross-pairs.
    val docs = (0 until 40).flatMap { i =>
      val base = (0 until 50).map(k => s"w${i}x$k")
      val twin = base.take(47) ++ (0 until 3).map(k => s"t${i}x$k")
      val b = (i.toLong, base.mkString(" "))
      if (i < 20) Seq(b, (1000L + i, twin.mkString(" "))) else Seq(b)
    }.toDF("doc_id", "text")
    val r = Dedup.lshRecallFrom(docs).collect()(0)
    assert(r.getLong(0) == 20L, s"ground-truth pair count: $r")
    assert(r.getLong(5) >= 800L, s"candidate recall below floor: $r")
    assert(r.getLong(6) >= 800L, s"post-estimate recall below floor: $r")
    // no family exceeds the 10k bucket cap, so the guard must be free
    // in candidates too: unguarded run finds the identical set
    val ung = Dedup.lshRecallFrom(docs, Int.MaxValue).collect()(0)
    assert(ung.getLong(1) == r.getLong(1), s"guard dropped candidates: $r vs $ung")
  }
}
