package graft

import graft.queries.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed BPE ground truth for bpeTrain (Sennrich et al.):
  * merge selection, overlap-counting convention, tie-breaking, and the
  * single-pass merge application the `|sym|` encoding guarantees.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def train(words: Seq[(String, Long)], n: Int) =
    TextAnalysis.bpeTrain(words.toDF("w", "freq"), n)

  test("merges follow weighted pair counts with (cnt desc, l, r) ties") {
    // corpus: "aaab" x2, "aab" x1
    //   round 1 pairs: (a,a) = 2*2 + 1 = 5 (overlaps count), (a,b) = 3
    //     -> merge (a,a) => 'aa'; segs: [aa,a,b] x2, [aa,b]
    //   round 2 pairs: (aa,a)=2, (a,b)=2, (aa,b)=1
    //     -> tie 2 vs 2; 'a' < 'aa' so (a,b) wins
    val m = train(Seq("aaab" -> 2L, "aab" -> 1L), 2)
    assert(m == Seq((1L, "a", "a", 5L), (2L, "a", "b", 2L)))
  }

  test("single replace pass merges left-to-right like canonical BPE") {
    // 'aaaa' under merge (a,a): left-to-right gives [aa][aa] — not
    // [a][aa][a] or a re-scan artifact
    val m = train(Seq("aaaa" -> 1L), 1)
    assert(m == Seq((1L, "a", "a", 3L))) // 3 overlapping (a,a) pairs
    val m2 = train(Seq("aaaa" -> 1L), 2)
    // after [aa][aa], round 2's only pair is (aa,aa)
    assert(m2(1) == (2L, "aa", "aa", 1L))
  }

  test("training stops when no pairs remain") {
    // single-char words have no adjacent pairs at all
    val m = train(Seq("a" -> 5L, "b" -> 3L), 4)
    assert(m.isEmpty)
  }
}
