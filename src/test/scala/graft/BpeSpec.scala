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

  /** Strict one-merge-at-a-time BPE (argmax by cnt DESC, l, r; overlap
    * counting; left-to-right application) — the ground truth the
    * batched-round selection in bpeTrain must reproduce bit-exactly.
    */
  private def seqBpe(words: Seq[(String, Long)],
      nMerges: Int): Seq[(Long, String, String, Long)] = {
    var segs: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.split("").toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, Long)]()
    for (k <- 1 to nMerges if out.size == k - 1) {
      val cnts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (sy, f) =>
        sy.indices.dropRight(1).foreach { i =>
          cnts((sy(i), sy(i + 1))) = cnts.getOrElse((sy(i), sy(i + 1)), 0L) + f
        }
      }
      if (cnts.nonEmpty) {
        val ((l, r), cnt) = cnts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((k.toLong, l, r, cnt))
        segs = segs.map { case (sy, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == l && sy(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += sy(i); i += 1 }
          }
          (b.result(), f)
        }
      }
    }
    out.toSeq
  }

  test("batched rounds match sequential BPE on stress corpora") {
    // Shapes chosen to hit every batch-stop rule: created-symbol
    // dominance ("th"+"e" style), symbol sharing among top pairs,
    // (cnt, l, r) ties, a merged string colliding with a later
    // candidate's symbol, and a long flat tail that batches heavily.
    val corpora = Seq(
      // natural-ish text: early char merges interfere, tail batches
      Seq("the" -> 50L, "there" -> 30L, "then" -> 20L, "other" -> 25L,
        "hello" -> 10L, "world" -> 10L, "word" -> 8L, "sword" -> 6L,
        "quick" -> 5L, "quack" -> 4L, "thick" -> 9L, "thin" -> 7L),
      // adversarial: (a,b) merge creates "ab" while "ab"-prefixed
      // symbols compete, plus exact count ties
      Seq("abab" -> 10L, "abc" -> 10L, "cab" -> 10L, "aabb" -> 10L,
        "bbaa" -> 10L, "baba" -> 10L),
      // Zipf-ish tail over a tiny alphabet: maximal overlap pressure
      (1 to 40).map(i => ("abcde".take(1 + i % 5) * (1 + i % 3), (50 - i).toLong)),
      // single degenerate run: every round recreates (x,x) dominance
      Seq("aaaaaaaa" -> 3L, "aaab" -> 2L))
    corpora.zipWithIndex.foreach { case (c, ci) =>
      val want = seqBpe(c, 30)
      val got = train(c, 30)
      assert(got == want, s"corpus $ci diverged:\n got=$got\nwant=$want")
    }
  }

  test("batched rounds take fewer round-trips than merges on a flat tail") {
    // 60 disjoint-alphabet bigram words with strictly decreasing freqs:
    // no interference at all, so the selection must batch aggressively
    // (topK=256 covers the whole table -> a handful of rounds, not 30).
    val syms = ('a' to 'z').map(_.toString) ++ ('A' to 'Z').map(_.toString) ++
      (0 to 9).map(_.toString)
    val corpus = syms.take(60).grouped(2).zipWithIndex
      .map { case (Seq(x, y), i) => (x + y, (1000 - i).toLong) }.toSeq
    import spark.implicits._
    val (merges, rounds) = graft.queries.TextAnalysis
      .bpeTrainRounds(corpus.toDF("w", "freq"), 30)
    assert(merges == seqBpe(corpus, 30))
    assert(merges.size == 30)
    assert(rounds < 10, s"expected heavy batching, got $rounds rounds")
  }
}
