package graft

import graft.queries.Dedup
import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the round-5 dedup additions: PPJoin exactness,
  * incremental-probe consistency with the batch self-join, and the
  * span-dedup first-occurrence rule.
  */
class DedupExactJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Seeded corpus with planted near-dup pairs across a wide vocab. */
  private def corpus(n: Int, seed: Int = 7) = {
    val rnd = new scala.util.Random(seed)
    val docs = (0 until n).map { i =>
      val base = Seq.fill(12)(s"w${rnd.nextInt(400)}").mkString(" ")
      (i.toLong, base)
    }
    // plant near-dups: every 5th doc gets a copy with one token
    // changed. The +100001 offset flips id % 5 (0 -> 1), so planted
    // pairs CROSS the incremental test's batch/index split instead of
    // both landing in the batch (the +100000 version made that test
    // compare two empty sets).
    val dups = docs.filter(_._1 % 5 == 0).map { case (id, t) =>
      (id + 100001L, t.replaceAll("^\\S+", "w999"))
    }
    (docs ++ dups).toDF("doc_id", "text")
  }

  test("ppjoin finds EXACTLY the brute-force Jaccard >= 0.5 pair set") {
    val docs = corpus(60)
    val sets = docs
      .select(col("doc_id"), DedupOps.shingles(col("text"), 3).as("ss"))
      .filter(size(col("ss")) > 0)
    val brute = sets.as("a").crossJoin(sets.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        size(array_intersect(col("a.ss"), col("b.ss"))).cast("long").as("inter"),
        (size(col("a.ss")) + size(col("b.ss"))).cast("long").as("tot"))
      .filter(expr("3 * inter >= tot"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val pp = Dedup.ppjoinPairsFrom(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pp === brute)
    assert(pp.nonEmpty, "planted near-dups must surface")
  }

  test("ppjoin prefix pruning really prunes the candidate space") {
    // All docs share a very common tail; prefix filtering must not
    // explode on the shared (high-df) shingles.
    val docs = (0 until 300).map { i =>
        val head = (0 until 8).map(j => s"u${i}x$j").mkString(" ")
        (i.toLong, s"$head very same common trailing words here")
      }.toDF("doc_id", "text")
    // 14 tokens -> 12 shingles, only 4 shared (the all-common tail), so
    // J = 4/20 = 0.2 for every pair: nothing qualifies — and the run
    // must complete on bounded candidates, not cross 300^2 (the common
    // shingles are high-df, so the rarest-first prefix never holds them)
    assert(Dedup.ppjoinPairsFrom(docs).count() === 0L)
  }

  test("incremental probe equals the full self-join restricted to batch x index") {
    val docs = corpus(50, seed = 11)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val index = docs.filter(col("doc_id") % 5 =!= 0)
    val inc = Dedup.incrementalPairsFrom(index, batch)
      .select("new_id", "idx_id").as[(Long, Long)].collect()
      .map { case (n, i) => (math.min(n, i), math.max(n, i)) }.toSet
    val full = Dedup.minhashPairsFrom(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val crossOnly = full.filter { case (a, b) =>
      (a % 5 == 0) != (b % 5 == 0) // exactly one side in the batch
    }
    assert(crossOnly.nonEmpty, "planted pairs must cross the split")
    assert(inc === crossOnly)
  }

  test("streaming probe emits exactly the batch probe's rows") {
    val d = TestSpark.sf0001
    val stream = graft.queries.Dedup.streamProbeReplay(spark, d)
      .select("new_id", "idx_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val docs = graft.Tables.documents(spark, d)
    val batch = graft.queries.Dedup.incrementalPairsFrom(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0))
      .select("new_id", "idx_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(stream === batch)
    assert(batch.nonEmpty)
  }

  test("span dedup: an exact copy has every span duplicated, uniques none") {
    val base = (0 until 4).map(i =>
      (i.toLong, (0 until 24).map(j => s"tok${i}x$j").mkString(" ")))
    val copy = (100L, base.head._2) // exact duplicate of doc 0
    val docs = (base :+ copy).toDF("doc_id", "text")
    val out = Dedup.spanDedupFrom(docs)
      .select("doc_id", "n_spans", "n_dup_spans", "kept_mille")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 0 is first everywhere; the copy is 100% duplicate spans
    assert(out(0L)._3 === 0L && out(0L)._4 === 1000L)
    assert(out(100L)._2 === out(100L)._3 && out(100L)._4 === 0L)
    // unrelated docs have no duplicated spans
    assert(out(1L)._3 === 0L && out(2L)._3 === 0L && out(3L)._3 === 0L)
  }

  test("span dedup counts within-doc repeats as duplicates past the first") {
    // one doc whose second 8-token span repeats its first
    val span = (0 until 8).map(j => s"r$j").mkString(" ")
    val docs = Seq((1L, s"$span $span")).toDF("doc_id", "text")
    val row = Dedup.spanDedupFrom(docs).collect().head
    assert(row.getLong(1) === 2L) // two spans
    assert(row.getLong(2) === 1L) // the repeat is a dup
  }
}
