package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic random walks: brute-force equivalence (same md5 mod
  * degree picks recomputed out-of-band), no dead ends, and exact
  * reproducibility across partitionings.
  */
class WalksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], parts: Int = 4)
      : Seq[(Long, Long, Long)] = {
    import spark.implicits._
    Dedup.walksFromPairs(edges.toDF("a_id", "b_id").repartition(parts))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  /** The same walk recomputed in plain Scala with MessageDigest md5. */
  private def brute(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val adj = (edges ++ edges.map(_.swap)).distinct.groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).sorted }
    def pick(start: Long, at: Long, i: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$start|$at|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val nbrs = adj(at)
      nbrs(((BigInt(hex, 16) % nbrs.size).toInt))
    }
    adj.keys.toSeq.sorted.flatMap { s =>
      var at = s
      (s, 0L, s) +: (1 to Dedup.WALK_STEPS).map { i =>
        at = pick(s, at, i); (s, i.toLong, at)
      }
    }
  }

  test("walks match the out-of-band md5 reference and never dead-end") {
    val rng = new scala.util.Random(11)
    for (seed <- 1 to 3) {
      val edges = Seq.fill(30)((rng.nextLong(15), rng.nextLong(15)))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }
        .distinct
      if (edges.nonEmpty) {
        val got = run(edges)
        assert(got === brute(edges), s"seed=$seed edges=$edges")
        // every non-isolated node yields a full-length walk
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        assert(got.size === nodes.size * (Dedup.WALK_STEPS + 1))
      }
    }
  }

  test("walks are partition-count invariant") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    assert(run(edges, parts = 1) === run(edges, parts = 7))
  }
}
