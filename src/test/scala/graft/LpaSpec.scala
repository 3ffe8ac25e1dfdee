package graft

import graft.queries.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic synchronous label propagation: hand-traced rounds on
  * a bridged two-triangle graph, a brute-force equivalence property on
  * random graphs, and the community-vs-component split LPA exists for.
  */
class LpaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], rounds: Int = Dedup.LPA_ROUNDS)
      : Map[Long, Long] = {
    import spark.implicits._
    Dedup.lpaFromPairs(edges.toDF("a_id", "b_id"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference implementation: synchronous rounds, most frequent
    * neighbor label, ties to the smallest label. */
  private def brute(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2) }
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (n, nbrs) =>
        val freq = nbrs.groupBy(lab).map { case (l, xs) => l -> xs.size }
        val mx = freq.values.max
        n -> freq.collect { case (l, c) if c == mx => l }.min
      }
    }
    lab
  }

  test("two triangles joined by a bridge keep distinct communities") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val got = run(edges)
    // hand-traced 4 synchronous rounds: the bridge endpoints are
    // outvoted by their triangle's internal majority every round
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    assert(got === brute(edges, Dedup.LPA_ROUNDS))
    // CC would glue all six nodes into ONE component via the bridge;
    // LPA keeps two labels — the signal this operator exists for
    assert(got.values.toSet.size === 2)
  }

  test("matches the brute-force reference on random graphs") {
    val rng = new scala.util.Random(42)
    for (seed <- 1 to 5) {
      val edges = Seq.fill(25)((rng.nextLong(10), rng.nextLong(10)))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }
        .distinct
      if (edges.nonEmpty)
        assert(run(edges) === brute(edges, Dedup.LPA_ROUNDS),
          s"seed=$seed edges=$edges")
    }
  }

  test("labels are node ids from the node's own component") {
    val comp1 = Seq((1L, 2L), (2L, 3L))
    val comp2 = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val got = run(comp1 ++ comp2)
    val c1 = Set(1L, 2L, 3L)
    val c2 = Set(10L, 11L, 12L)
    got.foreach { case (n, l) =>
      if (c1(n)) assert(c1(l), s"node $n labeled across components: $l")
      else assert(c2(l), s"node $n labeled across components: $l")
    }
  }
}
