package graft

import graft.queries.Dedup
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Degree-ordered triangle counting: hand-pinned graphs plus a
  * brute-force equivalence property on random edge sets.
  */
class TriangleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.trianglesFromPairs(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      i <- nodes; j <- nodes if i < j; k <- nodes if j < k
      if es((i, j)) && es((j, k)) && es((i, k))
    } yield Seq(i, j, k)
    tris.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("K4 plus a path: only the clique nodes triangle") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val path = Seq((5L, 6L), (6L, 7L), (8L, 9L))
    // each K4 node sits in C(3,2) = 3 triangles; path/edge nodes in none
    assert(run(k4 ++ path) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("matches brute force on random graphs") {
    val gen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
    for (seed <- 1 to 5) {
      val edges = gen.sample.get
        .filter { case (a, b) => a != b }
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }
        .distinct
      assert(run(edges) == brute(edges), s"seed=$seed edges=$edges")
    }
  }

  /** Sequential Batagelj–Zaveršnik peel: repeatedly remove a minimum-
    * degree node; its degree at removal time (capped by the running
    * max) is its coreness. The textbook O(m) algorithm, used here as
    * the independent oracle for the h-index iterate.
    */
  private def bruteCoreness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    es.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val core = scala.collection.mutable.Map[Long, Long]()
    var k = 0L
    while (adj.nonEmpty) {
      val (v, nbrs) = adj.minBy { case (n, ns) => (ns.size, n) }
      k = math.max(k, nbrs.size.toLong)
      core(v) = k
      adj.remove(v)
      nbrs.foreach(u => if (adj.contains(u)) adj(u) = adj(u) - v)
    }
    core.toMap
  }

  test("coreness matches the sequential peel on random graphs") {
    import spark.implicits._
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
    for (seed <- 1 to 5) {
      val edges = gen.sample.get
        .filter { case (a, b) => a != b }
        .map { case (a, b) => if (a < b) (a, b) else (b, a) }
        .distinct
      if (edges.nonEmpty) {
        // rounds = 64 >> diameter of any 12-node graph: the iterate is
        // guaranteed converged, so it must equal true coreness exactly
        val got = Dedup.corenessFromPairs(edges.toDF("a_id", "b_id"),
          rounds = 64)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == bruteCoreness(edges), s"seed=$seed edges=$edges")
      }
    }
  }
}
