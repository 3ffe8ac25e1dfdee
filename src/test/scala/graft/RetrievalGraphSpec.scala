package graft

import graft.queries.{Dedup, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 operators on hand-built inputs: SCAN edge structural
  * similarity, per-doc n-gram novelty, BM25 retrieval scoring.
  */
class RetrievalGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("edge jaccard: K4 edges are embedded, a bridge is not") {
    import spark.implicits._
    // K4 on 1..4 plus a pendant edge 4-5: every K4 edge (a,b) has the
    // other two clique nodes as common neighbors except those at node
    // 4, whose degree is 4
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val rows = Dedup.edgeJaccardFrom(edges.toDF("a_id", "b_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // edge (1,2): N(1)={2,3,4}, N(2)={1,3,4} -> common {3,4}=2,
    // union excl endpoints = 3+3-2-2 = 2 -> 1000
    assert(rows((1L, 2L)) == ((2L, 3L, 3L, 1000L)))
    // edge (1,4): N(4)={1,2,3,5} -> common {2,3}=2, denom 3+4-2-2=3
    assert(rows((1L, 4L)) == ((2L, 3L, 4L, 666L)))
    // bridge (4,5): N(5)={4} -> common 0, denom 4+1-2-0=3 -> 0
    assert(rows((4L, 5L)) == ((0L, 4L, 1L, 0L)))
  }

  test("edge jaccard: isolated edge is trivially fully embedded") {
    import spark.implicits._
    val rows = Dedup.edgeJaccardFrom(Seq((7L, 9L)).toDF("a_id", "b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5))
      .toMap
    // denom = 1 + 1 - 2 - 0 = 0 -> defined as 1000
    assert(rows((7L, 9L)) == 1000L)
  }

  test("edge jaccard: mega-hub is capped with the loud -1 marker") {
    import spark.implicits._
    // star: hub 0 -> 1..20 (degree 20), plus edge (1,2). With
    // maxDeg = 8 the hub is capped: its adjacency array holds 8
    // neighbors (bounded row width), deg reads the maxDeg+1 sentinel,
    // and every hub edge emits jacc_mille = -1 instead of a
    // silently-truncated estimate. Uncapped edge (1,2) stays exact.
    val edges = ((1L to 20L).map(i => (0L, i)) :+ (1L, 2L))
      .toDF("a_id", "b_id")
    val rows = Dedup.edgeJaccardFrom(edges, maxDeg = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // top-25 keeps all 21 edges here; hub edges carry the marker
    (3L to 20L).foreach { i =>
      val (da, _, jm) = rows((0L, i))
      assert(jm == -1L, s"edge (0,$i) should carry the cap marker")
      assert(da == 9L, "capped deg must read the maxDeg+1 sentinel")
    }
    // (1,2): N(1)={0,2}, N(2)={0,1} -> common {0}=1, denom 2+2-2-1=1
    assert(rows((1L, 2L)) == ((2L, 2L, 1000L)))
    // and the nbrs arrays the operator built for the hub were capped:
    // re-run the adjacency stage shape via the public API at default
    // cap to confirm the same graph is exact when uncapped
    val uncapped = Dedup.edgeJaccardFrom(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5))
      .toMap
    assert(uncapped((0L, 3L)) == 0L) // hub spoke: common 0 -> 0, not -1
  }

  test("graph_ejacc_hubcap: the gate probe exercises the capped path") {
    // star hub 0 -> 1..30 (over the HUBCAP_MAX_DEG = 8 cap) + 5-clique
    // on 1..5: the 10 clique edges are exact (common 4, denom 4 ->
    // 1000); every surviving star spoke carries the -1 marker with the
    // hub's deg reading the sentinel 9 on the hub side
    val rows = SparkEntry.queries("graph_ejacc_hubcap")(
      spark, TestSpark.sf0001).collect()
    assert(rows.length == 25)
    val (clique, spokes) = rows.partition(_.getLong(5) == 1000L)
    assert(clique.length == 10)
    assert(clique.forall(r =>
      r.getLong(2) == 4L && r.getLong(3) == 5L && r.getLong(4) == 5L))
    assert(spokes.forall(r =>
      r.getLong(0) == 0L && r.getLong(3) == 9L && r.getLong(5) == -1L))
  }

  test("ngram novelty: exact duplicate scores 0, originals 1000") {
    import spark.implicits._
    val text = "a b c d e f g h i j" // 10 tokens -> 3 distinct 8-grams
    val other = "q w e r t y u i o p"
    val docs = Seq((1L, text), (2L, other), (3L, text))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.ngramNoveltyFrom(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows(1L) == ((3L, 3L, 1000L)))
    assert(rows(2L) == ((3L, 3L, 1000L)))
    assert(rows(3L) == ((3L, 0L, 0L))) // every gram first seen in doc 1
    // a doc shorter than 8 tokens emits nothing
    val short = TextAnalysis.ngramNoveltyFrom(
      Seq((9L, "too short text")).toDF("doc_id", "text"))
    assert(short.count() == 0)
  }

  test("bm25: more query-term mass ranks higher; weights match a mirror") {
    import spark.implicits._
    // "the" and "fox" and "dog" are the three highest-df terms; doc 1
    // repeats them most
    val docs = Seq(
      (1L, "the fox the dog the fox jumps"),
      (2L, "the fox and the dog"),
      (3L, "the cat naps alone"),
      (4L, "fox dog"),
      (5L, "nothing relevant here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25From(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every scored doc hits >= 1 of the 3 query terms; scores ordered
    assert(out.map(_._3).forall(h => h >= 1 && h <= 3))
    assert(out.map(_._2).sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)))
    val byDoc = out.map(t => t._1 -> t._2).toMap
    assert(!byDoc.contains(5L)) // no query term -> not scored
    // doc 1 carries the most query-term mass at modest length
    assert(out.head._1 == 1L)
    // mirror the exact integer score for doc 4 ("fox dog", dl = 2):
    // df(the)=3 df(fox)=3 df(dog)=3 over n=5 docs, avgdl = 23/5
    // (token counts 7+5+4+2+5)
    val n = 5.0; val avgdl = 23.0 / 5.0
    def w(tf: Long, df: Long, dl: Long): Long =
      math.round(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
        (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) * 1e6)
    assert(byDoc(4L) == w(1, 3, 2) + w(1, 3, 2))
  }

  test("bm25: constructing the frame launches ZERO Spark jobs") {
    import spark.implicits._
    // the corpus size must be a broadcast 1-row agg inside the DAG, not
    // a plan-time docs.count() — a count here would charge an extra
    // corpus scan to every build (twice per txt_hybrid_retrieval)
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val counter = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val docs = Seq((1L, "a b c"), (2L, "a d")).toDF("doc_id", "text")
    spark.sparkContext.addSparkListener(counter)
    try {
      val frame = TextAnalysis.bm25From(docs) // construction only
      org.apache.spark.sql.GraftShims.waitListenerBusEmpty(spark)
      assert(jobs.get == 0,
        s"bm25From ran ${jobs.get} Spark job(s) at plan-construction " +
          "time — the corpus-size count has escaped the DAG again")
      assert(frame.count() >= 1) // and the frame still executes
    } finally spark.sparkContext.removeSparkListener(counter)
  }

  test("kcore: peeling keeps the clique, drops chains and pendants") {
    import spark.implicits._
    // K4 on 1..4 + pendant 4-5 + path 6-7-8: the 3-core is exactly K4
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (6L, 7L), (7L, 8L))
    val rows = Dedup.kcoreFromPairs(edges.toDF("a_id", "b_id"), 3, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a triangle has no 3-core: peeling it to fixpoint empties it
    val tri = Dedup.kcoreFromPairs(
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a_id", "b_id"), 3, 8)
    assert(tri.count() == 0)
  }

  test("coreness: clique members rank by density, chains and pendants at 1") {
    import spark.implicits._
    // K4 on 1..4 + pendant 4-5 + path 6-7-8: K4 nodes have coreness 3,
    // everything else 1 (h-index iterate: converges in 2 rounds here)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (6L, 7L), (7L, 8L))
    val rows = Dedup.corenessFromPairs(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 1L, 6L -> 1L, 7L -> 1L, 8L -> 1L))
    // a clique is its own (n-1)-core: K6 members all have coreness 5
    val six = (1L to 6L).combinations(2).map(p => (p(0), p(1))).toSeq
    val k6 = Dedup.corenessFromPairs(six.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k6.values.toSet == Set(5L))
    // a cycle is 2-regular: it IS its own 2-core and has no 3-core
    val ring = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val ringRows = Dedup.corenessFromPairs(ring.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ringRows.values.toSet == Set(2L))
    // a long path needs the most rounds (information travels one hop
    // per round): coreness 1 everywhere once converged
    val path = (20L until 30L).map(i => (i, i + 1))
    val pathRows = Dedup.corenessFromPairs(path.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pathRows.values.toSet == Set(1L))
  }

  test("cluster quality: cliques score dense, chains sparse, cut zero") {
    import spark.implicits._
    // disjoint K4 (1..4) and triangle (10..12) plus a path 20-21-22:
    // three CC clusters; density = 2 e / (n (n-1)) per-mille
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L), (21L, 22L))
    val docs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val rows = Dedup.clusterQualityFrom(docs, pairs.toDF("a_id", "b_id"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // CC labels are component minima: 1 = K4, 10 = triangle, 20 = path.
    // density = 2 e / (n (n-1)) per-mille; CC labels make every cut 0
    assert(rows(1L) == ((4L, 6L, 0L, 1000L, 0L)))
    assert(rows(10L) == ((3L, 3L, 0L, 1000L, 0L)))
    assert(rows(20L) == ((3L, 2L, 0L, 666L, 0L)))
  }

  test("cluster quality labeled: cross-labelset pairs yield nonzero conductance") {
    import spark.implicits._
    // K4 {1..4} plus a bridge 4-10 in the SCORED pair set, but labels
    // that put 10 in its own cluster (as a labeling derived from a
    // different pair graph would): the bridge becomes a genuine cut
    // edge, lighting the conductance path that CC-labels-over-the-
    // same-pairs structurally pins at zero (r13 verdict #3).
    // Brute force: cluster 1 = {1,2,3,4}: e_in 6 (K4), cut 1, density
    // 2*6*1000/(4*3) = 1000, conductance 1*1000 DIV (12+1) = 76.
    // Cluster 10 = {10}: e_in 0, cut 1, density 0, conductance
    // 1*1000 DIV (0+1) = 1000.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 10L))
    val docs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L))
      .toDF("doc_id", "cluster")
    val rows = Dedup.clusterQualityLabeled(docs,
        pairs.toDF("a_id", "b_id").localCheckpoint(true), labels)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(rows(1L) == ((4L, 6L, 1L, 1000L, 76L)))
    assert(rows(10L) == ((1L, 0L, 1L, 0L, 1000L)))
  }

  test("weighted sampling: deterministic top-k with strictly negative keys") {
    val out = SparkEntry.queries("pipe_sample_weighted")(
      spark, TestSpark.sf0001).collect()
    assert(out.length == 10)
    val keys = out.map(_.getLong(2))
    // key = ln(u)/w with u in (0,1): always negative, sorted desc
    assert(keys.forall(_ < 0))
    assert(keys.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // deterministic: a second run returns the identical sample
    val again = SparkEntry.queries("pipe_sample_weighted")(
      spark, TestSpark.sf0001).collect()
    assert(out.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }
}
