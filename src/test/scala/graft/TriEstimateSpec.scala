package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graph_tri_estimate's DOULION edge-sampled estimator
  * (Dedup.triEstimateFrom): (1) with mod = 1 the "sample" is the whole
  * graph and the estimate must equal the EXACT triangle total — the
  * k^3 arithmetic and the DIV-3 per-node-to-total reduction proven
  * against trianglesFromPairs on the real pair graph; (2) the md5
  * sample is deterministic and partition-count invariant, so re-runs
  * (and the DuckDB oracle) keep identical edges; (3) hand-graph
  * arithmetic: a known clique through a mod that keeps every edge.
  */
class TriEstimateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairsOf(docsDir: String) =
    graft.queries.Dedup.minhashPairsFrom(
      graft.Tables.documents(spark, docsDir), ordered = false)
      .select("a_id", "b_id")

  test("mod=1 estimate equals the exact triangle total") {
    val pairs = pairsOf(TestSpark.sf0001).localCheckpoint(true)
    val exact = graft.queries.Dedup.trianglesFromPairs(pairs)
      .agg(expr("coalesce(sum(n_tri), 0) DIV 3").as("t"))
      .collect()(0).getAs[Long]("t")
    val row = graft.queries.Dedup.triEstimateFrom(pairs, mod = 1)
      .collect()(0)
    assert(exact > 0, "sf0.001 pair graph unexpectedly triangle-free")
    assert(row.getAs[Long]("n_tri_sampled") == exact)
    assert(row.getAs[Long]("tri_estimate") == exact,
      s"mod=1 estimate ${row.getAs[Long]("tri_estimate")} != exact $exact")
  }

  test("sampled edge set is deterministic and partition invariant") {
    val pairs = pairsOf(TestSpark.sf0001)
    val a = graft.queries.Dedup.triEstimateFrom(pairs).collect()(0)
    val b = graft.queries.Dedup.triEstimateFrom(pairs.repartition(7))
      .collect()(0)
    assert(a == b, s"estimate rows differ across partitionings: $a vs $b")
    // and k^3 arithmetic holds on whatever the sample contains
    val mod = graft.queries.Dedup.TRI_EST_MOD
    assert(a.getAs[Long]("tri_estimate") ==
      a.getAs[Long]("n_tri_sampled") * mod * mod * mod)
  }

  test("hand clique: K5 kept whole under mod=1 counts C(5,3)=10") {
    import spark.implicits._
    val k5 = (for {
      a <- 0L to 4L; b <- (a + 1) to 4L
    } yield (a, b)).toDF("a_id", "b_id")
    val row = graft.queries.Dedup.triEstimateFrom(k5, mod = 1).collect()(0)
    assert(row.getAs[Long]("n_edges_kept") == 10L)
    assert(row.getAs[Long]("n_tri_sampled") == 10L)
    assert(row.getAs[Long]("tri_estimate") == 10L)
  }
}
