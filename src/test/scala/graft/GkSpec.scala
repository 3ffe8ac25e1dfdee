package graft

import graft.functions.GkQuantile
import org.scalatest.funsuite.AnyFunSuite

/** Greenwald-Khanna sketch: rank error within the ε guarantee on
  * random data, invariance of the bound under partitioning (merge
  * order), quantile monotonicity, and summary-size sublinearity.
  */
class GkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic pseudo-random doubles (no Random: reproducible)
  private val data: Vector[Double] =
    (1 to 20000).map(i => ((i * 2654435761L) % 1000003L).toDouble).toVector

  private def rankError(est: Double, phi: Double): Double = {
    val sorted = data.sorted
    val target = math.ceil(phi * data.size)
    // rank range occupied by the estimate's value
    val lo = sorted.indexWhere(_ >= est) + 1
    val hi = sorted.lastIndexWhere(_ <= est) + 1
    val dist = if (target < lo) lo - target
               else if (target > hi) target - hi
               else 0L
    dist.toDouble / data.size
  }

  private def estimate(phi: Double, parts: Int, eps: Double = 0.02): Double = {
    import spark.implicits._
    data.toDF("v").repartition(parts)
      .agg(GkQuantile.gk(spark, org.apache.spark.sql.functions.col("v"),
        eps, phi))
      .collect()(0).getDouble(0)
  }

  test("median rank error within eps on a single partition") {
    assert(rankError(estimate(0.5, 1), 0.5) <= 0.02)
  }

  test("rank error bound survives partitioned merges") {
    for (parts <- Seq(7, 32); phi <- Seq(0.1, 0.5, 0.9)) {
      val err = rankError(estimate(phi, parts), phi)
      assert(err <= 0.02, s"phi=$phi parts=$parts err=$err")
    }
  }

  test("quantile estimates are monotone in phi") {
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9).map(estimate(_, 8))
    assert(qs == qs.sorted, qs)
  }

  test("summary stays sublinear in n") {
    val buf = new GkQuantile.Buffer()
    data.foreach(v => buf.insert(v, 0.01))
    buf.compress(0.01)
    // O((1/eps) log(eps n)) at eps=0.01, n=20k -> a few hundred tuples
    assert(buf.ts.length < 2000, s"summary holds ${buf.ts.length} tuples")
    assert(buf.n == data.size)
  }

  test("exact for tiny inputs and null-safe") {
    import spark.implicits._
    val r = Seq(5.0, 1.0, 3.0).toDF("v")
      .agg(GkQuantile.gk(spark, org.apache.spark.sql.functions.col("v"),
        0.02, 0.5))
      .collect()(0).getDouble(0)
    assert(r == 3.0)
    val empty = Seq.empty[Double].toDF("v")
      .agg(GkQuantile.gk(spark, org.apache.spark.sql.functions.col("v"),
        0.02, 0.5))
      .collect()(0)
    assert(empty.isNullAt(0))
  }
}
