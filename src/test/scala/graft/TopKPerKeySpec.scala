package graft

import graft.plans.TopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom top-k operator must (a) appear in the physical plan with
  * NO SortExec (that's its reason to exist), (b) return exactly the
  * window-function formulation's rows, (c) survive repartitioning.
  */
class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def score = round(col("o_totalprice") * 100).cast("long") * 100000000L +
    (lit(100000000L) - col("o_orderkey"))

  test("plan uses TopKPerKeyExec and no Sort") {
    val df = TopK.perKey(Tables.orders(spark, TestSpark.sf0001),
      Seq("o_custkey"), score, 3)
    val plan = df.queryExecution.executedPlan.toString
    // physical nodes print with the Exec suffix stripped
    assert(plan.contains("TopKPerKey "), plan)
    assert(!plan.contains("Sort "), s"unexpected sort:\n$plan")
  }

  test("matches the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables.orders(spark, TestSpark.sf0001)
    val got = TopK.perKey(ord, Seq("o_custkey"), score, 3)
      .select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = ord.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("partition-count invariant") {
    val ord = Tables.orders(spark, TestSpark.sf0001)
    def run(parts: Int) = TopK.perKey(ord.repartition(parts),
      Seq("o_custkey"), score, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(7))
  }
}
