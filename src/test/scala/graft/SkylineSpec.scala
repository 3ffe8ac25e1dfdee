package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q_skyline's grid-cell distributed frontier (r14 verdict #5): the
  * values must be EXACTLY the classical one-window skyline (the oracle
  * keeps that SQL), while the plan's per-part windows are partitioned
  * (cell / price) — the unpartitioned window input is only the
  * constant-size per-cell aggregate.
  */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** brute-force dominance test: p survives iff no q has
    * price <= p.price AND qty >= p.qty with one strict
    */
  private def brute(rows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] =
    rows.filter { case (_, p, q) =>
      !rows.exists { case (_, p2, q2) =>
        p2 <= p && q2 >= q && (p2 < p || q2 > q) }
    }.sortBy(r => (r._2, r._1))

  /** the pre-grid one-window formulation, applied to a prepared
    * (l_partkey, price_c, qty) frame
    */
  private def oneWindow(per: DataFrame): Seq[(Long, Long, Long)] = {
    val wCheaper = Window.orderBy("price_c")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy("price_c")
    per.withColumn("best_cheaper", max("qty").over(wCheaper))
      .withColumn("best_same", max("qty").over(wSame))
      .filter((col("best_cheaper").isNull ||
          col("best_cheaper") < col("qty")) &&
        col("qty") === col("best_same"))
      .select(col("l_partkey"), col("price_c"), col("qty"))
      .orderBy("price_c", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("grid frontier equals brute force and the one-window form") {
    import spark.implicits._
    val rng = new scala.util.Random(3)
    for (trial <- 1 to 4) {
      // random per-part aggregates incl. price ties and qty ties
      val rows = (1L to 200L).map(id =>
        (id, 100L + rng.nextLong(40), 1L + rng.nextLong(60)))
      val per = rows.toDF("l_partkey", "price_c", "qty")
      val expected = brute(rows)
      assert(oneWindow(per) == expected, s"one-window form broke, trial $trial")
      val got = graft.queries.Relational.gridSkyline(per)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected, s"grid form diverges, trial $trial")
    }
  }

  test("registry q_skyline matches the one-window form at sf0.001") {
    val per = Tables.lineitem(spark, TestSpark.sf0001)
      .groupBy("l_partkey")
      .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("price_c"),
        sum("l_quantity").cast("long").as("qty"))
    val expected = oneWindow(per)
    val got = SparkEntry.queries("q_skyline")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("per-part windows are partitioned; only the cell agg is global") {
    val p = SparkEntry.queries("q_skyline")(spark, TestSpark.sf0001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the two frontier windows carry a partition column (cell / price)
    assert("windowspecdefinition\\(cell#\\d+L?,".r.findFirstIn(p).nonEmpty,
      "best-cheaper window is not cell-partitioned:\n" + p)
    assert("windowspecdefinition\\(price_c#\\d+L?,".r.findFirstIn(p).nonEmpty,
      "tie-group window is not price-partitioned:\n" + p)
    // exactly ONE unpartitioned window remains (prefix-max over the
    // SKY_CELLS-row cell aggregate: its spec STARTS with the order
    // column 'cell ASC' instead of a partition column list)
    val unpart = "windowspecdefinition\\(cell#\\d+L? ASC".r
      .findAllIn(p).size
    assert(unpart == 1,
      s"expected exactly the cell-agg prefix-max unpartitioned, got $unpart:\n" + p)
  }
}
