package graft

import graft.operators.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout: every output file must cover a tight rectangle in
  * (x, y) space — quantified against a one-key sorted layout, whose
  * files are thin full-width stripes (perfect on x, useless on y).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("interleave16 is monotone in each dimension and bit-exact") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 65535L),
        (5L, 3L))
      .toDF("x", "y")
      .select(ZOrder.interleave16(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // morton(5=101b, 3=011b): x bits at even slots, y at odd:
    // z = 1*1 + 1*8(y bit1... ) compute: x=101 -> bits0,2; y=011 -> bits0,1
    // z bits: x0->0, y0->1, x1->2(0), y1->3, x2->4 => 1 + 2 + 8 + 16 = 27
    assert(got === Seq(0L, 1L, 2L, 3L, 4294967295L, 27L))
  }

  /** per-file (min, max) boxes of (o_custkey, day) for layout `path` */
  private def fileBoxes(path: String): Array[(Long, Long, Long, Long)] = {
    import spark.implicits._
    spark.read.parquet(path)
      .withColumn("f", input_file_name())
      .withColumn("day", datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"))
      .groupBy("f")
      .agg(min("o_custkey").as("x0"), max("o_custkey").as("x1"),
        min("day").as("y0"), max("day").as("y1"))
      .select($"x0", $"x1", $"y0", $"y1")
      .as[(Long, Long, Long, Long)].collect()
  }

  /** how many files a min-max-stats reader must open for a predicate
    * selecting [lo, hi] on one dimension (dim 0 = custkey, 1 = day)
    */
  private def touched(boxes: Array[(Long, Long, Long, Long)], dim: Int,
      lo: Long, hi: Long): Int =
    boxes.count { case (x0, x1, y0, y1) =>
      if (dim == 0) x1 >= lo && x0 <= hi else y1 >= lo && y0 <= hi
    }

  test("z-order prunes one-dimensional predicates on BOTH dimensions") {
    // The win over a one-key sort is BALANCE: 16 custkey-sorted stripes
    // prune custkey predicates perfectly but a date predicate touches
    // every file; a 16-file morton tiling bounds both at ~sqrt(16)/16.
    val orders = Tables.orders(spark, TestSpark.sf0001)
    val zPath = "target/zorder_test/z"
    val sPath = "target/zorder_test/s"
    ZOrder.writeZOrdered(orders, col("o_custkey"),
      datediff(col("o_orderdate"), lit("1992-01-01")), 16, zPath)
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(sPath)

    val zb = fileBoxes(zPath)
    val sb = fileBoxes(sPath)
    assert(zb.length === 16 && sb.length === 16)
    // ~10%-of-range predicates on each dimension
    val (cLo, cHi) = (700L, 850L) // custkeys run 1..~1500 at sf0.001
    val (dLo, dHi) = (1100L, 1340L) // days run 0..~2400
    val sCust = touched(sb, 0, cLo, cHi)
    val sDay = touched(sb, 1, dLo, dHi)
    val zCust = touched(zb, 0, cLo, cHi)
    val zDay = touched(zb, 1, dLo, dHi)
    // the stripe layout cannot prune the date predicate at all
    assert(sDay >= 14, s"one-key baseline unexpectedly pruned dates: $sDay")
    // morton must prune BOTH dimensions decisively
    assert(zCust <= 10, s"z-order failed to prune custkey: $zCust/16 files")
    assert(zDay <= 10, s"z-order failed to prune day: $zDay/16 files")
    assert(zDay < sDay)
    // and the layout is results-transparent
    assert(spark.read.parquet(zPath).count() === orders.count())
    assert(sCust <= 4) // sanity: the baseline really is custkey-sorted
  }
}
