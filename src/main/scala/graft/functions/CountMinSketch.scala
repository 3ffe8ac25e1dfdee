package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min Sketch (Cormode & Muthukrishnan 2005) as a native
  * `TypedImperativeAggregate`: a `d x w` counter matrix flattened into
  * one `array<bigint>` row, fed with weighted keys `(h1, h2, cnt)`.
  *
  * Row `i`'s bucket for a key is Kirsch–Mitzenmacher double hashing,
  * `pos_i = (h1 + i * h2) mod w` — the same universal family the Bloom
  * filter and MinHash signatures use, fully deterministic from the two
  * md5 48-bit halves, so both the PROBE side
  * ([[CountMinAgg.estimate]]: `least` over `d` `element_at` lookups,
  * pure codegen'd built-ins) and the DuckDB oracle (bucket sums +
  * `min`) reproduce every estimate bit-for-bit. Approximate operator,
  * exact gate — the same contract as the KMV estimates.
  *
  * Guarantees (per-key, deterministic given the data): the estimate
  * never under-counts (`est >= true count`, every counter a key
  * touches absorbs all of its weight), and over-counts only by hash
  * collisions — `est <= true + 2N/w` per row with probability
  * `1 - (1/2)^d` over the hash draw (Markov on the `N/w` expected
  * collision mass per counter).
  *
  * Scale shape: the buffer is a constant `d*w` longs regardless of
  * input size; partial/merge is elementwise add of fixed-size arrays
  * through the standard ObjectHashAggregate path, so a 100 TB key
  * stream collapses to one `8*d*w`-byte row in a single pass — the
  * mergeable-summaries alternative to an exact `groupBy` when only
  * point-frequency estimates (heavy-hitter triage, frequency caps,
  * per-key rate limits) are needed downstream.
  */
case class CountMinAgg(h1: Expression, h2: Expression, cnt: Expression,
    w: Int, d: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(w > 0, "w (sketch width) must be positive")
  require(d >= 1 && d <= 8, "d (sketch depth) must be in [1, 8]")

  private val cells = d * w

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    val c = cnt.eval(input)
    if (a != null && b != null && c != null) {
      val ha = a.asInstanceOf[Long]
      val hb = b.asInstanceOf[Long]
      val n = c.asInstanceOf[Long]
      var i = 0
      while (i < d) {
        // floorMod: md5 halves are 48-bit non-negative, but stay total
        val pos = java.lang.Math.floorMod(ha + i * hb, w.toLong).toInt
        buf(i * w + pos) += n
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(cells * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(cells)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(h1, h2, cnt)
  override def prettyName: String = "graft_cms"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three BIGINT arguments, got " +
        children.map(_.dataType.catalogString).mkString("(", ", ", ")"))

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(h1 = newChildren(0), h2 = newChildren(1), cnt = newChildren(2))
}

object CountMinAgg {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cms",
      exprs => CountMinAgg(exprs(0), exprs(1), exprs(2),
        exprs(3).eval().asInstanceOf[Number].intValue(),
        exprs(4).eval().asInstanceOf[Number].intValue()),
      "scala_udf")

  /** Aggregate Column: the flattened `d x w` CMS counter matrix of the
    * weighted `(h1, h2, cnt)` key stream.
    */
  def cms(spark: SparkSession, h1: Column, h2: Column, cnt: Column,
      w: Int, d: Int): Column = {
    register(spark)
    call_function("graft_cms", h1, h2, cnt, lit(w), lit(d))
  }

  /** Point-frequency estimate: `min` over the d counters the key maps
    * to. Pure built-ins — codegen'd, no UDF on the probe path.
    */
  def estimate(sk: Column, h1: Column, h2: Column, w: Int, d: Int): Column =
    least((0 until d).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2, lit(w.toLong))
      element_at(sk, (lit(i.toLong * w) + pos + 1L).cast("int"))
    }: _*)
}
