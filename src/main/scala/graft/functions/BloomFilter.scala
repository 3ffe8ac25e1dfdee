package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom-filter build as a native `TypedImperativeAggregate`: collapses
  * a key set (the engine's 96-bit md5-half pairs `(h1, h2)`) into an
  * `m`-bit bitset, `array<bigint>` of `m/64` words.
  *
  * The k probe positions use Kirsch–Mitzenmacher double hashing,
  * `pos_i = (h1 + i * h2) mod m` for `i = 0..k-1` — the same universal-
  * hash family the MinHash signatures use, fully deterministic and
  * reproducible from the two halves alone, so the PROBE side needs no
  * custom code at all: [[BloomFilterAgg.mightContain]] tests the k bits
  * with codegen'd built-ins (`pmod`/`element_at`/`shiftright`).
  *
  * Scale shape: the partial/merge path is word-wise OR of fixed-size
  * buffers (ObjectHashAggregate), so building over N keys is one scan +
  * one `m/64`-word reduction; the result broadcasts as ONE row. At
  * 100 TB this is the semi-join pushdown that turns "join every corpus
  * shingle against the benchmark set" into "drop 99% of corpus shingles
  * at the scan, then exact-join the survivors" — the filter's false
  * positives are removed by the exact join, so the operator's RESULT is
  * exact and the bloom is purely a bandwidth knob.
  */
case class BloomFilterAgg(h1: Expression, h2: Expression, mBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
  require(k >= 1 && k <= 16, "k must be in [1, 16]")

  private val words = mBits / 64

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  private def set(buf: Array[Long], a: Long, b: Long): Unit = {
    var i = 0
    while (i < k) {
      // floorMod: h1/h2 are 48-bit non-negative here, but stay total
      val pos = java.lang.Math.floorMod(a + i * b, mBits.toLong).toInt
      buf(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    if (a != null && b != null)
      set(buf, a.asInstanceOf[Long], b.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(words * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(h1, h2)
  override def prettyName: String = "graft_bloom"

  override def checkInputDataTypes(): TypeCheckResult =
    if (h1.dataType == LongType && h2.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments, got " +
        s"(${h1.dataType.catalogString}, ${h2.dataType.catalogString})")

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}

object BloomFilterAgg {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom",
      exprs => BloomFilterAgg(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue()),
      "scala_udf")

  /** Aggregate Column: the m-bit Bloom bitset of the (h1, h2) key set. */
  def bloom(spark: SparkSession, h1: Column, h2: Column,
      mBits: Int, k: Int): Column = {
    register(spark)
    call_function("graft_bloom", h1, h2, lit(mBits), lit(k))
  }

  /** Probe: true iff all k probe bits for (h1, h2) are set in `bf`
    * (an `array<bigint>` bitset column). Pure built-ins — codegen'd,
    * no UDF on the corpus-sized probe path.
    */
  def mightContain(bf: Column, h1: Column, h2: Column,
      mBits: Int, k: Int): Column =
    (0 until k).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))
      val word = element_at(bf, (shiftright(pos, 6) + 1).cast("int"))
      // dynamic shift via the SQL builtin (the Scala wrapper only takes
      // a static count); AND 1 is sign-safe for bit 63
      call_function("shiftright", word, pmod(pos, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === 1
    }.reduce(_ && _)
}
