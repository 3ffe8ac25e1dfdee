package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982) as a native
  * `TypedImperativeAggregate`: at most k (item, counter) pairs; any
  * item with true frequency > n/(k+1) is guaranteed present after
  * arbitrary partial/merge order (Agarwal et al. 2013 prove the
  * mergeability bound), making this the candidate-generation half of
  * the standard TWO-PHASE exact heavy-hitters pattern:
  *
  *   1. one pass: MG(k) summary -> <= k candidate items (tiny);
  *   2. one pass: EXACT counts of just the candidates, filter by the
  *      real threshold.
  *
  * Phase 2's output is exact and deterministic even though the
  * summary's counter VALUES depend on merge order — only the
  * guaranteed-superset property of the candidate SET is consumed.
  * At 100 TB this replaces a full-vocabulary groupBy with a constant
  * O(k)-state scan plus a k-item filtered recount.
  *
  * Completes the sketch surface next to [[HllDistinct]] (distinct
  * count) and [[KmvDistinct]]: distinct, quantile (built-in), and now
  * frequent items.
  */
case class MisraGries(child: Expression, k: Int = 40,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.LinkedHashMap[UTF8String, java.lang.Long]] {

  require(k >= 1 && k <= 4096, s"k must be in [1,4096], got $k")

  // values are boxed java.lang.Long ON PURPOSE: with a Scala Long value
  // type, `buf.get(miss)` auto-unboxes Java's null to 0 and a null check
  // can never fire — the absent-key branch (and with it the whole MG
  // eviction logic) would silently never run
  type Buf = java.util.LinkedHashMap[UTF8String, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      val cur = buf.get(item)
      if (cur != null) buf.put(item, java.lang.Long.valueOf(cur + 1L))
      else if (buf.size < k) {
        // retained keys need an OWNED copy: `item` is a view into a
        // buffer the upstream operator reuses, and UTF8String.clone()
        // still shares the array when the view happens to cover it
        // exactly — so copy explicitly, always
        val kb = new Array[Byte](item.numBytes())
        item.writeToMemory(kb, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
        buf.put(UTF8String.fromBytes(kb), java.lang.Long.valueOf(1L))
      }
      else {
        // the MG step: one new occurrence cancels one occurrence of
        // every tracked item (k+1 distinct items each lose one count)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove()
          else e.setValue(java.lang.Long.valueOf(e.getValue - 1L))
        }
      }
    }
    buf
  }

  /** Mergeable-summaries merge (Agarwal et al. 2013): union-add both
    * counter sets (size may reach 2k), then subtract the (k+1)-th
    * largest counter from every entry and drop the non-positive —
    * size returns to <= k and the n/(k+1) error bound is preserved
    * under ANY merge tree.
    */
  override def merge(a: Buf, b: Buf): Buf = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a.get(e.getKey)
      if (cur != null) a.put(e.getKey, java.lang.Long.valueOf(cur + e.getValue))
      else a.put(e.getKey, e.getValue)
    }
    if (a.size > k) {
      val vals = new Array[Long](a.size)
      var i = 0
      val vi = a.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(a.size - k - 1) // (k+1)-th largest
      val ai = a.entrySet().iterator()
      while (ai.hasNext) {
        val e = ai.next()
        if (e.getValue <= cut) ai.remove()
        else e.setValue(java.lang.Long.valueOf(e.getValue - cut))
      }
    }
    a
  }

  /** map<item, counter> of the summary (counter = lower bound on true
    * frequency; true frequency <= counter + n/(k+1)).
    */
  override def eval(buf: Buf): Any = {
    val keys = new Array[Any](buf.size)
    val vals = new Array[Any](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey
      vals(i) = e.getValue.longValue()
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.put(UTF8String.fromBytes(kb), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    buf
  }

  override def dataType: DataType = MapType(StringType, LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_heavy_hitters"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_heavy_hitters",
      exprs => MisraGries(exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Number].intValue()
        else 40),
      "scala_udf")

  /** MG summary of string column `c` with k counters. */
  def summary(spark: SparkSession, c: Column, k: Int = 40): Column = {
    register(spark)
    call_function("graft_heavy_hitters", c,
      org.apache.spark.sql.functions.lit(k))
  }
}
