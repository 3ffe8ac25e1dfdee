package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Within-block pair Generator: given an `array<struct<...>>` of block
  * members, emits every unordered member pair once as two struct
  * columns `(a, b)` with `i < j` in array order — the pair-enumeration
  * step of a blocked verification join (n-gram Jaccard, edit distance).
  *
  * This replaces a blk-keyed self-join: `groupBy(blk).collect_list`
  * shuffles each member ONCE, the block-size cap becomes a free
  * `size(ms) <= cap` filter on the aggregated row (no separate
  * over-cap aggregate + anti-join), and pair fan-out happens after the
  * exchange, so the shuffle never carries quadratic data. Sort the
  * member array on a leading unique key (`array_sort` on a struct
  * orders by its first field) and the emitted `i < j` pairs are
  * exactly the `a.key < b.key` pair set, deterministically, despite
  * `collect_list`'s nondeterministic input order.
  */
case class PairExplode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private def elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def elementSchema: StructType = StructType(
    StructField("a", elemType, nullable = false) ::
    StructField("b", elemType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StructType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pairs needs array<struct<...>>, got ${other.catalogString}")
  }

  override def prettyName: String = "graft_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val w = elemType.size
    // Copy members once up front: emitted rows outlive the (reused)
    // source row buffer, and each member appears in n-1 pairs. Null
    // elements are skipped — elementSchema declares a/b non-nullable,
    // and a null member carries nothing to pair on.
    val elems = Array.tabulate[AnyRef](n)(i => arr.getStruct(i, w))
      .collect { case s: InternalRow => s.copy(): AnyRef }
    if (elems.length < 2) return Iterator.empty
    val m = elems.length
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < m - 1
      override def next(): InternalRow = {
        val r = new GenericInternalRow(Array[Any](elems(i), elems(j)))
        j += 1
        if (j >= m) { i += 1; j = i + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairExplode {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_pairs", exprs => PairExplode(exprs.head), "scala_udf")

  /** Generator Column: one (a, b) struct-pair row per unordered member
    * pair of the array, `i < j` in array order.
    */
  def pairs(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("graft_pairs", c)
  }
}
