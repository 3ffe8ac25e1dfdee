package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `|A ∩ B|` of two SORTED arrays (null elements skipped) as a codegen'd two-pointer
  * merge — the exact-verification hot loop of the PPJoin similarity
  * join (ref behavior: exact set-overlap verification of candidate
  * pairs).
  *
  * `size(array_intersect(a, b))` allocates and fills a hash set PLUS
  * the materialized intersection array per evaluated ROW; on millions
  * of candidate pairs carrying ~hundreds-element shingle arrays the
  * allocation dominates the verify stage. The merge walk is
  * allocation-free, O(|a|+|b|), and stays inside WholeStageCodegen.
  * Equality is exact element equality, so the count is bit-identical
  * to `len(list_intersect(...))` in the DuckDB oracle as long as both
  * inputs are distinct and sorted with any consistent comparator
  * (`array_sort` upstream); unsorted input is a CALLER BUG and yields
  * an undercount, which is why the precondition is in the name.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  private def elemType: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if a == b && (a == StringType || a == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<string> or two array<bigint> " +
          s"arguments, got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  /** Null ELEMENTS are skipped, never counted: the function is
    * SQL-registered, so arbitrary SQL can feed nullable-element
    * arrays — dereferencing a null slot would NPE (string path) or
    * read garbage (long path). array_sort puts nulls last, so the
    * skip preserves the sorted-merge invariant on sorted input.
    * STATICALLY ELIDED when both child types carry
    * containsNull=false (every engine-built posting array does): the
    * two extra branches sit inside PPJoin's verify-leg hot loop, and
    * the plan-time type already proves them dead.
    */
  private def mayHaveNullElems: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => true
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    val checkNulls = mayHaveNullElems
    var i = 0; var j = 0; var c = 0L
    if (elemType == StringType)
      while (i < na && j < nb) {
        if (checkNulls && a.isNullAt(i)) i += 1
        else if (checkNulls && b.isNullAt(j)) j += 1
        else {
          val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
          if (cmp == 0) { c += 1; i += 1; j += 1 }
          else if (cmp < 0) i += 1
          else j += 1
        }
      }
    else
      while (i < na && j < nb) {
        if (checkNulls && a.isNullAt(i)) i += 1
        else if (checkNulls && b.isNullAt(j)) j += 1
        else {
          val cmp = java.lang.Long.compare(a.getLong(i), b.getLong(j))
          if (cmp == 0) { c += 1; i += 1; j += 1 }
          else if (cmp < 0) i += 1
          else j += 1
        }
      }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // every local MUST be ctx.freshName'd: this snippet inlines into
      // the surrounding stage's generated method, where a bare "na"
      // collides with the projection's own locals (e.g. a column NAMED
      // na) — Janino then fails the whole stage and Spark silently
      // falls back to interpreted eval
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val cmpExpr =
        if (elemType == StringType)
          s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
        else s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
      // null-skip branches only when the child TYPE admits null
      // elements — containsNull=false proves them dead at plan time
      val nullSkips =
        if (mayHaveNullElems)
          s"""if ($a.isNullAt($i)) { $i++; }
          else if ($b.isNullAt($j)) { $j++; }
          else """
        else ""
      s"""
        int $na = $a.numElements(), $nb = $b.numElements();
        int $i = 0, $j = 0; long $c = 0L;
        while ($i < $na && $j < $nb) {
          $nullSkips{
            int $cmp = $cmpExpr;
            if ($cmp == 0) { $c++; $i++; $j++; }
            else if ($cmp < 0) $i++;
            else $j++;
          }
        }
        ${ev.value} = $c;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `A ∩ B` of two SORTED `array<bigint>` columns as a codegen'd
  * two-pointer merge returning the matched VALUES (in ascending order,
  * since both inputs are sorted). The value-returning sibling of
  * [[SortedIntersectCount]], built for the adjacency-intersection
  * triangle pass: each oriented edge (u,v) needs the actual common
  * forward-neighbors N+(u) ∩ N+(v) — every element is a triangle's
  * third vertex — not just their count.
  *
  * `array_intersect(a, b)` would be value-correct on distinct inputs
  * but builds a hash set per ROW; the merge walk allocates exactly one
  * `long[]` (bounded by min(|a|,|b|), i.e. the forward degree, which
  * the degree orientation caps at O(sqrt m)) and stays inside
  * WholeStageCodegen. Unsorted input yields an undercount — caller
  * bug, same contract as SortedIntersectCount.
  */
case class SortedIntersectLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_intersect_longs"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  /** Same null-element contract as SortedIntersectCount: skipped, never
    * matched, and the branches are statically elided when both child
    * types carry containsNull=false (collect_list output always does).
    */
  private def mayHaveNullElems: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => true
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    val checkNulls = mayHaveNullElems
    val out = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      if (checkNulls && a.isNullAt(i)) i += 1
      else if (checkNulls && b.isNullAt(j)) j += 1
      else {
        val cmp = java.lang.Long.compare(a.getLong(i), b.getLong(j))
        if (cmp == 0) { out(k) = a.getLong(i); k += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName every local — this inlines into the stage's generated
      // method (see SortedIntersectCount.doGenCode for the Janino
      // collision failure mode)
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val cmp = ctx.freshName("cmp")
      val out = ctx.freshName("out")
      val nullSkips =
        if (mayHaveNullElems)
          s"""if ($a.isNullAt($i)) { $i++; }
          else if ($b.isNullAt($j)) { $j++; }
          else """
        else ""
      s"""
        int $na = $a.numElements(), $nb = $b.numElements();
        int $i = 0, $j = 0, $k = 0;
        long[] $out = new long[$na < $nb ? $na : $nb];
        while ($i < $na && $j < $nb) {
          $nullSkips{
            int $cmp = java.lang.Long.compare($a.getLong($i), $b.getLong($j));
            if ($cmp == 0) { $out[$k++] = $a.getLong($i); $i++; $j++; }
            else if ($cmp < 0) $i++;
            else $j++;
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(java.util.Arrays.copyOf($out, $k));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArraySets {

  /** Idempotent session registration (SQL-callable as
    * `graft_sorted_intersect_count(a, b)` /
    * `graft_sorted_intersect_longs(a, b)`).
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_longs",
      exprs => SortedIntersectLongs(exprs(0), exprs(1)), "scala_udf")
  }

  /** `|a ∩ b|` over two sorted, distinct, null-free array columns. */
  def sortedIntersectCount(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_sorted_intersect_count", a, b)
  }

  /** `a ∩ b` (ascending values) over two sorted, distinct, null-free
    * `array<bigint>` columns.
    */
  def sortedIntersectLongs(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("graft_sorted_intersect_longs", a, b)
  }
}
