package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent-symbol-pair Generator over the BPE segmentation encoding
  * `|s1||s2||...||sn|`: one output row `(l, r)` per adjacent symbol
  * pair — replacing the hot half of every BPE training round,
  *
  *   explode(transform(sequence(1, size(sy)-1),
  *     i -> named_struct('l', sy[i-1], 'r', sy[i])))
  *   where sy = split(trim(seg, "|"), "\\|\\|")
  *
  * which paid a java.util.regex split + String[] allocation + an
  * INTERPRETED higher-order transform (ArrayTransform has no codegen)
  * per vocab row per round, ~143 rounds deep at the bpe_deep200
  * regime. Symbols are concatenations of `[A-Za-z0-9]` token bytes
  * (segInit splits TokenizeExplode output), so '|' can never occur
  * INSIDE a symbol and the maximal runs of non-'|' bytes are exactly
  * the split's non-empty fields; adjacent runs are the adjacent pairs.
  * Words with fewer than 2 symbols emit nothing (the `size(sy) >= 2`
  * filter, for free). Emitted strings are zero-copy slices, the same
  * UTF8String values the Column formulation produced — pair counts,
  * and therefore the merge table, are bit-identical (BpeSpec pins
  * batched == sequential; the txt_bpe_* oracles pin the values).
  *
  * CodegenFallback breaks the stage only at the Generate operator
  * (same trade as [[TokenizeExplode]], which measured ~4x on the
  * regex it replaced); the agg above stays codegen'd.
  */
case class BpePairExplode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(
    StructField("l", StringType, nullable = false) ::
    StructField("r", StringType, nullable = false) :: Nil)

  override def prettyName: String = "graft_bpe_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val s = v.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val n = bytes.length
    new Iterator[InternalRow] {
      private var i = 0
      private var prev: UTF8String = _
      private var nextRow: InternalRow = _
      private def advance(): Unit = {
        nextRow = null
        while (i <= n && nextRow == null) {
          // skip delimiter bytes
          while (i < n && bytes(i) == '|') i += 1
          if (i >= n) { i = n + 1 }
          else {
            val start = i
            while (i < n && bytes(i) != '|') i += 1
            val sym = UTF8String.fromBytes(bytes, start, i - start)
            if (prev != null)
              nextRow = new GenericInternalRow(Array[Any](prev, sym))
            prev = sym
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow
        advance()
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpePairExplode {

  /** Idempotent registration; SQL-callable as `graft_bpe_pairs(seg)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bpe_pairs", exprs => BpePairExplode(exprs.head), "scala_udf")

  /** Generator Column: one `(l, r)` row per adjacent symbol pair. */
  def pairs(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("graft_bpe_pairs", c)
  }
}
