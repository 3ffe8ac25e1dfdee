package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression.
  *
  * Why a first-class op: the same user-visible text arrives from a web
  * crawl in BOTH composed ("é" U+00E9) and decomposed ("e" + U+0301)
  * forms, so every byte-keyed stage downstream — exact dedup digests,
  * MinHash shingles, group-by keys, sort order — silently treats equal
  * text as distinct unless the corpus is normalized first. NFC is the
  * W3C-recommended canonical form for exactly this purpose; running it
  * once at ingest is the cheap insurance the rest of the pipeline's
  * hash arithmetic relies on.
  *
  * Implementation: `java.text.Normalizer` (JDK, Unicode-conformant) on
  * the String path, with an `isNormalized` fast path so the dominant
  * already-NFC input (ASCII is structurally NFC) costs one scan and
  * ZERO allocation — at 100 TB nearly every row takes that branch.
  * The expression is null-intolerant (null → null via nullSafeEval)
  * and inlines into WholeStageCodegen through a static helper call, so
  * the normalize rides the scan projection like any built-in.
  *
  * The DuckDB oracle mirrors it with `nfc_normalize()` (utf8proc) —
  * both implement the same Unicode canonical composition, so outputs
  * are byte-identical.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNorm.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNorm {

  /** Static eval target shared by the interpreted and codegen paths.
    * Returns the INPUT object untouched when it is already NFC (the
    * ASCII/common case) — no String materialization, no new UTF8String.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Idempotent session registration (SQL-callable as `graft_nfc(s)`). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs(0)), "scala_udf")

  /** NFC-normalized copy of a string column. */
  def nfc(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("graft_nfc", c)
  }
}
