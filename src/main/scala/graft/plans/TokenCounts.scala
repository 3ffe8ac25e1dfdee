package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.{col, count => fcount, lit, sum}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused tokenize + partial-count physical operator: the reference's
  * entire worker pipeline (scan range -> FSM -> upsert into a count map,
  * /root/reference/src/main.c:192-269 + chash.c:100-153) as ONE
  * SparkPlan. Emits per-partition partial (word, cnt) pairs; the final
  * merge is ordinary `groupBy(word).sum` — i.e. the reference's shared
  * concurrent hash map is replaced by Spark's shuffle, with this
  * operator playing the role of one worker thread per partition.
  *
  * vs. the generator formulation (TokenizeExplode -> HashAggregate):
  * no per-token row hop through Generate — a 12M-token partition emits
  * ~|vocab| partial rows instead of 12M generated rows. Mirrors the
  * reference's key-copy discipline: the probe key is a zero-copy slice
  * of the scan buffer; bytes are copied only on first insert
  * (chash.c:163-165).
  */
case class TokenCounts(text: Expression, child: LogicalPlan,
    // constructor param (not a val body) so exprIds survive tree copies
    output: Seq[Attribute] = Seq(
      AttributeReference("word", StringType, nullable = false)(),
      AttributeReference("cnt", LongType, nullable = false)()))
  extends UnaryNode {
  // this node *produces* its output (generator-style), nothing passes through
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildInternal(newChild: LogicalPlan): TokenCounts =
    copy(child = newChild)
}

case class TokenCountsExec(text: Expression, output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  @inline private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  override protected def doExecute(): RDD[InternalRow] = {
    val textExpr = text
    val childOutput = child.output
    child.execute().mapPartitions({ rows =>
      val bound = BindReferences.bindReference(textExpr, childOutput)
      val counts = new java.util.HashMap[UTF8String, Array[Long]](1 << 15)
      rows.foreach { row =>
        val s = bound.eval(row).asInstanceOf[UTF8String]
        if (s != null) {
          val bytes = s.getBytes
          val n = bytes.length
          var i = 0
          var tokStart = -1
          while (i <= n) {
            val isWord = i < n && isWordByte(bytes(i))
            if (isWord && tokStart < 0) tokStart = i
            else if (!isWord && tokStart >= 0) {
              // zero-copy probe; copy key bytes only on first insert
              val probe = UTF8String.fromBytes(bytes, tokStart, i - tokStart)
              val cell = counts.get(probe)
              if (cell == null)
                counts.put(UTF8String.fromBytes(
                  java.util.Arrays.copyOfRange(bytes, tokStart, i)), Array(1L))
              else cell(0) += 1
              tokStart = -1
            }
            i += 1
          }
        }
      }
      import scala.jdk.CollectionConverters._
      // emit UnsafeRows (downstream agg/exchange consume without
      // per-row conversion); projection buffer is safely reused
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(Array[org.apache.spark.sql.types.DataType](StringType, LongType))
      val out = new GenericInternalRow(2)
      counts.entrySet().iterator().asScala.map { e =>
        out.update(0, e.getKey)
        out.update(1, e.getValue()(0))
        proj(out): InternalRow
      }
    }, preservesPartitioning = false)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TokenCountsExec =
    copy(child = newChild)
}

object TokenCountsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case tc @ TokenCounts(text, child, out) =>
      TokenCountsExec(text, out, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TokenCounts {

  def register(spark: SparkSession): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!ss.experimental.extraStrategies.contains(TokenCountsStrategy))
      ss.experimental.extraStrategies =
        ss.experimental.extraStrategies :+ TokenCountsStrategy
  }

  /** Per-partition partial token counts of `textCol`. */
  def partialCounts(df: DataFrame, textCol: Column): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val withText = df.select(textCol.as("__graft_text"))
    val plan = withText.queryExecution.analyzed
    GraftShims.ofRows(spark,
      TokenCounts(plan.output.find(_.name == "__graft_text").get, plan))
  }

  /** Full fused word count: partials -> merge -> bytewise order. */
  def counts(df: DataFrame, textCol: Column): DataFrame =
    partialCounts(df, textCol)
      .groupBy("word")
      .agg(sum("cnt").as("cnt"))
      .orderBy("word")
}
