package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator custom plan: top-k rows per key by a long score,
  * WITHOUT a full per-partition sort.
  *
  * The built-in formulation (`row_number().over(partitionBy(key)
  * .orderBy(score)) <= k`) sorts every group entirely — O(n log n) per
  * key and a mandatory SortExec — to keep only k rows. This operator
  * keeps a bounded k-heap per key (O(n log k), no sort operator), the
  * textbook physical win when k << group size (top-k per user over
  * billions of events).
  *
  * Pieces (SURVEY §4.3 ladder, rung (c)):
  *  - [[TopKPerKey]]      logical UnaryNode (keys, score attr, k)
  *  - [[TopKPerKeyExec]]  physical operator: declares
  *                        ClusteredDistribution(keys) so EnsureRequirements
  *                        inserts the hash exchange, then per-partition
  *                        bounded heaps grouped by key
  *  - [[TopKStrategy]]    SparkStrategy mapping logical -> physical,
  *                        injected via GraftExtensions (or ad-hoc through
  *                        [[TopK.perKey]] which registers it on demand)
  *
  * Determinism contract: the score must be a UNIQUE long per row within
  * its key (callers encode tie-breaks into the score — see
  * `q_topk_per_key`); output row order within a partition is then
  * well-defined (descending score).
  */
case class TopKPerKey(keys: Seq[Expression], score: Expression, k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], score: Expression, k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val scoreExpr = score
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(
        BindReferences.bindReferences(keyExprs, childOutput))
      val boundScore = BindReferences.bindReference(scoreExpr, childOutput)
      // per-key bounded min-heap of (score, row); head = weakest kept row
      val heaps = new java.util.HashMap[InternalRow,
        java.util.PriorityQueue[(Long, InternalRow)]]()
      val cmp = java.util.Comparator.comparingLong[(Long, InternalRow)](_._1)
      rows.foreach { row =>
        val s = boundScore.eval(row).asInstanceOf[Long]
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[(Long, InternalRow)](limit + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) heap.add((s, row.copy()))
        else if (cmp.compare((s, row), heap.peek()) > 0) {
          heap.poll(); heap.add((s, row.copy()))
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap { h =>
        h.asScala.toSeq.sortBy(-_._1).map(_._2).iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, score, k, child) =>
      TopKPerKeyExec(keys, score, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopK {

  /** Idempotent ad-hoc strategy registration (GraftExtensions also
    * injects it for extensions-built sessions).
    */
  def register(spark: SparkSession): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!ss.experimental.extraStrategies.contains(TopKStrategy))
      ss.experimental.extraStrategies =
        ss.experimental.extraStrategies :+ TopKStrategy
  }

  /** Top-`k` rows per `keys` by descending long Column `score`.
    * `score` must be unique within a key (encode tie-breaks into it).
    */
  def perKey(df: DataFrame, keyNames: Seq[String], scoreCol: Column,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    // Materialize score as a named column so logical refs resolve, run
    // the operator, then drop it.
    val withScore = df.withColumn("__graft_score", scoreCol)
    val plan = withScore.queryExecution.analyzed
    val keyAttrs = keyNames.map(n =>
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n")))
    val scoreAttr = plan.output.find(_.name == "__graft_score").get
    GraftShims.ofRows(spark, TopKPerKey(keyAttrs, scoreAttr, k, plan))
      .drop("__graft_score")
  }
}
