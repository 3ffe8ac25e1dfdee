package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.{CosineSimilarity, ShingleHashes, TokenizeExplode}

/** Catalyst optimizer rule: cosine(x, x) is identically 1.0 — fold it
  * to a literal so self-similarity terms (common in generated pair
  * queries: the diagonal of a similarity join, normalization against
  * self) cost nothing. Null-safe only when the child can't be null.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(a, b) if a.semanticEquals(b) && !a.nullable =>
        Literal(1.0, DoubleType)
    }
}

/** SparkSessionExtensions entry point: register graft's native
  * functions and optimizer rules at session build time
  * (`spark.sql.extensions=graft.GraftExtensions`) so SQL users get
  * them on every executor without per-session registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_tokenize"),
      new ExpressionInfo(classOf[TokenizeExplode].getName, "graft_tokenize"),
      (exprs: Seq[Expression]) => TokenizeExplode(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(classOf[graft.functions.KmvDistinct].getName,
        "graft_kmv_distinct"),
      (exprs: Seq[Expression]) => graft.functions.KmvDistinct(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("graft_kmv_sketch"),
      new ExpressionInfo(classOf[graft.functions.KmvSketchAgg].getName,
        "graft_kmv_sketch"),
      (exprs: Seq[Expression]) => graft.functions.KmvSketchAgg(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("graft_gk_quantile"),
      new ExpressionInfo(classOf[graft.functions.GkQuantile].getName,
        "graft_gk_quantile"),
      (exprs: Seq[Expression]) => graft.functions.GkQuantile(exprs.head,
        exprs(1).eval().asInstanceOf[Number].doubleValue(),
        exprs(2).eval().asInstanceOf[Number].doubleValue())))
    e.injectFunction((
      FunctionIdentifier("graft_hll_distinct"),
      new ExpressionInfo(classOf[graft.functions.HllDistinct].getName,
        "graft_hll_distinct"),
      (exprs: Seq[Expression]) => graft.functions.HllDistinct(exprs.head,
        if (exprs.length > 1) exprs(1).eval().asInstanceOf[Number].intValue()
        else 12)))
    e.injectOptimizerRule(_ => SimplifySelfCosine)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
