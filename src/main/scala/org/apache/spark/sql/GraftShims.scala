package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` surface needed to expose a custom
  * LogicalPlan as a user-facing DataFrame (the same shim pattern the
  * Spark extension ecosystem uses — there is no public constructor for
  * Dataset-from-LogicalPlan).
  */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Release the executor blocks behind a `localCheckpoint()`ed frame.
    *
    * `Dataset.unpersist()` only consults the CacheManager, which never
    * sees checkpoint storage — the blocks belong to the internal
    * `LogicalRDD`'s RDD and live until the session dies. An iterative
    * operator that checkpoints per round (connected components) must
    * release each dead round explicitly or it pins O(rounds) corpus-
    * sized frames in the block manager. Only call this once the frame
    * (and everything derived from it that hasn't been materialized) is
    * dead: local checkpoints have no lineage to recompute from.
    */
  def releaseLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Drain the async listener bus, so a test that counts listener
    * events (e.g. "zero jobs ran while CONSTRUCTING this frame" — the
    * no-plan-time-scan discipline) observes every event already posted.
    */
  def waitListenerBusEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
