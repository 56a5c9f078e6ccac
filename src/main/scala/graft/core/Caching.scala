package graft.core

import org.apache.spark.sql.DataFrame

/** Cache hygiene helpers for operators that pin small intermediates. */
object Caching {

  /** Drop the backing RDD storage of every localCheckpoint reachable from
    * `df`'s plan, eagerly. `Dataset.unpersist` only reaches CacheManager
    * entries (plan-keyed `persist`), not checkpoint RDDs — without this an
    * operator that lazily local-checkpoints a fan-out intermediate leaks
    * one persisted RDD per invocation until GC + ContextCleaner get to it.
    * Safe on frames with no checkpoint (no-op).
    */
  def freeLocalCheckpoints(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
