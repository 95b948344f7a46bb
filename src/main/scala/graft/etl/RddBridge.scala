package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the cache blocks behind a `localCheckpoint`ed frame.
  *
  * A local checkpoint truncates lineage by materializing into cached
  * RDD blocks, but those blocks are reclaimed only when the RDD object
  * is garbage-collected (ContextCleaner weak refs) — in a long-lived
  * session an iterative algorithm accumulates block debt until a
  * driver GC happens to run. This shim reaches the `LogicalRDD` leaf a
  * checkpointed frame plans to and unpersists its RDD eagerly, making
  * the debt O(1) instead of O(iterations).
  */
object RddBridge {
  def unpersistCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking)
      case _ => ()
    }
}
