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
  /** Contract: `df` must plan to EXACTLY ONE `LogicalRDD` leaf (i.e. it
    * is a checkpointed frame, not something derived from several
    * checkpointed inputs) — unpersisting every leaf of, say, a join of
    * two checkpoints would release blocks of a frame still live
    * elsewhere. Asserted, not assumed.
    */
  def unpersistCheckpoint(df: DataFrame, blocking: Boolean = false): Unit = {
    val leaves = df.queryExecution.analyzed.collect { case l: LogicalRDD => l }
    require(leaves.size == 1,
      s"unpersistCheckpoint expects exactly one LogicalRDD leaf, found ${leaves.size}")
    leaves.head.rdd.unpersist(blocking)
  }
}
