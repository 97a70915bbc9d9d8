package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lifetime control for `localCheckpoint`'d frames. A local checkpoint
  * pins its blocks in the block manager for the JVM's lifetime unless the
  * driver GC happens to collect the RDD (ContextCleaner frees via weak
  * refs only — unreliable under bench pressure), so every operator that
  * checkpoints scratch frames must release them once the frame that
  * supersedes them is materialized. Dataset has no unpersist path for
  * checkpoint blocks — they hang off an internal RDD reachable only
  * through the LogicalRDD leaf — hence this walker.
  */
private[graft] object Pinned {

  /** Release the blocks behind a localCheckpoint'd frame. Safe on
    * non-checkpointed frames (no LogicalRDD leaf → no-op). The frame
    * must not be consumed again afterwards: the checkpoint truncated its
    * lineage, so recomputation is impossible once the blocks are gone.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
