package graft.ops

import org.apache.spark.sql.DataFrame

/** Release a localCheckpoint'd frame's blocks. `Dataset.unpersist` is a
  * NO-OP for checkpoint blocks (they are pinned by the LogicalRDD, not the
  * Dataset's storage level), so iterative operators that checkpoint per
  * round must release superseded rounds here or pin O(rounds) copies in
  * block storage until driver GC + ContextCleaner catch up. Shared by the
  * CC-clustering loop (Dedup.nearDupClusters) and the Lloyd loop
  * (Similarity.ivfCentroids).
  */
private[graft] object Checkpoints {
  def releaseLocal(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => () // not a checkpointed frame; nothing to release
    }

  /** Release EVERY localCheckpoint node reachable in `df`'s analyzed plan
    * — for callers holding only a frame DERIVED from a checkpoint (e.g.
    * the projection nearDupClusters returns over its final label table).
    * Only safe once nothing lazy still needs any checkpoint under `df`.
    */
  def releaseLocalDeep(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
