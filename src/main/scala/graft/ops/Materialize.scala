package graft.ops

import org.apache.spark.sql.DataFrame

/** The repo's one checkpoint convention (shared by every operator
  * that must evaluate a reused subtree exactly once): a reliable
  * checkpoint when the session has a checkpoint dir (the cluster
  * setting — survives executor loss), localCheckpoint otherwise
  * (local mode). Eager in both cases, so the caller can treat the
  * returned frame as materialized. */
object Materialize {
  def cp(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(true)
}
