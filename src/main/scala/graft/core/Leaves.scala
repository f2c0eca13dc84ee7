package graft.core

import org.apache.spark.sql.DataFrame

/** Release the storage behind a checkpoint-backed LEAF frame —
  * `localCheckpoint` blocks unpersisted, reliable checkpoint files
  * deleted. The fold operators cut their wave-sized mid-frames to
  * checkpoint leaves (see [[graft.dedup.IncrementalClusters
  * .foldEdgeFrame]]); without an explicit release those blocks are
  * retained until the ContextCleaner GCs the RDD reference, and a
  * long-running writer accumulates every wave's edge set (measured at
  * the 100× tier: retained upstream blocks cost 52→130 s of eviction/GC
  * churn on later queries — the same pathology [[TransientCache]]
  * exists for).
  *
  * ONLY call on a leaf nothing will re-evaluate: a truncated lineage
  * cannot recompute, so an action over a released leaf FAILS rather
  * than silently recomputing. The fold call sites release the edge leaf
  * after its last collect, never the returned ledger deltas (callers
  * union those into live state).
  */
object Leaves {

  @scala.annotation.tailrec
  private def ckptAncestor(
      r: org.apache.spark.rdd.RDD[_]): Option[org.apache.spark.rdd.RDD[_]] =
    if (r.getCheckpointFile.isDefined ||
        r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) Some(r)
    else r.dependencies.headOption.map(_.rdd) match {
      case Some(parent) => ckptAncestor(parent)
      case None => None
    }

  /** Free the checkpoint storage behind `df`'s LogicalRDD leaf (no-op on
    * a frame that is not checkpoint-backed). The stats-reset wrapper
    * ([[org.apache.spark.sql.GraftShim.checkpointFresh]]) puts a metrics
    * RDD between the leaf and the checkpoint-backed ancestor, so walk
    * the (linear) dependency chain to the RDD that owns files/blocks. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.flatMap(ckptAncestor).foreach { r =>
      r.getCheckpointFile match {
        case Some(f) =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
            .delete(p, true)
        case None => r.unpersist(false)
      }
    }
}
