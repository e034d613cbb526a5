package graft.util

import org.apache.spark.sql.Dataset

/** Checkpoint indirection for every operator-scratch checkpoint in the
  * library (r16 verdict item 2 — the reliable-checkpoint escape hatch).
  *
  * Default mode is `localCheckpoint`: executor-local storage blocks,
  * zero external storage, the right call in a healthy session — but its
  * lineage truncation means a SINGLE executor loss afterwards makes the
  * frame unrecoverable, which on a long cluster job turns one preempted
  * container into a failed job. When `graft.checkpoint.dir` (system
  * property, then SPARK_GRAFT_CHECKPOINT_DIR) names a directory, [[cp]]
  * routes to RELIABLE `Dataset.checkpoint` on that path instead: every
  * truncation point is re-readable from the checkpoint store (HDFS/S3
  * on a cluster), trading write throughput — reliable checkpoints also
  * recompute the frame once more for the write, Spark's documented
  * behavior for un-persisted reliable checkpoints — for fault
  * tolerance. CheckpointerSpec pins that both modes produce identical
  * results on a group-dedup query.
  *
  * [[BlockRelease]] stays correct in both modes: a reliable-checkpointed
  * frame holds no storage blocks, so the leaf unpersist is a no-op, and
  * checkpoint FILES are reclaimed by the checkpoint dir's retention
  * policy (or `spark.cleaner.referenceTracking.cleanCheckpoints`), not
  * by the release path.
  */
object Checkpointer {

  /** The reliable-checkpoint directory, when configured. */
  def dir: Option[String] = sys.props.get("graft.checkpoint.dir")
    .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
    .map(_.trim).filter(_.nonEmpty)

  /** `localCheckpoint(eager)` by default; reliable `checkpoint(eager)`
    * on the configured directory when one is set. */
  def cp[T](ds: Dataset[T], eager: Boolean = true): Dataset[T] =
    dir match {
      case Some(d) =>
        val sc = ds.sparkSession.sparkContext
        if (!sc.getCheckpointDir.contains(d)) sc.setCheckpointDir(d)
        ds.checkpoint(eager)
      case None => ds.localCheckpoint(eager)
    }

  /** `df.cp()` / `df.cp(false)` syntax — the sweep target for the 200
    * former `.localCheckpoint(...)` call sites. */
  implicit class CheckpointSyntax[T](private val ds: Dataset[T])
      extends AnyVal {
    def cp(): Dataset[T] = Checkpointer.cp(ds)
    def cp(eager: Boolean): Dataset[T] = Checkpointer.cp(ds, eager)
  }
}
