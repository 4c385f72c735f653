package graft.operators

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Materialization + cache discipline for the iterative operators
  * (ConnectedComponents, Graphs): the ONE shared implementation, so
  * the subtle parts (medium choice, LogicalRDD match, non-blocking
  * unpersist) cannot drift between operators.
  *
  * Medium choice (VERDICT r06 "What's wrong" #3): `localCheckpoint`
  * stores blocks on executor local disk/memory — free and fast, but
  * the blocks DIE WITH THE EXECUTOR. In local mode that risk is moot
  * (one JVM; losing it loses the job anyway), so local is the right
  * default. On a 1000-executor cluster running hours of iterations
  * over 100 TB, executor loss is routine, and a lost localCheckpoint
  * block aborts the job with NO recompute path (lineage is truncated
  * by design). So when [[CheckpointDirKey]] — or the session's
  * checkpoint dir — points at shared storage, materialization becomes
  * a RELIABLE `checkpoint()`: blocks are written to that filesystem
  * and survive any executor. The cost (one write+read through the
  * shared FS per materialization) is the standard price of
  * fault-tolerant iteration; pay it exactly when the deployment says
  * it can.
  *
  * Reliable checkpoint files are deleted by the ContextCleaner only
  * when `spark.cleaner.referenceTracking.cleanCheckpoints=true`;
  * deployments running many iterative jobs per session should set it
  * (or wipe the checkpoint dir between jobs).
  */
private[graft] object Checkpoints {

  /** Conf key: shared-filesystem directory for reliable iterative
    * checkpoints. Setting it (or `SparkContext.setCheckpointDir`)
    * switches every iterative materialization from executor-local
    * blocks to fault-tolerant files under this path. */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  /** The conf value last pushed into `SparkContext.setCheckpointDir`,
    * so a per-materialization call does not mint a fresh UUID subdir
    * every time (setCheckpointDir creates one per call). */
  private val applied = new AtomicReference[String](null)

  /** Fault injection for the executor-loss drill (CheckpointsSpec):
    * invoked after EVERY materialization with the materialized frame.
    * The drill kills all cached/checkpoint blocks here — between
    * iteration rounds, exactly when a lost executor would — and
    * asserts the reliable-checkpoint run still completes with
    * identical results. No-op outside the drill. */
  private[graft] val faultHook =
    new AtomicReference[DataFrame => Unit]((_: DataFrame) => ())

  /** Materialize `df` eagerly with truncated lineage: reliable
    * `checkpoint()` when a checkpoint dir is configured, else
    * `localCheckpoint()`. */
  def materialize(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val sc = s.sparkContext
    val out = s.conf.getOption(CheckpointDirKey) match {
      case Some(dir) =>
        if (applied.getAndSet(dir) != dir || sc.getCheckpointDir.isEmpty)
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None if sc.getCheckpointDir.isDefined =>
        df.checkpoint()
      case None =>
        df.localCheckpoint()
    }
    faultHook.get()(out)
    out
  }

  /** Drop the cached blocks behind an eagerly localCheckpoint'ed
    * Dataset. Its analyzed plan is the bare `LogicalRDD` wrapping the
    * cached internal-row RDD; for a RELIABLE checkpoint that RDD holds
    * no storage blocks, so the unpersist is a harmless no-op (its
    * files are the cleaner's job — see the class doc). Safe ONLY once
    * nothing will read the frame again — checkpoint lineage is
    * truncated, so a later action would fail rather than recompute.
    *
    * Checkpoint blocks otherwise live until the GC/ContextCleaner
    * happens to collect the RDD object; an iterative operator that
    * leaves O(rounds) cached frames behind steals executor storage
    * memory from everything scheduled after it (the leak class the r3
    * persist() audit evicted from Dedup/Curation). */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
