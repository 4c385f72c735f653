package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Cache discipline for iterative operators built on eager
  * `localCheckpoint`: the ONE shared implementation of explicit block
  * freeing, so the subtle parts (LogicalRDD match, non-blocking
  * unpersist) cannot drift between operators.
  *
  * Checkpoint blocks otherwise live until the GC/ContextCleaner
  * happens to collect the RDD object; an iterative operator that
  * leaves O(rounds) cached frames behind steals executor storage
  * memory from everything scheduled after it (the leak class the r3
  * persist() audit evicted from Dedup/Curation). */
private[graft] object LocalCheckpoints {

  /** Drop the cached blocks behind an eagerly localCheckpoint'ed
    * Dataset. Its analyzed plan is the bare `LogicalRDD` wrapping the
    * cached internal-row RDD. Safe ONLY once nothing will read the
    * frame again — checkpoint lineage is truncated, so a later action
    * would fail rather than recompute. */
  def unpersistOf(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
