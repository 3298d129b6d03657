package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Storage hygiene for eager `localCheckpoint` loops.
  *
  * Every iterative operator here (pageRank, labelPropagation, kCore,
  * dedupGroups' pointer jumping, funnel's survivor chain) truncates
  * lineage with `localCheckpoint(true)` per round. The checkpoint blocks
  * of SUPERSEDED rounds, however, stay in executor storage until the
  * driver GCs the frame and ContextCleaner gets around to it — bounded by
  * the round count, but on a large corpus several node-sized copies can
  * pin memory/disk for the rest of the job. This helper frees a
  * superseded round's blocks deterministically.
  *
  * SAFETY CONTRACT: only call on a frame that nothing will read again —
  * a locally-checkpointed RDD has NO lineage to recompute from, so a
  * consumer arriving after release fails rather than recomputes. In the
  * loops above that means: release round i only after round i+1's eager
  * checkpoint has materialized (it read round i while materializing),
  * and never release the frame a caller will consume. */
object Checkpoints {

  /** Free the executor-storage blocks behind an eagerly
    * locally-checkpointed frame. No-op for any other plan shape (e.g. the
    * loop's round-0 seed, which is a plain lazy frame). Non-blocking: the
    * removal proceeds async while the next round runs. */
  private[graft] def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
