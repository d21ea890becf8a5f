package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Eager release of `localCheckpoint` blocks for iterative loops.
  *
  * Every iterative operator here (connected components, PageRank,
  * label propagation, k-core, the alternating-star components) keeps
  * its plan flat by `localCheckpoint(eager = true)` per round. The
  * blocks behind a SUPERSEDED round are dead the moment the next
  * round's checkpoint materializes, but `Dataset.unpersist` cannot
  * free them (checkpoint blocks never register in CacheManager) and
  * the ContextCleaner only frees them when the frame becomes
  * unreachable AND a GC cycle processes the reference queue. In a
  * long-lived session (a 256-query bench JVM, or a real multi-query
  * driver at 100 TB where each round's labels are executor-memory
  * sized) the dead blocks accumulate faster than GC runs and their
  * eviction churn lands on the loop itself — the round-11 bench
  * signature: the same CC query at 31.8s / 23.4s / 13.2s
  * back-to-back, vs 5.7s in a fresh JVM.
  *
  * [[free]] reaches through the checkpointed frame's analyzed plan to
  * the materialized RDD (`LogicalRDD.rdd` — the block holder) and
  * unpersists it directly, so a loop can drop round N-1's blocks as
  * soon as round N is materialized instead of betting on GC timing.
  *
  * CONTRACT: call only on a frame whose blocks nothing will read
  * again. A locally-checkpointed RDD has truncated lineage — after
  * `free` it cannot be recomputed, so freeing a frame that still
  * feeds a live plan fails that plan's next job rather than silently
  * recomputing. In the loops here that is exactly the guarantee the
  * eager checkpoint gives: round N's blocks are fully written before
  * round N-1 is freed, and the final round's frame is never freed
  * (it feeds the returned plan; the ContextCleaner handles it when
  * the caller drops the result).
  */
object Checkpoints {

  /** Unpersist the checkpoint blocks behind each frame (non-blocking).
    *
    * Walks the analyzed plan for `LogicalRDD` leaves — a checkpointed
    * frame is exactly one such leaf; passing a COMPOSITE plan that
    * merely references checkpointed inputs would free those inputs
    * too, so callers pass the checkpointed frames themselves. */
  def free(dfs: DataFrame*): Unit = dfs.foreach { df =>
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
