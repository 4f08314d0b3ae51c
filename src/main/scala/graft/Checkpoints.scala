package graft

import org.apache.spark.sql.DataFrame

/** Registry of eager localCheckpoint barriers.
  *
  * The engine uses localCheckpoint for two load-bearing reasons (SURVEY §5):
  * cutting lineage at cache boundaries and keeping Catalyst's project
  * collapse from inlining tokenizers into per-element lambda accesses. The
  * blocks those checkpoints pin belong to RDDs, not to the Dataset cache
  * manager, so `Dataset.unpersist` alone never frees them — they otherwise
  * linger until GC lets the ContextCleaner reap them. Everything created
  * through `cp` here can be released deterministically via `releaseAll`
  * (the bench does this between queries so no query pays its predecessor's
  * memory).
  */
object Checkpoints {

  private val tracked = new scala.collection.mutable.ArrayBuffer[DataFrame]

  /** Eager localCheckpoint, registered for explicit release. */
  def cp(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(true)
    tracked.synchronized { tracked += out }
    out
  }

  /** Release one checkpointed frame's blocks (underlying RDD + cache entry). */
  def release(df: DataFrame): Unit = {
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = true)
      case _ =>
    }
    df.unpersist(blocking = true)
  }

  /** Release every tracked checkpoint (callers' own cached frames excluded —
    * only frames created through `cp`).
    */
  def releaseAll(): Unit = tracked.synchronized {
    tracked.foreach(release)
    tracked.clear()
  }
}
