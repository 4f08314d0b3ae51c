package graft

import java.lang.ref.WeakReference
import org.apache.spark.sql.DataFrame

/** Registry of eager localCheckpoint barriers (Dedup, Ann — per-query
  * ephemeral frames).
  *
  * The engine uses localCheckpoint for two load-bearing reasons (SURVEY §5):
  * cutting lineage at cache boundaries and keeping Catalyst's project
  * collapse from inlining tokenizers into per-element lambda accesses. The
  * blocks those checkpoints pin belong to RDDs, not the Dataset cache
  * manager, so they linger until GC lets the ContextCleaner reap them.
  * `releaseAll` frees them deterministically — Bench and Verify call it
  * BETWEEN queries, after the previous query's results are fully written.
  *
  * Scoping rules:
  * - Tracking is via WeakReference: the registry never pins a frame, so a
  *   long-lived session that never calls releaseAll behaves exactly as
  *   before (GC + ContextCleaner reclaim dropped frames).
  * - CapexDerive's long-lived caches (enriched/kept) are deliberately NOT
  *   registered here: releaseAll between queries must not kill the frames
  *   that later capex queries share. Its build-stage intermediates use a
  *   capex-private list released by CapexDerive.clearCache().
  * - Checkpoints cut lineage, so a released frame (and anything derived
  *   from it) is dead, not recomputable — only call releaseAll at a point
  *   where no frames produced earlier are still in use.
  */
object Checkpoints {

  private val tracked = new scala.collection.mutable.ArrayBuffer[WeakReference[DataFrame]]

  /** Eager localCheckpoint, weakly registered for explicit release. */
  def cp(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(true)
    tracked.synchronized { tracked += new WeakReference(out) }
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

  /** Release every still-reachable tracked checkpoint and clear the list. */
  def releaseAll(): Unit = tracked.synchronized {
    tracked.foreach(ref => Option(ref.get).foreach(release))
    tracked.clear()
  }
}
