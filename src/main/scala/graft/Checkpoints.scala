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

  /** Barrier mode, per-session via `graft.barrier`:
    *  - `local` (default): eager localCheckpoint — fastest, but lineage is
    *    truncated onto executor-local blocks, so a lost executor makes the
    *    partitions irrecoverable. Right for single-JVM / local runs.
    *  - `cache`: eager persist — the plan keeps its lineage, so a lost
    *    executor recomputes the partition from source. The cache boundary
    *    still stops Catalyst project-collapse (CacheManager substitutes
    *    InMemoryRelation at planning time). Right default for clusters.
    *  - `reliable`: eager reliable checkpoint to `graft.checkpointDir`
    *    (HDFS/S3 on a cluster) — survives executor AND block loss at the
    *    cost of a write+read of the barrier frame. Right for very long
    *    lineages (iterative label propagation) on flaky fleets.
    * Same call sites, no query changes — the mode is operational posture.
    */
  private def mode(df: DataFrame): String =
    df.sparkSession.conf.get("graft.barrier", "local")

  /** The first stack frame outside this object — labels the barrier's
    * eager job in the UI / listener profiles (guide §1.5); the job
    * description is thread-local and restored after the materialize.
    */
  private def callerSite(): String =
    Thread.currentThread.getStackTrace
      .drop(1)
      .find(f => !f.getClassName.startsWith("graft.Checkpoints") &&
        !f.getClassName.startsWith("java.lang.Thread"))
      .map(f => s"cp@${f.getFileName}:${f.getLineNumber}")
      .getOrElse("cp")

  /** Eager barrier (mode-dependent), weakly registered for explicit release. */
  def cp(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val prevDesc = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(callerSite())
    val out =
      try mode(df) match {
        case "cache" =>
          val c = df.cache()
          c.count() // eager, matching localCheckpoint(true) semantics
          c
        case "reliable" =>
          if (sc.getCheckpointDir.isEmpty)
            sc.setCheckpointDir(
              df.sparkSession.conf.get("graft.checkpointDir", "/tmp/graft-checkpoints"))
          df.checkpoint(true)
        case _ => df.localCheckpoint(true)
      } finally sc.setJobDescription(prevDesc)
    tracked.synchronized { tracked += new WeakReference(out) }
    out
  }

  /** Lazy cache barrier: persist WITHOUT forcing materialization, for call
    * sites whose very next action already scans the whole frame (e.g. the
    * pagerank convergence aggregate) — that action fills the cache, so the
    * frame costs ONE job instead of cp's materialize-then-use two. The
    * cache boundary still stops Catalyst project-collapse; lineage is kept
    * (recompute-safe on block loss). Registered for releaseAll like cp.
    */
  def cpLazy(df: DataFrame): DataFrame = {
    val c = df.persist()
    tracked.synchronized { tracked += new WeakReference(c) }
    c
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
