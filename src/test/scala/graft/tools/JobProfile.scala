package graft.tools

import scala.collection.mutable
import org.apache.spark.scheduler._

/** Dev-loop job profiler (r13 optimization round): run ONE registered query
  * warm and list every Spark job it schedules — duration, stage/task counts,
  * and the action call site — so multi-job queries (eager localCheckpoint
  * chains, iterative loops) can be attributed job by job. explain() cannot
  * see these: the work happens before the returned frame exists.
  *
  * Usage: Test/runMain graft.tools.JobProfile <query> [sfDir] [reps]
  */
object JobProfile {

  private case class JobRow(id: Int, site: String, ms: Long, stages: Int, tasks: Int,
    start: Long = 0L, end: Long = 0L)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = graft.GraftSession.create(cpus)
    val fn = graft.SparkEntry.queries(name)

    val jobs = mutable.ArrayBuffer[JobRow]()
    val stages = mutable.ArrayBuffer[String]()
    val starts = mutable.Map[Int, (Long, String, Int)]()
    val taskCounts = mutable.Map[Int, Int]().withDefaultValue(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short"))))
          .getOrElse(js.stageInfos.map(si => si.name.take(60))
            .mkString(" | ").take(180))
        starts(js.jobId) = (js.time, site, js.stageInfos.size)
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
        taskCounts(te.stageId) += 1
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val si = sc.stageInfo
        val wall = (for (s <- si.submissionTime; e <- si.completionTime) yield e - s).getOrElse(-1L)
        val m = si.taskMetrics
        stages += f"  stage ${si.stageId}%4d wall=$wall%6d ms tasks=${si.numTasks}%4d " +
          f"run=${m.executorRunTime}%6d cpu=${m.executorCpuTime / 1000000}%6d " +
          f"deser=${m.executorDeserializeTime}%5d gc=${m.jvmGCTime}%5d " +
          f"shRead=${m.shuffleReadMetrics.totalBytesRead}%9d shWrite=${m.shuffleWriteMetrics.bytesWritten}%9d " +
          si.name.take(60)
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
        starts.remove(je.jobId).foreach { case (t0, site, nstages) =>
          jobs += JobRow(je.jobId, site, je.time - t0, nstages, -1, t0, je.time)
        }
      }
    }

    def once(label: String, record: Boolean): Double = {
      if (record) { jobs.clear(); stages.clear(); spark.sparkContext.addSparkListener(listener) }
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the async listener bus drain
      if (record) spark.sparkContext.removeSparkListener(listener)
      graft.capex.CapexDerive.clearCache()
      graft.Checkpoints.releaseAll()
      println(f"[$name] $label: $dt%.3f s")
      dt
    }

    once("warmup1", record = false)
    once("warmup2", record = false)
    (1 to reps).foreach { i =>
      once(s"measured$i", record = true)
      val total = jobs.map(_.ms).sum
      println(f"[$name] jobs=${jobs.size} sum(job ms)=$total")
      var prevEnd = 0L
      jobs.sortBy(_.id).foreach { j =>
        val gap = if (prevEnd == 0) 0 else j.start - prevEnd
        prevEnd = math.max(prevEnd, j.end)
        println(f"  job ${j.id}%4d ${j.ms}%6d ms  gap=$gap%5d  stages=${j.stages}%3d  ${j.site.take(70)}")
      }
      stages.foreach(println)
    }
    spark.stop()
  }
}
