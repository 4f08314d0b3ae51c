package graft

import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler for the capex pipeline — DELETE BEFORE ROUND END. */
object DevProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new scala.collection.concurrent.TrieMap[Int, Long]
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(j.jobId) = System.nanoTime()
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { t0 =>
          System.err.println(f"[job] ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
    })

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup full pipeline once
    time("warmup full")(noop(SparkEntry.queries("capex_pipeline")(spark, sfDir)))
    graft.capex.CapexDerive.clearCache()
    graft.Checkpoints.releaseAll()
    System.gc(); Thread.sleep(2000); System.gc()

    (1 to 2).foreach { i =>
      time(s"pass$i raw")(noop(graft.capex.CapexDerive.raw(spark, sfDir)))
      time(s"pass$i enriched-build")(graft.capex.CapexDerive.enriched(spark, sfDir))
      time(s"pass$i kept")(graft.capex.CapexDerive.kept(spark, sfDir))
      time(s"pass$i reinstated")(noop(graft.capex.CapexDerive.reinstated(spark, sfDir)))
      time(s"pass$i pipeline-out")(noop(graft.capex.CapexDerive.pipeline(spark, sfDir)))
      graft.capex.CapexDerive.clearCache()
      graft.Checkpoints.releaseAll()
      time(s"pass$i full-fresh")(noop(SparkEntry.queries("capex_pipeline")(spark, sfDir)))
      graft.capex.CapexDerive.clearCache()
      graft.Checkpoints.releaseAll()
    }
    spark.stop()
  }
}
