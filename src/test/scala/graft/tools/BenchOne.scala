package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: reproduce Bench's exact sequence but report one query's three
  * measured passes individually (is the slowdown the query or the bench
  * context?). Args: [sfDir] [queryName]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = args.lift(1).getOrElse("capex_pipeline")
    val cpus = Runtime.getRuntime.availableProcessors().toString
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
    graft.Bench.Headliners.foreach { name =>
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench-one] warmup $name: $e") }
    }
    graft.capex.CapexDerive.clearCache()
    graft.Checkpoints.releaseAll()
    System.gc(); Thread.sleep(3000); System.gc()
    for (pass <- 1 to 3) {
      // run the OTHER headliners first, like a bench pass does
      graft.Bench.Headliners.filterNot(_ == target).foreach { name =>
        try graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => () }
        graft.capex.CapexDerive.clearCache()
        graft.Checkpoints.releaseAll()
      }
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(target)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[bench-one] pass $pass $target: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.capex.CapexDerive.clearCache()
      graft.Checkpoints.releaseAll()
    }
    spark.stop()
  }
}
