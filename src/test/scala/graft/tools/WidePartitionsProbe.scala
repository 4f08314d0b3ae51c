package graft.tools

/** Dev-only: measure the iterative loops at shuffle.partitions=2048 with
  * and without `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`
  * — the conf that lets AQE coalesce INSIDE cached plans (the lazily
  * persisted stationary edge caches), which the r7 cluster dry run flagged
  * as the per-round overhead source at cluster shuffle width.
  * Args: [sfDir] [query...]
  */
object WidePartitionsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val targets = if (args.length > 1) args.drop(1).toSeq
                  else Seq("part_pagerank", "split_holdout", "part_communities",
                           "dedup_components")
    for (canChange <- Seq("false", "true")) {
      val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
      val parts = sys.env.getOrElse("GRAFT_PROBE_PARTITIONS", "2048")
      val spark = graft.GraftSession.builder(cores)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", canChange)
        .config("spark.sql.shuffle.partitions", parts)
        .appName(s"wide-$canChange")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      targets.foreach { name =>
        // warmup (JIT) then one measured run
        for (round <- 1 to 2) {
          graft.capex.CapexDerive.clearCache(); graft.Checkpoints.releaseAll()
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          if (round == 2)
            println(f"WIDE canChange=$canChange $name $dt%.2f s")
          graft.capex.CapexDerive.clearCache(); graft.Checkpoints.releaseAll()
        }
      }
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
