package graft.tools

/** Dev-only observation run for the plan-budget net: measures every
  * catalog query's executed shuffle-map stage count + final-plan join
  * shape at the spec scale and prints one line per query — the numbers
  * PlanBudgetSpec's budget table pins.
  *
  * Run: sbt 'Test/runMain graft.tools.PlanBudgetProbe /root/testdata/sf0.001 [query...]'
  */
object PlanBudgetProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only: Set[String] = args.drop(1).toSet
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    graft.PlanBudgetHarness.warmPersistedIndexes(spark, sfDir)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.isEmpty || only(kv._1))
      .foreach { case (name, fn) =>
      try {
        val m = graft.PlanBudgetHarness.measure(spark, fn, sfDir)
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(m.plan).length
        val cart = "CartesianProduct".r.findAllIn(m.plan).length
        println(s"BUDGET $name stages=${m.stages} bnlj=$bnlj cart=$cart " +
          s"shuffleWriteBytes=${m.shuffleWriteBytes}")
      } catch { case e: Throwable =>
        println(s"BUDGET $name FAILED ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
