package graft.tools

/** Time catalog queries against an ARBITRARY testdata dir (the native-sf1
  * drop, an amplified dir, a scratch corpus) with ScalingProbe's exact
  * conventions: persisted-index warmup, untimed warmup run, best-of-2,
  * caches cleared between queries. One line per query:
  * `TIMEDIR <label> <query> <seconds>`.
  *
  * Run: sbt 'Test/runMain graft.tools.TimeDir <dir> <label> [query...]'
  */
object TimeDir {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeDir <dir> <label> [query...]")
    val dir = args(0)
    val label = args(1)
    val only: Set[String] = args.drop(2).toSet
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable => System.err.println(s"[timedir] failed: $e"); false }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
      graft.capex.CapexDerive.clearCache()
      graft.Checkpoints.releaseAll()
      dt
    }
    graft.PlanBudgetHarness.warmPersistedIndexes(spark, dir)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => only.isEmpty || only(kv._1))
      .foreach { case (name, fn) =>
        runOnce(fn)
        val best = math.min(runOnce(fn), runOnce(fn))
        if (best.isNaN) println(s"TIMEDIR $label $name FAILED")
        else println(f"TIMEDIR $label $name $best%.3f")
      }
    spark.stop()
  }
}
