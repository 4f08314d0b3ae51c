package graft.tools

/** Dev-only: time the exact table profile against the single-pass HLL
  * library form (the 100 TB NDV path) at a given sf. Args: [sfDir]
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def time(tag: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $tag ${ts.min}%.2f s")
    }
    time("table_stats_exact") {
      graft.queries.Profile.tableStats(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("table_stats_approx_library") {
      graft.queries.Profile.tableStatsApprox(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
