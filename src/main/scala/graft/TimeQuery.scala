package graft

/** Dev-loop timing harness: time ONE registered query by name, best-of-N
  * noop-sink passes after one warmup — the single-query mirror of Bench's
  * protocol for iterating on a plan without paying the full headliner
  * sweep. `runMain graft.TimeQuery <name> [sfDir] [reps]`.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = GraftSession.create(cpus)
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.capex.CapexDerive.clearCache()
      graft.Checkpoints.releaseAll()
      dt
    }
    once() // warmup: codegen + JIT
    val times = (1 to reps).map { i =>
      val dt = once(); println(f"[$name] pass $i: $dt%.3f s"); dt
    }
    println(f"[$name] best: ${times.min}%.3f s")
    spark.stop()
  }
}
