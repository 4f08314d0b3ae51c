package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Dev-only: phase-level timing of the enriched query (analysis vs
  * optimization vs planning vs codegen vs execution). Deleted when tuned.
  */
object DevProfile2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.metrics.source.CodegenMetrics
    def codegenStats(): (Long, Long) = {
      val h = CodegenMetrics.METRIC_COMPILATION_TIME
      (h.getCount, (h.getSnapshot.getMean * h.getCount).toLong)
    }

    var t0 = System.nanoTime()
    val df = graft.capex.CapexDerive.enriched(spark, dir)
    println(f"[prof2] enriched-call(eager-checkpoint) ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val (nComp, msComp) = codegenStats()
    println(s"[prof2] codegen: $nComp compilations, ~${msComp} ms total")

    // now a fresh, un-cached build to split phases
    graft.capex.CapexDerive.clearCache()
    spark.sparkContext.setJobGroup("x", "x")

    t0 = System.nanoTime()
    val df2 = graft.capex.CapexDerive.enriched(spark, dir)
    println(f"[prof2] second-build ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t = df2.queryExecution.tracker
    t.phases.foreach { case (p, s) => println(s"[prof2] phase $p: ${s.durationMs} ms") }
    val (nComp2, msComp2) = codegenStats()
    println(s"[prof2] codegen cumulative: $nComp2 compilations, ~${msComp2} ms total")
    spark.stop()
  }
}
