package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiling main (test scope, like RefExport): splits the capex
  * pipeline's wall time into its materialization stages so optimization
  * effort goes where the time is.
  *
  *   sbt 'Test/runMain graft.tools.CapexProfile /root/testdata/sf0.1'
  */
object CapexProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (pass <- 1 to 4) {
      graft.capex.CapexDerive.clearCache()
      val t0 = System.nanoTime()
      graft.capex.CapexDerive.enriched(spark, dir)
      val t1 = System.nanoTime()
      graft.capex.CapexDerive.kept(spark, dir)
      val t2 = System.nanoTime()
      graft.capex.CapexDerive.pipeline(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"pass$pass enriched=${(t1 - t0) / 1e9}%.2f kept=${(t2 - t1) / 1e9}%.2f " +
        f"reinstate+union=${(t3 - t2) / 1e9}%.2f total=${(t3 - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
