package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: stage-by-stage wall time of the capex pipeline at a given SF. */
object CapexProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[capex-profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 3) {
      println(s"--- pass $round ---")
      t("enriched (build+checkpoint)") { graft.capex.CapexDerive.enriched(spark, sfDir).count() }
      t("kept (rank+dedup+checkpoint)") { graft.capex.CapexDerive.kept(spark, sfDir).count() }
      t("pipeline (reinstate+union+noop)") {
        graft.capex.CapexDerive.pipeline(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      t("clearCache") { graft.capex.CapexDerive.clearCache() }
    }
    spark.stop()
  }
}
