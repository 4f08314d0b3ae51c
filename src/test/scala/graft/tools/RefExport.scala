package graft.tools

import org.apache.spark.sql.SparkSession

/** Baseline-measurement tool (test scope, not shipped): exports the
  * capex-shaped raw frame + office dim as CSV so the reference pandas
  * pipeline (process_capex.process_capex_data) can be timed on the SAME
  * data the engine benches on. See BASELINE.md for the measured figure
  * and the two-command repro.
  *
  * Run: sbt "Test/runMain graft.tools.RefExport /root/testdata/sf0.1 /tmp/graft_ref_bench"
  */
object RefExport {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_ref_bench")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.CsvSource.writeCsv(
      graft.capex.CapexDerive.raw(spark, sfDir).drop("rid"), s"$out/raw", singleFile = true)
    graft.sources.CsvSource.writeCsv(
      graft.capex.CapexDerive.offices(spark, sfDir)
        .select("zone", "region", "office", "regioncode"), s"$out/offices", singleFile = true)
    spark.stop()
  }
}
