package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper — DELETE BEFORE ROUND END. */
object DevPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.headOption.getOrElse("asof_join") match {
      case q =>
        val df = SparkEntry.queries(q)(spark, dir)
        println(s"=== $q ===")
        df.explain("formatted")
    }
    spark.stop()
  }
}
