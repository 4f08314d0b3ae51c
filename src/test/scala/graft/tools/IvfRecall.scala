package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print IVF recall (refined vs seeded centroids) per SF dir. */
object IvfRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val bf = graft.llm.Ann.annBruteforce(spark, sf).select("q_id", "nb_id")
      val n = bf.count().toDouble
      val refined = graft.llm.Ann.annIvf(spark, sf).select("q_id", "nb_id")
        .intersect(bf).count() / n
      graft.Checkpoints.releaseAll()
      val seeded = graft.llm.Ann.annIvfSeeded(spark, sf).select("q_id", "nb_id")
        .intersect(bf).count() / n
      graft.Checkpoints.releaseAll()
      // candidates scanned per query = members in probed cells
      def cands(refined: Boolean): Double = {
        import org.apache.spark.sql.functions._
        val ranked = graft.llm.Ann.ivfRanked(spark, sf, refined)
        val members = ranked.filter(col("rn") === 1)
          .groupBy("cell").agg(count(lit(1)).as("sz"))
        val probes = ranked.filter(col("vec_id") < 10).select("vec_id", "cell")
        val c = probes.join(members, "cell").agg(sum("sz")).head.getLong(0) / 10.0
        graft.Checkpoints.releaseAll(); c
      }
      println(f"[ivf-recall] $sf refined=$refined%.3f (cands/q=${cands(true)}%.0f) " +
        f"seeded=$seeded%.3f (cands/q=${cands(false)}%.0f)")
    }
    spark.stop()
  }
}
