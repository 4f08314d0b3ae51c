package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev-only: ADC recall@5 vs exact L2 at several (M, K) widths. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val v = graft.Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))

    // production ground truth (Pq.exactL2TopK) — not a probe-local copy
    val exact = graft.llm.Pq.exactL2TopK(v).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    for (m <- Seq(4, 8, 16); k <- Seq(16, 32, 64)) {
      graft.GraftConfig.withInt("graft.pq.subspaces", m) {
        graft.GraftConfig.withInt("graft.pq.codebook", k) {
          val approx = graft.llm.Pq.annPq(spark, sfDir).collect()
            .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
          graft.Checkpoints.releaseAll()
          val rec = (0L until 10L).map(qid =>
            (approx.getOrElse(qid, Set.empty) & exact(qid)).size / 5.0)
          println(f"PQPROBE M=$m%2d K=$k%2d recall@5=${rec.sum / rec.size}%.2f  $rec")
        }
      }
    }
    spark.stop()
  }
}
