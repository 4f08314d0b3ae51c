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

    val d2e = (0 until graft.llm.Ann.Dim).map { i =>
      val d = element_at(col("qv"), i + 1).cast("double") -
        element_at(col("embedding"), i + 1).cast("double")
      d * d
    }.reduce(_ + _)
    val q = v.filter(col("vec_id") < 10).select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d2").asc, col("vec_id").asc)
    val exact = broadcast(q).crossJoin(v).filter(col("q_id") =!= col("vec_id"))
      .withColumn("d2", d2e)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id")).collect()
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
