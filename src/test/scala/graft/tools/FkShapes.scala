package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev-only: measure the r7 single-scan fk_integrity shape against the r6
  * per-relationship 7-join shape, on an amplified fact (lineitem unioned
  * N×) and in BOTH planner regimes:
  *  - broadcast regime (local defaults): parent key sets broadcast, the
  *    old form never shuffles the fact — the small-scale sweet spot;
  *  - shuffle regime (autoBroadcastJoinThreshold = -1): what a 100 TB
  *    cluster hits when parent key sets outgrow a broadcast — the old
  *    form shuffles FULL child rows per relationship, the new form ships
  *    pre-aggregated distinct (rel, key) pairs from ONE scan.
  * Args: [sfDir] [amplification]
  */
object FkShapes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val amp = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.GraftSession.create(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // amplified dataset dir: lineitem unioned amp times, other tables as-is
    val tmp = java.nio.file.Files.createTempDirectory("graft-fk-amp").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      val out = if (t == "lineitem") Seq.fill(amp)(df).reduce(_.unionAll(_)) else df
      out.repartition(8).write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    val rels = Seq(
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation", "n_regionkey", "region", "r_regionkey"))
    // the r6 shape: 7 independent joins, child rows shuffled un-aggregated
    def oldForm(s: SparkSession, dir: String): DataFrame =
      rels.map { case (ct, fk, pt, pk) =>
        val child = Tables.table(s, dir, ct)
          .filter(col(fk).isNotNull).select(col(fk).as("fk"))
        val parent = Tables.table(s, dir, pt)
          .filter(col(pk).isNotNull).select(col(pk).as("pk")).distinct()
          .withColumn("hit", lit(1))
        child.join(parent, col("fk") === col("pk"), "left")
          .agg(count(lit(1)).as("n_child"),
            sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(s"$ct.$fk->$pt.$pk").as("relationship"),
            coalesce(col("n_child"), lit(0L)).as("n_child"),
            coalesce(col("n_orphans"), lit(0L)).as("n_orphans"))
      }.reduce(_.unionAll(_))
    def time(tag: String)(f: => Unit): Unit = {
      f // warmup
      // shuffle bytes written = the network cost a cluster actually pays
      val bytes = new java.util.concurrent.atomic.AtomicLong()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) {
            bytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten); ()
          }
      }
      spark.sparkContext.addSparkListener(l)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      org.apache.spark.GraftTestBridges.waitUntilListenerBusEmpty(spark.sparkContext)
      spark.sparkContext.removeSparkListener(l)
      println(f"FKSHAPE $tag ${ts.min}%.2f s, " +
        f"${bytes.get() / 3.0 / 1e6}%.1f MB shuffled/run (x$amp lineitem)")
    }
    for (regime <- Seq("broadcast", "shuffle")) {
      if (regime == "shuffle") {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      }
      time(s"$regime old-7join") {
        oldForm(spark, tmp).write.format("noop").mode("overwrite").save()
      }
      time(s"$regime new-1scan") {
        graft.queries.Profile.fkIntegrity(spark, tmp)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
