package graft.tools

import org.apache.spark.scheduler._

/** Dev-only: print per-stage wall times for one fk_integrity run. */
object FkStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create(32)
    // warmup
    graft.queries.Profile.fkIntegrity(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.put(si.stageId, (si.name.take(60), ms))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.queries.Profile.fkIntegrity(spark, dir)
      .write.format("noop").mode("overwrite").save()
    println(f"FKSTAGES total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    org.apache.spark.GraftTestBridges.waitUntilListenerBusEmpty(spark.sparkContext)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, (name, ms)) =>
      println(f"FKSTAGES stage $id%3d $ms%6d ms  $name")
    }
    spark.stop()
  }
}
