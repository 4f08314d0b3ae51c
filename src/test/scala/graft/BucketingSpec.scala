package graft

import org.apache.spark.sql.functions._
import graft.sources.BucketedSink

/** Proves the SURVEY §5 bucketing claim with plan shapes: a fact written
  * bucketed by its hot key is aggregated, windowed, and co-bucket-joined
  * WITHOUT any shuffle exchange.
  */
class BucketingSpec extends SparkSpecBase {

  private def hasShuffle(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")

  /** Idempotently (re)create the bucketed table: the in-memory catalog
    * forgets tables between JVMs but the warehouse files persist, so clear
    * both first. Each test calls this — no inter-test ordering dependency.
    */
  private def ensureBucketed(): Unit = {
    if (spark.catalog.tableExists("ev_bucketed")) return
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "ev_bucketed")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(loc)
      try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
    BucketedSink.writeBucketed(Tables.events(spark, sfDir),
      "ev_bucketed", "user_id", 4, Seq("user_id", "ts"))
  }

  test("bucketed fact: groupBy, window and self-join on the key are exchange-free") {
    val ev = Tables.events(spark, sfDir)
    ensureBucketed()
    val t = BucketedSink.readTable(spark, "ev_bucketed")

    // aggregation on the bucket key: no exchange
    val agg = t.groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(!hasShuffle(agg), agg.queryExecution.executedPlan.toString)
    assert(agg.count() == ev.select("user_id").distinct().count())

    // window partitioned by the bucket key: no exchange
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val win = t.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
    assert(!hasShuffle(win), win.queryExecution.executedPlan.toString)

    // co-bucketed join on the key: no exchange (broadcast disabled so the
    // test exercises the sort-merge path a 100 TB fact-fact join takes)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = BucketedSink.readTable(spark, "ev_bucketed")
        .groupBy("user_id").agg(count(lit(1)).as("n_l"))
      val r = BucketedSink.readTable(spark, "ev_bucketed")
        .groupBy("user_id").agg(sum("value").as("v_r"))
      val j = l.join(r, Seq("user_id"))
      assert(!hasShuffle(j), j.queryExecution.executedPlan.toString)
      assert(j.count() == agg.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed results equal unbucketed results") {
    ensureBucketed()
    val t = BucketedSink.readTable(spark, "ev_bucketed")
    val a = t.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Tables.events(spark, sfDir).groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
