package graft

/** Checkpoints.cp barrier modes (graft.barrier=local|cache|reliable): a
  * checkpoint-heavy query must produce identical results under each mode.
  * `local` is the single-JVM default; `cache` keeps lineage (executor-loss
  * safe); `reliable` writes to a checkpoint dir (block-loss safe). The
  * VERDICT r3 operational-risk item: at 1000-executor scale localCheckpoint
  * partitions die with their executor, so cluster runs flip the config —
  * same call sites, no query changes.
  */
class BarrierModeSpec extends SparkSpecBase {

  private def minhashRows(): Set[String] = {
    val rows = llm.Dedup.dedupMinhash(spark, sfDir)
      .collect().map(_.mkString("|")).toSet
    Checkpoints.releaseAll()
    rows
  }

  test("dedup_minhash identical under local, cache, and reliable barriers") {
    val prev = spark.conf.getOption("graft.barrier")
    try {
      spark.conf.set("graft.barrier", "local")
      val base = minhashRows()
      assert(base.nonEmpty)
      for (m <- Seq("cache", "reliable")) {
        spark.conf.set("graft.barrier", m)
        assert(minhashRows() == base, s"mode $m diverged from local")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("graft.barrier", v)
        case None    => spark.conf.unset("graft.barrier")
      }
    }
  }

  test("cache mode keeps lineage (plan has no LogicalRDD scan)") {
    spark.conf.set("graft.barrier", "cache")
    try {
      val df = Checkpoints.cp(Tables.nation(spark, sfDir))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("InMemoryRelation"), plan.take(400))
      assert(!plan.contains("LogicalRDD"), "cache mode must not truncate lineage")
      Checkpoints.releaseAll()
    } finally spark.conf.unset("graft.barrier")
  }
}
