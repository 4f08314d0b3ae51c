package graft

import org.apache.spark.sql.functions._
import graft.queries.Profile

/** Semantic tests for the profiling family: table_stats against a
  * driver-side recompute, fk_integrity on the (referentially clean)
  * testdata AND on a synthetic corruption that must be caught.
  */
class ProfileSpec extends SparkSpecBase {

  test("table_stats matches driver-side recompute on key columns") {
    val out = Profile.tableStats(spark, sfDir).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_returnflag", "l_quantity").collect()
    val nRows = li.length.toLong
    assert(out.size === 11, "one row per lineitem column")
    out.values.foreach(r => assert(r.getAs[Long]("n_rows") === nRows))
    // exact distincts + engine-stable min/max, spot-checked on three kinds
    val ok = out("l_orderkey")
    assert(ok.getAs[Long]("n_distinct") === li.map(_.getLong(0)).distinct.length.toLong)
    assert(ok.getAs[String]("min_str") === li.map(_.getLong(0)).min.toString)
    assert(ok.getAs[String]("max_str") === li.map(_.getLong(0)).max.toString)
    val rf = out("l_returnflag")
    assert(rf.getAs[Long]("n_distinct") === li.map(_.getString(1)).distinct.length.toLong)
    assert(rf.getAs[String]("min_str") === li.map(_.getString(1)).min)
    val qty = out("l_quantity")
    // doubles render through DECIMAL(18,2): two digits, no scientific form
    assert(qty.getAs[String]("min_str").matches("-?\\d+\\.\\d{2}"))
    assert(qty.getAs[Long]("n_nonnull") === li.count(!_.isNullAt(2)).toLong)
  }

  test("table_stats_approx: single-scan plan, estimates inside the 5-sigma bound") {
    // library form: ONE pruned scan, no join, no second NDV pass
    val lib = Profile.tableStatsApprox(spark, sfDir)
    val p = lib.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), "approx profile must not join")
    assert(p.linesIterator.count(_.contains("ReadSchema")) === 1,
      "approx profile must scan lineitem exactly once")
    // numeric contract vs the exact twin — the bound the gate form emits
    val approx = lib.collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct_approx")).toMap
    val exact = Profile.tableStats(spark, sfDir).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, e) =>
      assert(math.abs(approx(c) - e).toDouble <= math.max(1.0, 5 * Profile.TsRsd * e),
        s"$c: approx=${approx(c)} exact=$e")
    }
    // gate form emits TRUE everywhere (what the oracle asserts literally)
    Profile.tableStatsApproxQuery(spark, sfDir).collect()
      .foreach(r => assert(r.getAs[Boolean]("ndv_within_rel_err"),
        r.getAs[String]("col_name")))
  }

  test("fk_integrity: clean star schema reports zero orphans everywhere") {
    val out = Profile.fkIntegrity(spark, sfDir).collect()
    assert(out.length === 7, "one row per declared relationship")
    out.foreach { r =>
      assert(r.getAs[Long]("n_child") > 0, r.getAs[String]("relationship"))
      assert(r.getAs[Long]("n_orphans") === 0L, r.getAs[String]("relationship"))
      assert(r.getAs[Long]("orphan_bp") === 0L, r.getAs[String]("relationship"))
    }
  }

  test("fk_integrity: a synthetically orphaned dim row is counted") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fk-orphan").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    // corrupt: one nation row pointing at a region that does not exist
    val nation = spark.read.parquet(s"$tmp/nation.parquet")
    val bad = nation.limit(1)
      .withColumn("n_nationkey", lit(9999L))
      .withColumn("n_regionkey", lit(8888L))
    nation.unionAll(bad).write.mode("overwrite").parquet(s"$tmp/nation2.parquet")
    // parquet overwrite-in-place of an input we are reading is unsafe; move
    val fs = java.nio.file.Paths.get(tmp)
    def replace(from: String, to: String): Unit = {
      val walk = java.nio.file.Files.walk(fs.resolve(to))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      } finally walk.close()
      java.nio.file.Files.move(fs.resolve(from), fs.resolve(to))
    }
    replace("nation2.parquet", "nation.parquet")
    val out = Profile.fkIntegrity(spark, tmp).collect()
      .map(r => r.getAs[String]("relationship") -> r).toMap
    val broken = out("nation.n_regionkey->region.r_regionkey")
    assert(broken.getAs[Long]("n_orphans") === 1L)
    assert(broken.getAs[Long]("orphan_bp") ===
      10000L / broken.getAs[Long]("n_child"))
    // the corruption is local: every other relationship stays clean
    (out - "nation.n_regionkey->region.r_regionkey").values.foreach { r =>
      assert(r.getAs[Long]("n_orphans") === 0L, r.getAs[String]("relationship"))
    }
  }

  test("mixture_epochs: schedule matches exact integer recompute") {
    val out = graft.llm.Sampling.mixtureEpochs(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val docs = Tables.documents(spark, sfDir)
      .select(coalesce(col("source"), lit("")).as("source"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
          .cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = bySrc.values.sum
    val isq = bySrc.view.mapValues(t => math.floor(math.sqrt(t.toDouble) * 1e6).toLong).toMap
    val sumIsq = isq.values.sum
    assert(out.keySet === bySrc.keySet)
    bySrc.foreach { case (s, t) =>
      val target =
        if (sumIsq == 0) 0L
        else ((BigInt(graft.llm.Sampling.EpochBudgetMult) * total * isq(s)) / sumIsq).toLong
      val epochs =
        if (t == 0) 0L
        else math.min(graft.llm.Sampling.EpochCapE2, (100L * target) / t)
      val eff = epochs * t / 100L
      val r = out(s)
      assert(r.getAs[Long]("src_toks") === t, s"src_toks($s)")
      assert(r.getAs[Long]("target_toks") === target, s"target_toks($s)")
      assert(r.getAs[Long]("epochs_e2") === epochs, s"epochs_e2($s)")
      assert(r.getAs[Long]("effective_toks") === eff, s"effective_toks($s)")
      assert(r.getAs[Long]("deficit_toks") === math.max(0L, target - eff))
      assert(epochs <= graft.llm.Sampling.EpochCapE2)
    }
    // the schedule is non-degenerate: some source repeats more than 1x
    assert(out.values.exists(_.getAs[Long]("epochs_e2") > 100L),
      "a 2x budget must push at least one source past one epoch")
  }

  test("embed_outliers: per-cluster mean and flag are internally exact") {
    val rows = graft.llm.Ann.embedOutliers(spark, sfDir).collect()
    Checkpoints.releaseAll()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (_, rs) =>
      val ce4p = rs.map(_.getAs[Long]("cos_e4") + 10000L)
      val mean = ce4p.sum / ce4p.length
      rs.foreach { r =>
        assert(r.getAs[Long]("cluster_mean_e4") === mean - 10000L)
        assert(r.getAs[Long]("cluster_size") === rs.length.toLong)
        val dev = (mean - 10000L) - r.getAs[Long]("cos_e4")
        assert(r.getAs[Boolean]("is_outlier") === (dev > graft.llm.Ann.OutlierDevE4))
      }
    }
    // cosines are real cosines: shifted values stay inside [0, 20000]
    rows.foreach { r =>
      val c = r.getAs[Long]("cos_e4")
      assert(c >= -10000L && c <= 10000L)
    }
  }
}
