package graft

import graft.queries.Analytics

/** Smoke + shape checks for the headline analytics queries at sf0.001. */
class AnalyticsSpec extends SparkSpecBase {

  test("q1_agg produces grouped rows with expected columns") {
    val df = Analytics.q1Agg(spark, sfDir)
    assert(df.columns.toSeq == Seq("l_returnflag", "l_linestatus", "sum_qty",
      "sum_base_price", "sum_disc_price", "avg_qty", "avg_disc", "count_order"))
    val n = df.count()
    assert(n > 0 && n < 20)
  }

  test("q3_join returns revenue per order") {
    val df = Analytics.q3Join(spark, sfDir)
    assert(df.count() > 0)
  }

  test("q5_multijoin groups by region/nation") {
    val df = Analytics.q5MultiJoin(spark, sfDir)
    assert(df.count() > 0)
  }

  test("q6_filter pushes its predicates into the parquet scan") {
    val df = Analytics.q6Filter(spark, sfDir)
    assert(df.count() == 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
  }

  test("topk_per_group keeps at most 3 rows per customer") {
    val df = Analytics.topkPerGroup(spark, sfDir)
    val maxPer = df.groupBy("o_custkey").count().agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
    assert(maxPer <= 3)
  }

  test("q1_rollup levels reconcile: details and subtotals both sum to the grand total") {
    import org.apache.spark.sql.functions._
    val r = Analytics.q1Rollup(spark, sfDir)
    val total = Tables.lineitem(spark, sfDir).count()
    // grand total (lvl=3), per-returnflag subtotals (lvl=1), details (lvl=0)
    assert(r.filter(col("lvl") === 3).select("count_order").head.getLong(0) == total)
    assert(r.filter(col("lvl") === 1).agg(sum("count_order")).head.getLong(0) == total)
    assert(r.filter(col("lvl") === 0).agg(sum("count_order")).head.getLong(0) == total)
    // detail slice is exactly q1_agg's grouping
    assert(r.filter(col("lvl") === 0).count() == Analytics.q1Agg(spark, sfDir).count())
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("merge_upsert applies deletes, updates and inserts exactly") {
    import org.apache.spark.sql.functions._
    val t = Tables.orders(spark, sfDir)
    val merged = queries.Merge.mergeUpsert(spark, sfDir)
    val k = col("o_orderkey")
    val nDel = t.filter(k % 13 === 0).count()
    val nIns = t.filter(k % 11 === 0).count()
    assert(merged.count() === t.count() - nDel + nIns)
    // deletes gone; inserts present with status N; updates re-statused
    assert(merged.filter(k % 13 === 0 && k < queries.Merge.InsertKeyOffset).count() === 0)
    assert(merged.filter(k >= queries.Merge.InsertKeyOffset).count() === nIns)
    assert(merged.filter(k >= queries.Merge.InsertKeyOffset &&
      col("o_orderstatus") =!= "N").count() === 0)
    assert(merged.filter(k % 7 === 0 && k % 13 =!= 0 && k < queries.Merge.InsertKeyOffset &&
      col("o_orderstatus") =!= "X").count() === 0)
    // untouched rows pass through byte-identical
    val untouched = t.filter(k % 7 =!= 0 && k % 13 =!= 0)
    val mergedUntouched = merged.filter(k % 7 =!= 0 && k % 13 =!= 0 &&
      k < queries.Merge.InsertKeyOffset)
    assert(mergedUntouched.exceptAll(untouched).count() === 0)
    assert(untouched.exceptAll(mergedUntouched).count() === 0)
  }

  test("snapshot_diff recovers exactly the merge's synthesized change feed") {
    import org.apache.spark.sql.functions._
    val t = Tables.orders(spark, sfDir)
    val diff = queries.Merge.snapshotDiff(spark, sfDir)
    val k = col("o_orderkey")
    // class membership mirrors the merge's delta construction exactly
    val nDel = t.filter(k % 13 === 0).count()
    val nUpd = t.filter(k % 7 === 0 && k % 13 =!= 0).count()
    val nIns = t.filter(k % 11 === 0).count()
    val byOp = diff.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byOp === Map("D" -> nDel, "U" -> nUpd, "I" -> nIns))
    assert(diff.filter(col("op") === "D" && (k % 13 =!= 0)).count() === 0)
    assert(diff.filter(col("op") === "I" &&
      k < queries.Merge.InsertKeyOffset).count() === 0)
    // delete rows carry null payload (CDC convention)
    assert(diff.filter(col("op") === "D" && col("o_custkey").isNotNull).count() === 0)
    // update rows carry the NEW payload
    assert(diff.filter(col("op") === "U" && col("o_orderstatus") =!= "X").count() === 0)
  }
}
