package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.PartitionedSink

/** Proves the partition-pruning claim with plan internals: a filter on the
  * partition column reaches the scan as a PartitionFilter and the scan's
  * selected-partition count shrinks to the matching slice — zero bytes of
  * the other partitions are read.
  */
class PartitioningSpec extends SparkSpecBase {

  // per-run temp dir: a fixture from an older code/schema version must
  // never be reused across runs (it would validate against stale files)
  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft-test-partitioned")
      .resolve("documents").toString
    PartitionedSink.writePartitioned(Tables.documents(spark, sfDir), p, Seq("lang"))
    p
  }

  private def ensureWritten(): Unit = { val _ = path }

  test("lang filter prunes the scan to one partition directory") {
    ensureWritten()
    val nLangs = Tables.documents(spark, sfDir)
      .select("lang").distinct().count().toInt

    def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case s: FileSourceScanExec => s }.get

    val all = PartitionedSink.readPartitioned(spark, path)
    assert(scanOf(all).selectedPartitions.partitionCount == nLangs)

    val en = all.filter(col("lang") === "en")
    val scan = scanOf(en)
    // the filter became a partition-directory filter, not a row filter
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      scan.partitionFilters.mkString(", "))
    assert(scan.selectedPartitions.partitionCount == 1)
  }

  test("partitioned + bucketed table: pruned scan AND exchange-free clustering") {
    // the full 100 TB layout: directory partitions prune the low-cardinality
    // filter, buckets satisfy the high-cardinality clustering — one query
    // exercises both
    // rebuild unconditionally each run — same staleness rule as `path`
    spark.sql("DROP TABLE IF EXISTS docs_pb")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "docs_pb")
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(loc)
      try walk.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally walk.close()
    }
    Tables.documents(spark, sfDir).write.mode("overwrite")
      .partitionBy("lang").bucketBy(4, "doc_id").format("parquet")
      .saveAsTable("docs_pb")
    val q = spark.table("docs_pb").filter(col("lang") === "en")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    // the agg plan is AQE-wrapped (unlike the plain filter above) — unwrap
    // before walking to the scan leaf
    val plan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = plan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      scan.partitionFilters.mkString(", "))
    assert(scan.selectedPartitions.partitionCount == 1)
    assert(!plan.toString.contains("Exchange"), plan.toString.take(600))
    // and it computes the right thing
    val expect = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").count()
    assert(q.agg(sum("n")).head.getLong(0) == expect)
  }

  test("range-clustered sink: files own pairwise-disjoint key slices") {
    import graft.sources.SortedSink
    val out = java.nio.file.Files.createTempDirectory("graft-test-sorted")
      .resolve("events").toString
    val src = Tables.events(spark, sfDir).select("event_id", "value")
    SortedSink.writeSorted(src, out, Seq("value"), numFiles = 8)
    val back = SortedSink.readSorted(spark, out)
    assert(back.count() == src.count())
    // per-file value ranges from the data itself (what the parquet footer
    // min/max will say): disjoint ⇒ a range predicate prunes whole files
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("value").as("lo"), max("value").as("hi"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    ranges.sliding(2).filter(_.length == 2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file ranges: hi=$hi > next lo=$lo")
    }
    // and the clustering is balanced despite the skewless-uniform testdata
    val counts = back.groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(counts.min > 0)
  }

  test("z-order sink: file boxes are tight on BOTH columns; rectangle prunes") {
    import graft.sources.ZOrderSink
    val out = java.nio.file.Files.createTempDirectory("graft-test-zorder")
      .resolve("events").toString
    val src = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "value")
    ZOrderSink.writeZOrdered(src, out, "user_id", "value", numFiles = 16)
    val back = ZOrderSink.readZOrdered(spark, out)
    assert(back.count() == src.count())
    // per-file bounding boxes on both dimensions — what the parquet
    // footers will report to the scan's file-skipping
    val boxes = back.groupBy(input_file_name().as("f"))
      .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
        min("value").as("vlo"), max("value").as("vhi"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(boxes.length > 8, "expected many files")
    val (uMin, uMax) = (boxes.map(_._1).min, boxes.map(_._2).max)
    val (vMin, vMax) = (boxes.map(_._3).min, boxes.map(_._4).max)
    // a centered 25%×25% rectangle query must be able to skip most files;
    // under a 1-D sort one dimension's boxes would span the whole range
    // and prune nothing by itself
    def mid(lo: Double, hi: Double) = (lo + 0.375 * (hi - lo), lo + 0.625 * (hi - lo))
    val (qul, quh) = mid(uMin.toDouble, uMax.toDouble)
    val (qvl, qvh) = mid(vMin, vMax)
    val hit = boxes.count { case (ulo, uhi, vlo, vhi) =>
      uhi >= qul && ulo <= quh && vhi >= qvl && vlo <= qvh
    }
    assert(hit <= boxes.length / 2,
      s"z-order locality: $hit of ${boxes.length} file boxes intersect a 25% rectangle")
    // balance: the range exchange on the code keeps files non-degenerate
    val counts = back.groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(counts.min > 0 && counts.max < src.count())
    // rows survive byte-identically
    assert(back.select("event_id").exceptAll(src.select("event_id")).count() == 0)
  }

  test("partitioned round-trip preserves rows and the partition column") {
    ensureWritten()
    val src = Tables.documents(spark, sfDir)
    val back = PartitionedSink.readPartitioned(spark, path)
    assert(back.count() == src.count())
    val a = back.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = src.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    // doc_ids survive the reshuffle into directories
    assert(back.select("doc_id").exceptAll(src.select("doc_id")).count() == 0)
  }
}
