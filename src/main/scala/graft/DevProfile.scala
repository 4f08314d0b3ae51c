package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.capex.{CapexDerive, CapexVocab}
import graft.functions.TextMatch
import CapexVocab._

/** Dev-only stage profiler for the capex enriched plan (not part of the
  * library surface; deleted once the plan is tuned).
  */
object DevProfile {
  def t(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  private def pick(vocab: Seq[String], idx: Column): Column =
    element_at(array(vocab.map(lit): _*), (idx % vocab.size).cast("int") + 1)
  private def containsAny(c: Column, kws: Seq[String]): Column =
    kws.map(k => lower(c).contains(k.toLowerCase)).reduce(_ || _)
  private def caseMap(c: Column, m: Seq[(String, String)]): Column =
    m.foldRight(c) { case ((from, to), acc) => when(c === from, to).otherwise(acc) }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    if (args.contains("pipe")) {
      import scala.jdk.CollectionConverters._
      def gcMs: Long = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
      def jitMs: Long = java.lang.management.ManagementFactory
        .getCompilationMXBean.getTotalCompilationTime
      for (i <- 1 to 3) {
        CapexDerive.clearCache()
        val (g0, j0) = (gcMs, jitMs)
        var t1 = System.nanoTime()
        val enr = CapexDerive.enriched(spark, dir)
        println(f"[prof] i$i p-enriched-build ${(System.nanoTime() - t1) / 1e9}%.2f s" +
          s" (gc+${gcMs - g0}ms jit+${jitMs - j0}ms)")
        t1 = System.nanoTime()
        val p = CapexDerive.pipeline(spark, dir)
        println(f"[prof] i$i p-pipeline-build ${(System.nanoTime() - t1) / 1e9}%.2f s")
        t(s"i$i p-pipeline-mat")(noop(p))
      }
      spark.stop()
      return
    }

    val base = CapexDerive.raw(spark, dir)
    t("raw")(noop(base))
    val off = CapexDerive.offices(spark, dir).select(
      col("office"), col("zone").as("map_zone"), col("region").as("map_region"))
    val rc = CapexDerive.regionCodes(spark, dir)
    val mapped = base
      .withColumn("rem_norm",
        concat(lit(" "), regexp_replace(upper(col("UserRemarks")), "[^A-Z0-9]+", " "), lit(" ")))
      .join(broadcast(off), base("BranchCode") === off("office"), "left")
      .join(broadcast(rc),
        col("office").isNull &&
          col("rem_norm").contains(concat(lit(" "), col("regioncode"), lit(" "))),
        "left")
      .withColumn("Zone", coalesce(col("map_zone"), col("fb_zone"), lit("Unknown")))
      .withColumn("Region", coalesce(col("map_region"), col("fb_region"), lit("Unknown")))
      .drop("office", "map_zone", "map_region", "regioncode", "fb_zone", "fb_region", "rem_norm")
    t("mapped")(noop(mapped))

    val item = col("AssetItemName"); val icat = col("ItemCategory")
    val acatRaw = col("AssetCategoryName"); val rem = col("UserRemarks")
    val catu = caseMap(upper(trim(acatRaw)), OfficeFurnitureTypoMap)
    val isOfficeFurn = catu.rlike("\\bOFFICE\\b.*\\bEQUIP") || catu.rlike("\\bFURNIT")
    val allowedHit = containsAny(item, OfficeFurnitureAllowedItems)
    val acatRecode = when(isOfficeFurn && !allowedHit, "PLANT & MACHINERY").otherwise(acatRaw)
    val norm = (c: Column) => caseMap(upper(trim(c)), NormalizeMap)
    val withCats = mapped
      .withColumn("acat_recode", acatRecode)
      .withColumn("acat_norm", norm(col("acat_recode")))
      .withColumn("acat_norm_raw", norm(acatRaw))
      .withColumn("acat_split",
        PmSplitItems.reverse.foldRight(col("acat_norm")) { case (kw, acc) =>
          when(lower(item).contains(kw.toLowerCase), s"PLANT & MACHINERY - $kw").otherwise(acc)
        })
    t("withCats")(noop(withCats))

    var t0 = System.nanoTime()
    val remFlags = {
      val d = withCats.select(rem.as("UserRemarks")).distinct()
        .withColumn("rtoks", TextMatch.tokens(col("UserRemarks")))
        .localCheckpoint(true)
        .withColumn("nn", TextMatch.nonNegatedTokens(col("rtoks")))
        .localCheckpoint(true)
      d.select(col("UserRemarks"),
        TextMatch.isTestDemo(col("rtoks"), col("nn")).as("flag_test_demo"),
        TextMatch.isPersonal(col("rtoks"), col("nn")).as("flag_personal"),
        TextMatch.isExperimental(col("rtoks"), col("nn")).as("flag_experimental"),
        TextMatch.mentionsDarkStore(col("rtoks"), col("nn")).as("flag_dark_store"),
        TextMatch.mentionsCounter(col("rtoks"), col("nn")).as("flag_counter"),
        TextMatch.mentionsDsWord(col("rtoks")).as("flag_ds"))
    }
    println(f"[prof] remFlags-build ${(System.nanoTime() - t0) / 1e9}%.2f s")

    t0 = System.nanoTime()
    val devDim = {
      val d = withCats.select(item, icat, col("acat_recode"), rem).distinct()
        .withColumn("dtoks", TextMatch.tokens(concat_ws(" ", item, icat, col("acat_recode"), rem)))
        .localCheckpoint(true)
        .withColumn("nn_d", TextMatch.nonNegatedTokens(col("dtoks")))
        .localCheckpoint(true)
      d.select(col("AssetItemName"), col("ItemCategory"), col("acat_recode"), col("UserRemarks"),
        TextMatch.anyPhraseNonNegated(col("dtoks"), col("nn_d"),
          TextMatch.PersonalDeviceWords).as("device_hit"))
    }
    println(f"[prof] devDim-build ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t("devDim-mat")(noop(devDim))

    val withFlags = withCats
      .join(broadcast(remFlags), Seq("UserRemarks"))
      .join(broadcast(devDim),
        Seq("AssetItemName", "ItemCategory", "acat_recode", "UserRemarks"))
      .withColumn("nonrel",
        col("flag_test_demo") || col("flag_personal") || col("flag_experimental"))
    t("withFlags")(noop(withFlags))

    val kwHit = (kw: String) =>
      lower(item).contains(kw.toLowerCase) || lower(icat).contains(kw.toLowerCase) ||
        lower(rem).contains(kw.toLowerCase)
    val cctvHit = Seq(item, icat, rem)
      .map(c => lower(c).contains("cctv") || lower(c).contains("camera")).reduce(_ || _)
    val withRules = withFlags
      .withColumn("rm_r1", lower(trim(col("CurrentStatus"))) === "rejected")
      .withColumn("rm_r2", trim(col("IsSelectedVendor")) === "-")
      .withColumn("rm_r3", lower(trim(col("RequestFunction"))).isin(RemovedFunctions: _*))
      .withColumn("rm_r3a", TextMatch.isExcludedEquipment(concat_ws(" ", item, icat, acatRaw)))
      .withColumn("rm_r5", !lower(trim(col("acat_norm"))).isin(AllowedCategories: _*))
      .withColumn("rm_r5a", col("device_hit"))
      .withColumn("rm_r6",
        col("flag_ds") || col("flag_dark_store") ||
          (col("flag_counter") && !containsAny(item, LegitimateCounterItems)))
      .withColumn("rm_r8", col("RequestFunction") === "IT" && col("nonrel"))
      .withColumn("rm_r9",
        (col("CurrentStatus") === "Approval in Progress") ||
          (col("CurrentStatus") === "Sent for Approval" && col("nonrel")))
      .withColumn("rm_r10", col("flag_dark_store"))
      .withColumn("rm_r11", col("RequestFunction") === "Admin" && col("nonrel"))
      .withColumn("rm_r12", col("RequestFunction") === "Ops" && col("nonrel"))
      .withColumn("rm_r13", col("RequestFunction") === "Ops through IT" && col("nonrel"))
      .withColumn("rm_r18", NonOpsKeywords.map(kwHit).reduce(_ || _) || cctvHit)
    t("withRules")(noop(withRules))

    val full = CapexDerive.enriched(spark, dir)
    t("enriched-full")(noop(full))
    t("enriched-cached-reuse")(noop(full))
    CapexDerive.clearCache()

    t0 = System.nanoTime()
    val p = CapexDerive.pipeline(spark, dir)
    println(f"[prof] pipeline-build ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t("pipeline-mat")(noop(p))
    CapexDerive.clearCache()
    spark.stop()
  }
}
