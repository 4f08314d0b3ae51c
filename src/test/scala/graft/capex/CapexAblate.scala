package graft.capex

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-loop ablation timer for the capex enriched build (r13 optimization
  * round): times each build stage in isolation (noop sink, best-of-N) so
  * the 600k-row expression CPU can be attributed to a stage rather than
  * guessed. Same package as CapexDerive to reach the private pieces via
  * the package-private seams.
  *
  * Usage: Test/runMain graft.capex.CapexAblate [sfDir] [reps]
  */
object CapexAblate {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = graft.GraftSession.create(cpus)

    def time(label: String)(mk: => DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val best = (1 to reps).map(_ => once()).min
      println(f"[ablate] $label%-28s $best%7.3f s")
      CapexDerive.clearCache()
      graft.Checkpoints.releaseAll()
    }

    // raw() sub-stages, reconstructed inline (dev tool, same package)
    val li0 = graft.Tables.lineitem(spark, sfDir)
    val liRep = li0.repartition(spark.sparkContext.defaultParallelism,
      concat(lit("REQ-"), (col("l_orderkey") / 16).cast("bigint").cast("string")))
    time("scan lineitem")(li0)
    time("scan+repartition")(liRep)
    time("+join orders")(liRep.join(graft.Tables.orders(spark, sfDir),
      col("l_orderkey") === col("o_orderkey")))
    time("+cust/nation bcast")(liRep
      .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(graft.Tables.customer(spark, sfDir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(graft.Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey")))
    time("raw (full projection)")(CapexDerive.raw(spark, sfDir))

    // enrichment sub-stages (inline copies of buildEnriched's locals)
    import CapexVocab._
    def mapped0 = {
      val base = CapexDerive.raw(spark, sfDir)
      val off = CapexDerive.offices(spark, sfDir).select(
        col("office"), col("zone").as("map_zone"), col("region").as("map_region"))
      val rc = CapexDerive.regionCodes(spark, sfDir)
      base
        .withColumn("rem_norm",
          concat(lit(" "),
            regexp_replace(upper(col("UserRemarks")), "[^A-Z0-9]+", " "), lit(" ")))
        .join(broadcast(off), base("BranchCode") === off("office"), "left")
        .join(broadcast(rc),
          col("office").isNull &&
            col("rem_norm").contains(concat(lit(" "), col("regioncode"), lit(" "))),
          "left")
        .withColumn("Zone", coalesce(col("map_zone"), col("fb_zone"), lit("Unknown")))
        .withColumn("Region", coalesce(col("map_region"), col("fb_region"), lit("Unknown")))
        .drop("office", "map_zone", "map_region", "regioncode", "fb_zone", "fb_region", "rem_norm")
    }
    time("mapped (zone join)")(mapped0)
    def withCats0 = {
      val item = col("AssetItemName")
      val acatRaw = col("AssetCategoryName")
      def caseMap(c: org.apache.spark.sql.Column, m: Seq[(String, String)]) =
        m.foldRight(c) { case ((f, t), acc) => when(c === f, t).otherwise(acc) }
      def containsAny(c: org.apache.spark.sql.Column, kws: Seq[String]) =
        kws.map(k => lower(c).contains(k.toLowerCase)).reduce(_ || _)
      val catu = caseMap(upper(trim(acatRaw)), OfficeFurnitureTypoMap)
      val isOfficeFurn = catu.rlike("\\bOFFICE\\b.*\\bEQUIP") || catu.rlike("\\bFURNIT")
      val allowedHit = containsAny(item, OfficeFurnitureAllowedItems)
      val acatRecode = when(isOfficeFurn && !allowedHit, "PLANT & MACHINERY").otherwise(acatRaw)
      val norm = (c: org.apache.spark.sql.Column) => caseMap(upper(trim(c)), NormalizeMap)
      mapped0
        .withColumn("acat_recode", acatRecode)
        .withColumn("acat_norm", norm(col("acat_recode")))
        .withColumn("acat_norm_raw", norm(acatRaw))
        .withColumn("acat_split",
          PmSplitItems.reverse.foldRight(col("acat_norm")) { case (kw, acc) =>
            when(lower(item).contains(kw.toLowerCase), s"PLANT & MACHINERY - $kw").otherwise(acc)
          })
    }
    time("withCats (no cp)")(withCats0)
    // piecewise cats
    def catsPiece(n: Int) = {
      val item = col("AssetItemName")
      val acatRaw = col("AssetCategoryName")
      def caseMap(c: org.apache.spark.sql.Column, m: Seq[(String, String)]) =
        m.foldRight(c) { case ((f, t), acc) => when(c === f, t).otherwise(acc) }
      def containsAny(c: org.apache.spark.sql.Column, kws: Seq[String]) =
        kws.map(k => lower(c).contains(k.toLowerCase)).reduce(_ || _)
      val catu = caseMap(upper(trim(acatRaw)), OfficeFurnitureTypoMap)
      val isOfficeFurn = catu.rlike("\\bOFFICE\\b.*\\bEQUIP") || catu.rlike("\\bFURNIT")
      val allowedHit = containsAny(item, OfficeFurnitureAllowedItems)
      val acatRecode = when(isOfficeFurn && !allowedHit, "PLANT & MACHINERY").otherwise(acatRaw)
      val norm = (c: org.apache.spark.sql.Column) => caseMap(upper(trim(c)), NormalizeMap)
      val d1 = mapped0.withColumn("acat_recode", acatRecode)
      if (n == 1) d1
      else if (n == 2) d1.withColumn("acat_norm", norm(col("acat_recode")))
      else if (n == 3) d1.withColumn("acat_norm", norm(col("acat_recode")))
        .withColumn("acat_norm_raw", norm(acatRaw))
      else {
        val f1 = graft.plans.Fence(d1)
        f1.withColumn("acat_norm", norm(col("acat_recode")))
          .withColumn("acat_norm_raw", norm(acatRaw))
          .withColumn("acat_split",
            PmSplitItems.reverse.foldRight(col("acat_norm")) { case (kw, acc) =>
              when(lower(item).contains(kw.toLowerCase), s"PLANT & MACHINERY - $kw").otherwise(acc)
            })
      }
    }
    time("cats: +recode")(catsPiece(1))
    time("cats: +norm")(catsPiece(2))
    time("cats: +norm+raw")(catsPiece(3))
    time("cats: fenced full")(catsPiece(4))
    time("buildEnriched")(CapexDerive.buildEnriched(spark, sfDir))
    time("pipeline(full)")(CapexDerive.pipeline(spark, sfDir))
    spark.stop()
  }
}
