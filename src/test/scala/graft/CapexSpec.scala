package graft

import org.apache.spark.sql.functions._
import graft.capex.{CapexDerive, CapexVocab}

/** Behavior checks for the capex rule engine at sf0.001 (full cross-engine
  * parity is covered by Verify + the DuckDB oracle; these specs pin the
  * semantics the reference mandates).
  */
class CapexSpec extends SparkSpecBase {

  private lazy val enr = CapexDerive.enriched(spark, sfDir)

  test("derivation is non-null and rid is unique") {
    val n = enr.count()
    assert(n == 6000)
    assert(enr.select("rid").distinct().count() == n)
    // nullable by design: the exclusion attribution trio is null on survivors
    val nullableOk = Set("excluded_by", "trigger_column", "trigger_value")
    val nullCounts = enr.select(
      enr.columns.filterNot(nullableOk).map(c =>
        sum(when(col(c).isNull, 1).otherwise(0)).as(c)): _*).head()
    assert(nullCounts.toSeq.forall(_ == 0L), s"nulls found: $nullCounts")
    // and the trio is always set together
    assert(enr.filter(col("excluded_by").isNotNull &&
      (col("trigger_column").isNull || col("trigger_value").isNull)).count() == 0)
  }

  test("status rule trims and casefolds") {
    val removed = enr.filter(col("rm_r1")).select("CurrentStatus").distinct()
      .collect().map(_.getString(0)).toSet
    assert(removed == Set("Rejected", " rejected "))
  }

  test("exact-match function filters do not trim (' it ' is not 'IT')") {
    assert(enr.filter(col("RequestFunction") === " it " && col("rm_r8")).count() == 0)
    // but the trimmed removal set does casefold+trim
    assert(enr.filter(col("rm_r3")).select("RequestFunction").distinct()
      .collect().map(_.getString(0)).toSet == Set("CS", "FA", "Sales", "Vigilance"))
  }

  test("office/furniture recode spares allowed items and feeds rule 5") {
    val recoded = enr.filter(col("acat_recode") === "PLANT & MACHINERY" &&
      col("AssetCategoryName") =!= "PLANT & MACHINERY")
    assert(recoded.count() > 0)
    // allowed item keeps its raw furniture category and then dies at rule 5
    val chairs = enr.filter(col("AssetItemName") === "Office Chairs Set" &&
      upper(trim(col("AssetCategoryName"))).isin("FURNITURE", "FURINTURE"))
    assert(chairs.count() > 0)
    assert(chairs.filter(col("acat_recode") === "PLANT & MACHINERY").count() == 0)
    assert(chairs.filter(!col("rm_r5")).count() == 0)
  }

  test("zone mapping: branch join, remark fallback, Unknown default") {
    val m = enr.select("BranchCode", "Zone", "Region", "UserRemarks")
    // mapped branch
    assert(m.filter(col("BranchCode") === "NATION_7" && col("Region") =!= "MUM").count() == 0)
    // unmapped branch + ASIA remark → fallback
    val fb = m.filter(col("BranchCode").startsWith("BR-") &&
      col("UserRemarks").contains("ASIA"))
    assert(fb.count() > 0)
    assert(fb.filter(col("Zone") =!= "ASIA").count() == 0)
    // unmapped + no region code → Unknown
    val unk = m.filter(col("BranchCode").startsWith("BR-") &&
      !col("UserRemarks").contains("ASIA") && !col("UserRemarks").contains("EUROPE"))
    assert(unk.filter(col("Zone") =!= "Unknown").count() == 0)
  }

  test("exclusion label is the first matching rule in pipeline order") {
    val both = enr.filter(col("rm_r1") && col("rm_r18"))
    assert(both.filter(col("excluded_by") =!= CapexVocab.LabelR1).count() == 0)
  }

  test("representative selection keeps at most 5 rows per request") {
    val over = CapexDerive.ranked(spark, sfDir).filter(col("rk") <= 5)
      .groupBy("RequestNo").count().filter(col("count") > 5)
    assert(over.count() == 0)
  }

  test("fail-open reinstates only survivor keys missing from kept") {
    val re = CapexDerive.reinstated(spark, sfDir)
    assert(re.count() > 0) // the operator genuinely fires on this data
    val keptKeys = CapexDerive.kept(spark, sfDir).select("key_robust").distinct()
    assert(re.join(keptKeys, Seq("key_robust"), "left_semi").count() == 0)
  }

  test("pipeline output carries both kept and reinstated rows") {
    val p = CapexDerive.pipeline(spark, sfDir)
    val n = p.count()
    val rein = p.filter(col("ReincludedViaFailOpen")).count()
    assert(n > 0 && rein > 0 && rein < n)
    // reinstated rows have no Category_Type (raw rows, not transformed)
    assert(p.filter(col("ReincludedViaFailOpen") && col("Category_Type").isNotNull).count() == 0)
  }

  test("category tags: rental beats sorter beats amc; MUM comment appended") {
    assert(enr.filter(col("AssetItemName") === "AMC for Sorter Line" &&
      col("category_type") =!= "Sorter").count() == 0)
    assert(enr.filter(col("AssetItemName") === "Rental Forklift" &&
      col("category_type") =!= "Rental_Opex").count() == 0)
    val mum = enr.filter(col("Region") === "MUM")
    assert(mum.count() > 0)
    assert(mum.filter(!col("remarks_final").endsWith(CapexVocab.MumComment)).count() == 0)
  }
}
