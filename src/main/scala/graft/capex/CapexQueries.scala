package graft.capex

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query + oracle catalog for the capex engine (SURVEY.md §2 A/B/C).
  * Spark side reads from CapexDerive (one Catalyst plan per query);
  * oracle side prefixes CapexSqlGen.withEnriched.
  */
object CapexQueries {

  private val W = CapexSqlGen.withEnriched
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private val dsumSql = (e: String) => s"CAST(sum(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"

  /** Reference ("ground truth") predicate for the validation operators (C1-C3):
    * categorical rules 1-5 plus a blanket non-relevant-remark cut. Chosen so
    * precision AND recall are both non-trivial vs the full pipeline.
    */
  private val refPredSql =
    "NOT (rm_r1 OR rm_r2 OR rm_r3 OR rm_r3a OR rm_r5) AND NOT nonrel"
  private def refPred: Column =
    !(col("rm_r1") || col("rm_r2") || col("rm_r3") || col("rm_r3a") || col("rm_r5")) && !col("nonrel")

  // Null-coalesced field-by-field like CapexDerive's keys, so Spark
  // concat_ws (skips NULLs) and DuckDB || (nulls the key) can't diverge on
  // NULL fields.
  private def robustKeyOf(df: DataFrame): DataFrame = {
    val req = coalesce(trim(col("RequestNo")), lit(""))
    val itm = coalesce(trim(col("AssetItemName")), lit(""))
    val ven = coalesce(trim(col("VendorName")), lit(""))
    df.withColumn("key_robust",
      when(ven === "", concat_ws("|", req, itm))
        .otherwise(concat_ws("|", req, itm, ven)))
  }

  private val robustKeySql =
    "CASE WHEN coalesce(trim(VendorName), '') = '' " +
      "THEN coalesce(trim(RequestNo), '') || '|' || coalesce(trim(AssetItemName), '') " +
      "ELSE coalesce(trim(RequestNo), '') || '|' || coalesce(trim(AssetItemName), '') || '|' || coalesce(trim(VendorName), '') END"

  /** Full-outer join of processed vs reference robust-key sets — the one
    * definition of TP/FP/FN shared by validate_prf and validate_mismatches
    * (columns: k, in_p, in_r with null marking absence).
    */
  private def keySetJoin(s: SparkSession, d: String): DataFrame = {
    val enr = CapexDerive.enriched(s, d)
    val refKeys = enr.filter(refPred).select(col("key_robust").as("k")).distinct()
    val procKeys = robustKeyOf(CapexDerive.pipeline(s, d)).select(col("key_robust").as("k")).distinct()
    procKeys.withColumn("in_p", lit(1))
      .join(refKeys.withColumn("in_r", lit(1)), Seq("k"), "full_outer")
  }

  /** The matching oracle CTE fragment (defines proc_keys/ref_keys). */
  private val keySetCtes =
    s"""ref_keys AS (
        SELECT DISTINCT key_robust AS k FROM enriched_m WHERE $refPredSql),
      proc_keys AS (SELECT DISTINCT $robustKeySql AS k FROM pipe)"""

  /** C1 metrics frame (tp/fp/fn/prec/rec/f1), shared by validate_prf and
    * validate_report. */
  private def prfFrame(s: SparkSession, d: String): DataFrame = {
    val joined = keySetJoin(s, d)
    val counts = joined.agg(
      sum(when(col("in_p").isNotNull && col("in_r").isNotNull, 1).otherwise(0)).as("tp"),
      sum(when(col("in_p").isNotNull && col("in_r").isNull, 1).otherwise(0)).as("fp"),
      sum(when(col("in_p").isNull && col("in_r").isNotNull, 1).otherwise(0)).as("fn"))
    counts.select(col("tp"), col("fp"), col("fn"),
      (col("tp").cast("double") / (col("tp") + col("fp"))).as("prec"),
      (col("tp").cast("double") / (col("tp") + col("fn"))).as("rec"))
      .withColumn("f1",
        when(col("prec") + col("rec") === 0.0, 0.0)
          .otherwise(lit(2.0) * col("prec") * col("rec") / (col("prec") + col("rec"))))
  }

  /** C3 field-accuracy frame, shared by validate_fields and validate_report. */
  private def fieldsFrame(s: SparkSession, d: String): DataFrame = {
    val enr = CapexDerive.enriched(s, d)
    val ref = enr.filter(refPred).groupBy(col("key_robust").as("k")).agg(
      dsum(col("AssetItemAmount")).as("r_amt"),
      sort_array(collect_set(lower(trim(col("Zone"))))).as("r_zones"),
      sort_array(collect_set(col("AssetCategoryName"))).as("r_cats"))
    val proc = robustKeyOf(CapexDerive.pipeline(s, d)).groupBy(col("key_robust").as("k")).agg(
      dsum(col("AssetItemAmount")).as("p_amt"),
      sort_array(collect_set(lower(trim(col("Zone"))))).as("p_zones"),
      sort_array(collect_set(col("AssetCategoryName"))).as("p_cats"))
    proc.join(ref, Seq("k"))
      .agg(count(lit(1)).as("n_matched"),
        sum(when(abs(col("p_amt") - col("r_amt")) > 0.01, 1).otherwise(0)).as("amount_mismatches"),
        sum(when(!(col("p_zones") === col("r_zones")), 1).otherwise(0)).as("zone_mismatches"),
        sum(when(!(col("p_cats") === col("r_cats")), 1).otherwise(0)).as("category_mismatches"))
      .select(col("n_matched"), col("amount_mismatches"), col("zone_mismatches"),
        col("category_mismatches"),
        ((col("n_matched") - col("amount_mismatches")).cast("double") / col("n_matched") * 100).as("amount_accuracy"),
        ((col("n_matched") - col("zone_mismatches")).cast("double") / col("n_matched") * 100).as("zone_accuracy"),
        ((col("n_matched") - col("category_mismatches")).cast("double") / col("n_matched") * 100).as("category_accuracy"))
  }

  /** Per-sheet composite-key stats (validate_composite_primary_key,
    * process_capex.py:1272-1351): totals, unique/duplicate strict keys,
    * rows with blank key components, PASS/FAIL. Column names are prefixed
    * so three sheets cross-join into the one-row report.
    */
  private def sheetStats(df: DataFrame, keyCol: String, prefix: String): DataFrame = {
    val byKey = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val tot = df.agg(count(lit(1)).as(s"${prefix}_total"),
      sum(when(trim(col("RequestNo")) === "" || trim(col("AssetItemName")) === "" ||
        trim(col("VendorName")) === "", 1).otherwise(0)).as(s"${prefix}_missing"))
    val uniq = byKey.agg(
      sum(when(col("cnt") === 1, 1).otherwise(0)).as(s"${prefix}_unique"),
      sum(when(col("cnt") > 1, 1).otherwise(0)).as(s"${prefix}_dup"))
    tot.crossJoin(uniq).withColumn(s"${prefix}_status",
      when(col(s"${prefix}_missing") > 0 || col(s"${prefix}_dup") > 0, "FAIL")
        .otherwise("PASS"))
  }

  /** The oracle CTE twin of sheetStats (fromExpr must expose RequestNo/
    * AssetItemName/VendorName and the strict key under `keyExpr`). */
  private def sheetStatsSql(fromExpr: String, keyExpr: String, prefix: String): String =
    s"""${prefix}_bykey AS (SELECT $keyExpr AS ck, count(*) AS cnt FROM $fromExpr GROUP BY 1),
      ${prefix}_tot AS (SELECT count(*) AS ${prefix}_total,
        CAST(sum(CASE WHEN trim(RequestNo) = '' OR trim(AssetItemName) = ''
                 OR trim(VendorName) = '' THEN 1 ELSE 0 END) AS BIGINT) AS ${prefix}_missing
        FROM $fromExpr),
      ${prefix}_uniq AS (SELECT
        CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ${prefix}_unique,
        CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS ${prefix}_dup
        FROM ${prefix}_bykey)"""

  // ---------------------------------------------------------------- A rules
  private def removedBy(flag: String, outCol: String)(s: SparkSession, d: String): DataFrame =
    CapexDerive.enriched(s, d).filter(col(flag)).select(col("rid"), col(outCol))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rule_status_filter"    -> (removedBy("rm_r1", "CurrentStatus") _),
    "rule_dash_filter"      -> (removedBy("rm_r2", "IsSelectedVendor") _),
    "rule_function_filter"  -> (removedBy("rm_r3", "RequestFunction") _),
    "rule_equipment_filter" -> (removedBy("rm_r3a", "AssetItemName") _),
    "text_negation_flags"   -> ((s, d) => CapexDerive.enriched(s, d).select(
      col("rid"), col("flag_test_demo"), col("flag_personal"), col("flag_experimental"),
      col("flag_dark_store"), col("flag_counter"), col("flag_ds"), col("device_hit"))),
    "rule_remark_filter"    -> ((s, d) => CapexDerive.enriched(s, d)
      .filter(col("rm_r8") || col("rm_r11") || col("rm_r12") || col("rm_r13"))
      .select(col("rid"), col("RequestFunction"))),
    "rule_ds_counter_filter" -> (removedBy("rm_r6", "UserRemarks") _),
    "rule_personal_device"  -> (removedBy("rm_r5a", "AssetItemName") _),
    "rule_non_ops"          -> (removedBy("rm_r18", "AssetItemName") _),
    "exclusion_reasons"     -> ((s, d) => CapexDerive.enriched(s, d)
      .filter(col("excluded_by").isNotNull).select(col("rid"), col("excluded_by"))),
    // A10 detail: structured exclusion reason (label + trigger column/value),
    // mirroring the reference's _record_exclusions entries + FN display
    // (process_capex.py:181-223, app.py:458-476)
    "exclusion_detail"      -> ((s, d) => CapexDerive.enriched(s, d)
      .filter(col("excluded_by").isNotNull)
      .select(col("rid"), col("excluded_by"), col("trigger_column"), col("trigger_value"))),

    // -------------------------------------------------------------- B ops
    "normalize_category" -> ((s, d) => CapexDerive.enriched(s, d)
      .select(col("rid"), col("acat_norm_raw").as("normalized_category"))),
    "recode_office_furniture" -> ((s, d) => CapexDerive.enriched(s, d)
      .select(col("rid"), col("acat_recode").as("recoded_category"))),
    "map_zone_region" -> ((s, d) => CapexDerive.enriched(s, d)
      .select(col("rid"), col("BranchCode"), col("Zone"), col("Region"))),
    "split_pm_subcategory" -> ((s, d) => CapexDerive.enriched(s, d)
      .select(col("rid"), col("acat_split").as("subcategory"))),
    "tag_category_type" -> ((s, d) => CapexDerive.enriched(s, d)
      .select(col("rid"), col("category_type"))),
    "append_region_comment" -> ((s, d) => CapexDerive.enriched(s, d)
      .select(col("rid"), col("remarks_final"))),
    "pivot_amounts" -> ((s, d) => CapexDerive.enriched(s, d)
      .filter(col("excluded_by").isNull || col("excluded_by").startsWith("18:"))
      .groupBy(col("Zone"), col("Region"), col("acat_norm").as("AssetCategoryName_2"), col("RequestDate"))
      .agg(dsum(col("AssetItemAmount")).as("total_amount"))),
    "summary_report" -> ((s, d) => {
      val p = CapexDerive.pipeline(s, d)
      def sub(dim: String, c: Column) = p.groupBy(c.as("dim_value"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("AssetItemAmount")).as("total_amount"))
        .withColumn("dim_type", lit(dim))
        .withColumn("avg_amount", col("total_amount") / col("n_rows"))
        .select(col("dim_type"), col("dim_value"), col("n_rows"), col("total_amount"), col("avg_amount"))
      sub("zone", col("Zone"))
        .unionByName(sub("category", col("AssetCategoryName_2")))
        .unionByName(sub("function", col("RequestFunction")))
    }),
    "composite_key" -> ((s, d) => CapexDerive.enriched(s, d)
      .select(col("rid"), col("key_strict").as("composite_key"), col("key_robust").as("robust_key"))),
    "representative_rows" -> ((s, d) => CapexDerive.ranked(s, d)
      .filter(col("rk") <= 5).select(col("rid"), col("RequestNo"), col("priority"), col("rk"))),
    "semi_filter" -> ((s, d) => {
      val enr = CapexDerive.enriched(s, d)
      val keyset = enr.filter(col("CurrentStatus") === "Approved").select("RequestNo")
      enr.join(keyset.distinct(), Seq("RequestNo"), "left_semi").select(col("rid"), col("RequestNo"))
    }),
    "fail_open_reinstate" -> ((s, d) => CapexDerive.reinstated(s, d)
      .select(col("rid"), col("key_robust"), lit(true).as("reincluded"),
        lit(CapexVocab.FailOpenNote).as("fail_open_note"))),
    "capex_pipeline" -> (CapexDerive.pipeline _),
    // B14b: the same flagship over the RequestNo-bucketed enriched fact
    // (SURVEY §5's production layout) — identical rows, zero-exchange tail
    "capex_pipeline_bucketed" -> (CapexDerive.pipelineBucketed _),
    // app.py output_tab3 "Specialized Items": the AMC / Sorter / Rental_Opex
    // filtered downloads of the processed frame
    "specialized_items" -> ((s, d) => CapexDerive.pipeline(s, d)
      .filter(col("Category_Type").isin("AMC", "Sorter", "Rental_Opex"))
      .select(col("rid"), col("Category_Type"), col("AssetItemName"),
        col("AssetItemAmount"), col("Zone"))),

    // A10c: the reference's user-facing prose for why a raw row would be
    // excluded (explain_exclusion_reason, process_capex.py:385-501) —
    // 'Unknown' for rows no explain branch catches.
    "exclusion_explain" -> ((s, d) => CapexDerive.enriched(s, d)
      .select(col("rid"), CapexDerive.explainReason.as("exclusion_reason"))),

    // -------------------------------------------------------------- C validation
    "validate_prf" -> (prfFrame _),
    // C1 detail records (process_capex.py:1598-1640): one row per FP/FN key
    // with the key parsed back into its components and the reference's
    // description string.
    "validate_mismatches" -> ((s, d) => {
      val joined = keySetJoin(s, d)
        .filter(col("in_p").isNull || col("in_r").isNull)
      val parts = split(col("k"), "\\|")
      // ANSI mode: element_at past the end throws, so guard on size
      def part(i: Int) =
        coalesce(when(size(parts) >= i, element_at(parts, i)), lit(""))
      joined.select(
        when(col("in_r").isNull, "False Positive").otherwise("False Negative").as("type"),
        col("k").as("CompositeKey"),
        part(1).as("RequestNo"),
        part(2).as("AssetItemName"),
        part(3).as("VendorName"),
        when(col("in_r").isNull,
          concat(lit("Record "), col("k"),
            lit(" incorrectly included in processed data (not in reference)")))
          .otherwise(concat(lit("Record "), col("k"),
            lit(" incorrectly excluded from processed data (should be included)")))
          .as("description"))
    }),
    "validate_keys" -> ((s, d) => {
      val p = CapexDerive.pipeline(s, d)
      val byKey = p.groupBy("CompositePrimaryKey").agg(count(lit(1)).as("cnt"))
      val tot = p.agg(count(lit(1)).as("total_records"),
        sum(when(trim(col("RequestNo")) === "" || trim(col("AssetItemName")) === "" ||
          trim(col("VendorName")) === "", 1).otherwise(0)).as("missing_keys"))
      val uniq = byKey.agg(
        sum(when(col("cnt") === 1, 1).otherwise(0)).as("unique_keys"),
        sum(when(col("cnt") > 1, 1).otherwise(0)).as("duplicate_keys"))
      tot.crossJoin(uniq).select(col("total_records"), col("unique_keys"),
        col("duplicate_keys"), col("missing_keys"))
    }),
    "validate_fields" -> (fieldsFrame _),

    // C5: the composed multi-sheet validation report — the reference's
    // headline validation entry point (validate_all_sheets_composite_keys,
    // process_capex.py:1353-1500): per-sheet key stats for the raw input,
    // processed output and reference sheets, ML metrics (PRF), field
    // accuracy, mismatch total, overall PASS/FAIL (F1 ≥ 0.95). One wide
    // row; every input is a one-row aggregate so the cross joins are free.
    "validate_report" -> ((s, d) => {
      val enr = CapexDerive.enriched(s, d)
      val pipe = CapexDerive.pipeline(s, d)
      sheetStats(enr, "key_strict", "input")
        .crossJoin(sheetStats(pipe, "CompositePrimaryKey", "processed"))
        .crossJoin(sheetStats(enr.filter(refPred), "key_strict", "reference"))
        .crossJoin(prfFrame(s, d))
        .crossJoin(fieldsFrame(s, d))
        .withColumn("total_mismatches", col("fp") + col("fn"))
        .withColumn("overall_status",
          when(col("f1") >= 0.95, "PASS").otherwise("FAIL"))
    }),

    // C5 detail: False-Negative keys enriched with the exclusion reason —
    // the recorded pipeline label when the key was fully excluded by the
    // rules (EXCLUSION_REASONS semantics: the label at the step where the
    // key's LAST row fell), else the on-the-fly explain prose of the key's
    // first row (min rid stands in for pandas row order, as elsewhere).
    "validate_fn_reasons" -> ((s, d) => {
      val enr = CapexDerive.enriched(s, d)
      val fnKeys = keySetJoin(s, d)
        .filter(col("in_p").isNull && col("in_r").isNotNull).select(col("k"))
      val rows = enr.select(col("key_robust").as("k"), col("rid"),
        col("excluded_by"), CapexDerive.ruleStepIdx.as("ridx"),
        CapexDerive.explainReason.as("er"))
      val perKey = rows.groupBy(col("k")).agg(
        max(when(col("ridx").isNull, 1).otherwise(0)).as("has_survivor"),
        max(col("ridx")).as("max_idx"),
        expr("min_by(er, rid)").as("explain_reason"))
      val stepLbl = rows.filter(col("ridx").isNotNull)
        .groupBy(col("k").as("lk"), col("ridx"))
        .agg(expr("min_by(excluded_by, rid)").as("recorded_reason"))
      fnKeys
        .join(perKey, Seq("k"), "left")
        .join(stepLbl,
          col("lk") === col("k") && col("ridx") === col("max_idx") &&
            col("has_survivor") === 0, "left")
        .select(col("k").as("CompositeKey"),
          coalesce(col("recorded_reason"), col("explain_reason"), lit("Unknown"))
            .as("exclusion_reason"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "rule_status_filter" -> s"$W SELECT rid, CurrentStatus FROM enriched WHERE rm_r1",
    "rule_dash_filter" -> s"$W SELECT rid, IsSelectedVendor FROM enriched WHERE rm_r2",
    "rule_function_filter" -> s"$W SELECT rid, RequestFunction FROM enriched WHERE rm_r3",
    "rule_equipment_filter" -> s"$W SELECT rid, AssetItemName FROM enriched WHERE rm_r3a",
    "text_negation_flags" -> s"""$W SELECT rid, flag_test_demo, flag_personal,
      flag_experimental, flag_dark_store, flag_counter, flag_ds, device_hit FROM enriched""",
    "rule_remark_filter" -> s"$W SELECT rid, RequestFunction FROM enriched WHERE rm_r8 OR rm_r11 OR rm_r12 OR rm_r13",
    "rule_ds_counter_filter" -> s"$W SELECT rid, UserRemarks FROM enriched WHERE rm_r6",
    "rule_personal_device" -> s"$W SELECT rid, AssetItemName FROM enriched WHERE rm_r5a",
    "rule_non_ops" -> s"$W SELECT rid, AssetItemName FROM enriched WHERE rm_r18",
    "exclusion_reasons" -> s"$W SELECT rid, excluded_by FROM enriched WHERE excluded_by IS NOT NULL",
    "exclusion_detail" -> s"""$W SELECT rid, excluded_by, trigger_column, trigger_value
      FROM enriched WHERE excluded_by IS NOT NULL""",
    "normalize_category" -> s"$W SELECT rid, acat_norm_raw AS normalized_category FROM enriched",
    "recode_office_furniture" -> s"$W SELECT rid, acat_recode AS recoded_category FROM enriched",
    "map_zone_region" -> s"$W SELECT rid, BranchCode, Zone, Region FROM enriched",
    "split_pm_subcategory" -> s"$W SELECT rid, acat_split AS subcategory FROM enriched",
    "tag_category_type" -> s"$W SELECT rid, category_type FROM enriched",
    "append_region_comment" -> s"$W SELECT rid, remarks_final FROM enriched",
    "pivot_amounts" -> s"""$W SELECT Zone, Region, acat_norm AS AssetCategoryName_2, RequestDate,
      ${dsumSql("AssetItemAmount")} AS total_amount
      FROM enriched WHERE excluded_by IS NULL OR excluded_by LIKE '18:%'
      GROUP BY Zone, Region, acat_norm, RequestDate""",
    "summary_report" -> s"""$W, summ AS (
      SELECT 'zone' AS dim_type, Zone AS dim_value, count(*) AS n_rows,
             ${dsumSql("AssetItemAmount")} AS total_amount FROM pipe GROUP BY Zone
      UNION ALL
      SELECT 'category', AssetCategoryName_2, count(*), ${dsumSql("AssetItemAmount")}
      FROM pipe GROUP BY AssetCategoryName_2
      UNION ALL
      SELECT 'function', RequestFunction, count(*), ${dsumSql("AssetItemAmount")}
      FROM pipe GROUP BY RequestFunction)
      SELECT dim_type, dim_value, n_rows, total_amount, total_amount / n_rows AS avg_amount FROM summ""",
    "composite_key" -> s"$W SELECT rid, key_strict AS composite_key, key_robust AS robust_key FROM enriched",
    "representative_rows" -> s"$W SELECT rid, RequestNo, priority, rk FROM ranked WHERE rk <= 5",
    "semi_filter" -> s"""$W SELECT rid, RequestNo FROM enriched_m
      WHERE RequestNo IN (SELECT RequestNo FROM enriched_m WHERE CurrentStatus = 'Approved')""",
    "fail_open_reinstate" -> s"""$W SELECT rid, key_robust, true AS reincluded,
      '${CapexVocab.FailOpenNote}' AS fail_open_note FROM reinstated""",
    "exclusion_explain" -> s"$W SELECT rid, ${CapexSqlGen.explainReasonSql} AS exclusion_reason FROM enriched_m",
    "capex_pipeline" -> s"$W SELECT * FROM pipe",
    // the bucketed variant computes the identical frame — one oracle
    "capex_pipeline_bucketed" -> s"$W SELECT * FROM pipe",
    "specialized_items" -> s"""$W SELECT rid, Category_Type, AssetItemName,
      AssetItemAmount, Zone FROM pipe
      WHERE Category_Type IN ('AMC', 'Sorter', 'Rental_Opex')""",
    "validate_prf" -> s"""$W, $keySetCtes,
      counts AS (
        SELECT CAST(sum(CASE WHEN p.k IS NOT NULL AND r.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN p.k IS NOT NULL AND r.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN p.k IS NULL AND r.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM proc_keys p FULL OUTER JOIN ref_keys r ON p.k = r.k),
      pr AS (SELECT tp, fp, fn, CAST(tp AS DOUBLE) / (tp + fp) AS prec,
                    CAST(tp AS DOUBLE) / (tp + fn) AS rec FROM counts)
      SELECT tp, fp, fn, prec, rec,
             CASE WHEN prec + rec = 0.0 THEN 0.0
                  ELSE 2.0 * prec * rec / (prec + rec) END AS f1 FROM pr""",
    "validate_mismatches" -> s"""$W, $keySetCtes,
      outer_keys AS (
        SELECT coalesce(p.k, r.k) AS k, p.k IS NOT NULL AS in_p, r.k IS NOT NULL AS in_r
        FROM proc_keys p FULL OUTER JOIN ref_keys r ON p.k = r.k
        WHERE p.k IS NULL OR r.k IS NULL)
      SELECT CASE WHEN NOT in_r THEN 'False Positive' ELSE 'False Negative' END AS type,
             k AS CompositeKey,
             coalesce(string_split(k, '|')[1], '') AS RequestNo,
             coalesce(string_split(k, '|')[2], '') AS AssetItemName,
             coalesce(string_split(k, '|')[3], '') AS VendorName,
             CASE WHEN NOT in_r
                  THEN 'Record ' || k || ' incorrectly included in processed data (not in reference)'
                  ELSE 'Record ' || k || ' incorrectly excluded from processed data (should be included)'
             END AS description
      FROM outer_keys""",
    "validate_keys" -> s"""$W, by_key AS (
        SELECT CompositePrimaryKey, count(*) AS cnt FROM pipe GROUP BY 1),
      tot AS (SELECT count(*) AS total_records,
                     CAST(sum(CASE WHEN trim(RequestNo) = '' OR trim(AssetItemName) = ''
                              OR trim(VendorName) = '' THEN 1 ELSE 0 END) AS BIGINT) AS missing_keys FROM pipe),
      uniq AS (SELECT CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS unique_keys,
                      CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS duplicate_keys FROM by_key)
      SELECT total_records, unique_keys, duplicate_keys, missing_keys FROM tot, uniq""",
    "validate_fields" -> s"""$W, ref_agg AS (
        SELECT key_robust AS k, ${dsumSql("AssetItemAmount")} AS r_amt,
               list_sort(list_distinct(list(lower(trim(Zone))))) AS r_zones,
               list_sort(list_distinct(list(AssetCategoryName))) AS r_cats
        FROM enriched_m WHERE $refPredSql GROUP BY key_robust),
      proc_agg AS (
        SELECT $robustKeySql AS k, ${dsumSql("AssetItemAmount")} AS p_amt,
               list_sort(list_distinct(list(lower(trim(Zone))))) AS p_zones,
               list_sort(list_distinct(list(AssetCategoryName))) AS p_cats
        FROM pipe GROUP BY 1),
      m AS (
        SELECT count(*) AS n_matched,
               CAST(sum(CASE WHEN abs(p_amt - r_amt) > 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS amount_mismatches,
               CAST(sum(CASE WHEN NOT (p_zones = r_zones) THEN 1 ELSE 0 END) AS BIGINT) AS zone_mismatches,
               CAST(sum(CASE WHEN NOT (p_cats = r_cats) THEN 1 ELSE 0 END) AS BIGINT) AS category_mismatches
        FROM proc_agg JOIN ref_agg USING (k))
      SELECT n_matched, amount_mismatches, zone_mismatches, category_mismatches,
             CAST(n_matched - amount_mismatches AS DOUBLE) / n_matched * 100 AS amount_accuracy,
             CAST(n_matched - zone_mismatches AS DOUBLE) / n_matched * 100 AS zone_accuracy,
             CAST(n_matched - category_mismatches AS DOUBLE) / n_matched * 100 AS category_accuracy
      FROM m""",
    "validate_report" -> s"""$W,
      ${sheetStatsSql("enriched_m", "key_strict", "input")},
      ${sheetStatsSql("pipe", "CompositePrimaryKey", "processed")},
      ref_sheet AS (SELECT * FROM enriched_m WHERE $refPredSql),
      ${sheetStatsSql("ref_sheet", "key_strict", "reference")},
      $keySetCtes,
      counts AS (
        SELECT CAST(sum(CASE WHEN p.k IS NOT NULL AND r.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN p.k IS NOT NULL AND r.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN p.k IS NULL AND r.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM proc_keys p FULL OUTER JOIN ref_keys r ON p.k = r.k),
      pr AS (SELECT tp, fp, fn, CAST(tp AS DOUBLE) / (tp + fp) AS prec,
                    CAST(tp AS DOUBLE) / (tp + fn) AS rec FROM counts),
      prf AS (SELECT tp, fp, fn, prec, rec,
              CASE WHEN prec + rec = 0.0 THEN 0.0
                   ELSE 2.0 * prec * rec / (prec + rec) END AS f1 FROM pr),
      ref_agg AS (
        SELECT key_robust AS k, ${dsumSql("AssetItemAmount")} AS r_amt,
               list_sort(list_distinct(list(lower(trim(Zone))))) AS r_zones,
               list_sort(list_distinct(list(AssetCategoryName))) AS r_cats
        FROM enriched_m WHERE $refPredSql GROUP BY key_robust),
      proc_agg AS (
        SELECT $robustKeySql AS k, ${dsumSql("AssetItemAmount")} AS p_amt,
               list_sort(list_distinct(list(lower(trim(Zone))))) AS p_zones,
               list_sort(list_distinct(list(AssetCategoryName))) AS p_cats
        FROM pipe GROUP BY 1),
      fieldm AS (
        SELECT count(*) AS n_matched,
               CAST(sum(CASE WHEN abs(p_amt - r_amt) > 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS amount_mismatches,
               CAST(sum(CASE WHEN NOT (p_zones = r_zones) THEN 1 ELSE 0 END) AS BIGINT) AS zone_mismatches,
               CAST(sum(CASE WHEN NOT (p_cats = r_cats) THEN 1 ELSE 0 END) AS BIGINT) AS category_mismatches
        FROM proc_agg JOIN ref_agg USING (k))
      SELECT input_total, input_missing, input_unique, input_dup,
             CASE WHEN input_missing > 0 OR input_dup > 0 THEN 'FAIL' ELSE 'PASS' END AS input_status,
             processed_total, processed_missing, processed_unique, processed_dup,
             CASE WHEN processed_missing > 0 OR processed_dup > 0 THEN 'FAIL' ELSE 'PASS' END AS processed_status,
             reference_total, reference_missing, reference_unique, reference_dup,
             CASE WHEN reference_missing > 0 OR reference_dup > 0 THEN 'FAIL' ELSE 'PASS' END AS reference_status,
             tp, fp, fn, prec, rec, f1,
             n_matched, amount_mismatches, zone_mismatches, category_mismatches,
             CAST(n_matched - amount_mismatches AS DOUBLE) / n_matched * 100 AS amount_accuracy,
             CAST(n_matched - zone_mismatches AS DOUBLE) / n_matched * 100 AS zone_accuracy,
             CAST(n_matched - category_mismatches AS DOUBLE) / n_matched * 100 AS category_accuracy,
             fp + fn AS total_mismatches,
             CASE WHEN f1 >= 0.95 THEN 'PASS' ELSE 'FAIL' END AS overall_status
      FROM input_tot, input_uniq, processed_tot, processed_uniq,
           reference_tot, reference_uniq, prf, fieldm""",
    "validate_fn_reasons" -> s"""$W, $keySetCtes,
      fn_keys AS (
        SELECT r.k FROM ref_keys r LEFT JOIN proc_keys p ON r.k = p.k WHERE p.k IS NULL),
      rws AS (
        SELECT key_robust AS k, rid, excluded_by,
               ${CapexSqlGen.ruleStepIdxSql} AS ridx,
               ${CapexSqlGen.explainReasonSql} AS er
        FROM enriched_m),
      per_key AS (
        SELECT k, max(CASE WHEN ridx IS NULL THEN 1 ELSE 0 END) AS has_survivor,
               max(ridx) AS max_idx, arg_min(er, rid) AS explain_reason
        FROM rws GROUP BY k),
      step_lbl AS (
        SELECT k AS lk, ridx, arg_min(excluded_by, rid) AS recorded_reason
        FROM rws WHERE ridx IS NOT NULL GROUP BY k, ridx)
      SELECT f.k AS CompositeKey,
             coalesce(s.recorded_reason, p.explain_reason, 'Unknown') AS exclusion_reason
      FROM fn_keys f
      LEFT JOIN per_key p ON p.k = f.k
      LEFT JOIN step_lbl s
        ON s.lk = f.k AND s.ridx = p.max_idx AND p.has_survivor = 0"""
  )
}
