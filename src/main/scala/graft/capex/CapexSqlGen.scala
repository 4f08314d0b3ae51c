package graft.capex

import graft.functions.TextMatch
import CapexVocab._

/** DuckDB oracle SQL for the capex engine — mirrors CapexDerive column-for-
  * column so the driver's DuckDB compare exercises the full rule semantics,
  * not just row counts. Every emitter shares CapexVocab constants with the
  * Spark side; only dialect syntax differs (list literals/indexing, regexp
  * function names, lambda forms).
  */
object CapexSqlGen {

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"
  private def listLit(xs: Seq[String]): String = xs.map(sq).mkString("[", ", ", "]")

  /** The oracle folds every remark flag at SQL-generation time through the
    * plain-Scala matcher (TextMatch.Ref) over the closed vocabularies: the
    * driver's gate then checks Spark's runtime HOF matcher against an
    * independently computed expectation, and the DuckDB chain needs no list
    * lambdas (≈20× faster at sf0.01).
    *
    * The per-component fold of device_hit (a match over the concatenated
    * item/icat/acat/remark text) is sound iff no phrase can span a component
    * boundary and no negation token lives outside the remark component —
    * asserted below against the vocabularies at class-init time.
    */
  private def foldedIn(colExpr: String, variants: Seq[String],
                       pred: Vector[String] => Boolean): String = {
    val hits = variants.distinct.filter(v => pred(TextMatch.Ref.tokens(v)))
    if (hits.isEmpty) "FALSE"
    else s"$colExpr IN (${hits.map(sq).mkString(", ")})"
  }

  private val nonRemarkVocabs: Seq[String] =
    Items ++ ItemCats ++ AssetCats :+ "PLANT & MACHINERY"
  require(
    nonRemarkVocabs.forall(v =>
      TextMatch.Ref.tokens(v).intersect(TextMatch.NegationWords).isEmpty),
    "negation words must not appear outside UserRemarks for per-component folding")
  require({
    val multi = (TextMatch.TestDemoPhrases ++ TextMatch.PersonalNonBusinessPhrases ++
      TextMatch.DarkStorePhrases ++ TextMatch.CounterPhrases ++
      TextMatch.PersonalDeviceWords)
      .map(TextMatch.Ref.tokens(_)).filter(_.length >= 2)
    val comps = (nonRemarkVocabs ++ Remarks).map(TextMatch.Ref.tokens(_))
    !multi.exists { p =>
      (1 until p.length).exists { j =>
        comps.exists(_.endsWith(p.take(j))) && comps.exists(_.startsWith(p.drop(j)))
      }
    }
  }, "no multi-token phrase may span a component boundary for per-component folding")

  /** 1-based vocab pick — mirrors CapexDerive.pick (element_at). */
  private def pick(vocab: Seq[String], idxExpr: String): String =
    s"(${listLit(vocab)})[1 + CAST(($idxExpr) % ${vocab.size} AS INT)]"

  private def containsAny(e: String, kws: Seq[String]): String =
    kws.map(k => s"contains(lower($e), ${sq(k.toLowerCase)})").mkString("(", " OR ", ")")

  private def caseMap(e: String, m: Seq[(String, String)]): String =
    s"CASE $e " + m.map { case (f, t) => s"WHEN ${sq(f)} THEN ${sq(t)}" }.mkString(" ") +
      s" ELSE $e END"

  val capexRawSql: String = {
    val statuses = pick(Statuses, "l_orderkey*3 + l_linenumber")
    val funcs = pick(Functions, "l_orderkey + 2*l_linenumber")
    val vsel = pick(VendorSel, "l_partkey + 7*l_linenumber")
    val items = pick(Items, "l_partkey")
    val icats = pick(ItemCats, "l_suppkey")
    val acats = pick(AssetCats, "l_partkey + l_suppkey")
    val rems = pick(Remarks, "l_orderkey*5 + l_linenumber*3")
    s"""SELECT
      md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)
          || '|' || CAST(l_partkey AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR)
          || '|' || CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)
          || '|' || CAST(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)) AS rid,
      'REQ-' || CAST(l_orderkey // 16 AS VARCHAR) AS RequestNo,
      $statuses AS CurrentStatus,
      $funcs AS RequestFunction,
      $vsel AS IsSelectedVendor,
      CASE WHEN l_suppkey % 7 = 0 THEN '' ELSE 'Vendor ' || CAST(l_suppkey AS VARCHAR) END AS VendorName,
      $items AS AssetItemName,
      $icats AS ItemCategory,
      $acats AS AssetCategoryName,
      $rems AS UserRemarks,
      CASE WHEN l_orderkey % 17 = 0 THEN 'BR-' || CAST(l_orderkey % 89 AS VARCHAR) ELSE n_name END AS BranchCode,
      l_extendedprice AS AssetItemAmount,
      o_orderdate AS RequestDate
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey"""
  }

  /** Attribution CASE generated from CapexVocab.RuleAttribution — the same
    * table CapexDerive's chains fold over; `pick` selects which field the
    * branch returns (quoted label / quoted column name / raw value column),
    * `r18Expr` is the keyword-dependent rule-18 branch.
    */
  private def attribCase(pick: ((String, String, String, String)) => String,
                         r18Expr: String): String =
    "CASE " +
      RuleAttribution.map(e => s"WHEN ${e._1} THEN ${pick(e)}").mkString(" ") +
      s" WHEN rm_r18 THEN $r18Expr ELSE NULL END"

  private val kwHit = (kw: String) => {
    val k = sq(kw.toLowerCase)
    s"(contains(lower(AssetItemName), $k) OR contains(lower(ItemCategory), $k) OR contains(lower(UserRemarks), $k))"
  }
  private val cctvHit =
    Seq("AssetItemName", "ItemCategory", "UserRemarks")
      .map(c => s"contains(lower($c), 'cctv') OR contains(lower($c), 'camera')")
      .mkString("(", " OR ", ")")

  /** Twin of CapexDerive.explainReason — explain_exclusion_reason prose
    * (process_capex.py:385-501), evaluated over the enriched columns.
    */
  val explainReasonSql: String = {
    val rfT = "trim(RequestFunction)"
    val ac2 = caseMap("upper(trim(AssetCategoryName))", CapexVocab.ExplainNormMap)
    val r18case = "CASE " + CapexVocab.NonOpsKeywords.map(kw =>
      s"WHEN ${kwHit(kw)} THEN ${sq(s"Non-Ops equipment keyword: '$kw'")}")
      .mkString(" ") + " ELSE NULL END"
    s"""CASE
      WHEN rm_r1 THEN 'Rejected status'
      WHEN rm_r2 THEN ${sq("IsSelectedVendor is '-'")}
      WHEN rm_r3 THEN ${sq("Removed RequestFunction '")} || $rfT || ''''
      WHEN rm_r3a THEN ${sq("Excluded equipment: Air Conditioner/Fan/Fire Extinguisher")}
      WHEN $ac2 NOT IN (${CapexVocab.ExplainAllowedCats.map(sq).mkString(", ")})
        THEN ${sq("Asset category excluded after normalization ('")} || $ac2 || ${sq("')")}
      WHEN flag_ds THEN ${sq("UserRemarks mention 'DS'")}
      WHEN flag_dark_store THEN ${sq("UserRemarks mention 'dark store'")}
      WHEN flag_counter THEN ${sq("UserRemarks mention 'counter'")}
      WHEN device_hit THEN ${sq("Mention of personal computing device (laptop/macbook/tablet/phone)")}
      WHEN $rfT = 'IT' AND nonrel THEN 'IT non-relevant by UserRemarks'
      WHEN $rfT = 'Admin' AND nonrel THEN 'Admin non-relevant by UserRemarks'
      WHEN $rfT = 'Ops' AND nonrel THEN 'Ops non-relevant by UserRemarks'
      WHEN $rfT = 'Ops through IT' AND nonrel THEN 'Ops through IT non-relevant by UserRemarks'
      WHEN trim(CurrentStatus) = 'Approval in Progress' THEN ${sq("Status 'Approval in Progress' removed")}
      ELSE coalesce($r18case, 'Unknown') END"""
  }

  /** Twin of CapexDerive.ruleStepIdx — per-row first-fire step index in
    * reference application order (rule 18 per-keyword, CCTV last).
    */
  val ruleStepIdxSql: String = {
    val r18sub = "CASE " + CapexVocab.NonOpsKeywords.zipWithIndex.map { case (kw, i) =>
      s"WHEN ${kwHit(kw)} THEN $i"
    }.mkString(" ") + s" ELSE ${CapexVocab.NonOpsKeywords.size} END"
    "CASE " + RuleAttribution.zipWithIndex.map { case (e, i) =>
      s"WHEN ${e._1} THEN ${i + 1}"
    }.mkString(" ") +
      s" WHEN rm_r18 THEN ${RuleAttribution.size + 1} + ($r18sub) ELSE NULL END"
  }

  /** The full enriched-CTE chain (capex_raw → … → enriched/ranked/kept/
    * reinstated/pipe). Prefixed to every capex oracle query.
    */
  val withEnriched: String = {
    val catu = caseMap("upper(trim(AssetCategoryName))", OfficeFurnitureTypoMap)
    val isOfficeFurn =
      s"(regexp_matches($catu, '\\bOFFICE\\b.*\\bEQUIP') OR regexp_matches($catu, '\\bFURNIT'))"
    val allowedHit = containsAny("AssetItemName", OfficeFurnitureAllowedItems)
    val normRecode = caseMap("upper(trim(acat_recode))", NormalizeMap)
    val normRaw = caseMap("upper(trim(AssetCategoryName))", NormalizeMap)
    val acatSplit = PmSplitItems.reverse
      .map(kw => s"WHEN contains(lower(AssetItemName), ${sq(kw.toLowerCase)}) THEN ${sq(s"PLANT & MACHINERY - $kw")}")
      .mkString("CASE ", " ", " ELSE acat_norm END")
    val S = TextMatch.Sql
    val equip = S.isExcludedEquipment("AssetItemName || ' ' || ItemCategory || ' ' || AssetCategoryName")
    val r18kw = NonOpsKeywords.map(kwHit).mkString("(", " OR ", ")")
    val r18Label = "CASE " + NonOpsKeywords.map(kw =>
      s"WHEN ${kwHit(kw)} THEN ${sq(labelR18(kw))}").mkString(" ") +
      s" ELSE ${sq(LabelR18Cctv)} END"
    // Fields null-coalesced to '' BEFORE concat — byte-identical to the
    // Spark side's coalesce+concat_ws on NULL inputs (see
    // CapexDerive.buildEnriched); req_key is the key_strict prefix and
    // leads every downstream PARTITION BY / join below, mirroring the
    // Spark windows/joins exactly (degenerate RequestNo — NULL, padded,
    // '|'-containing — must group identically in both engines).
    val reqKey = "coalesce(trim(RequestNo), '')"
    val keyStrict =
      s"$reqKey || '|' || coalesce(trim(AssetItemName), '') || '|' || coalesce(trim(VendorName), '')"
    val keyRobust =
      s"CASE WHEN coalesce(trim(VendorName), '') = '' THEN $reqKey || '|' || coalesce(trim(AssetItemName), '') ELSE $keyStrict END"

    s"""WITH capex_raw AS ($capexRawSql),
    offices AS (
      SELECT n_name AS office, r_name AS zone,
             CASE WHEN n_name = ${sq(MumNation)} THEN 'MUM' ELSE n_name END AS region,
             r_name AS regioncode, n_nationkey
      FROM nation JOIN region ON n_regionkey = r_regionkey),
    rcodes AS (
      SELECT regioncode, min(zone) AS fb_zone, arg_max(region, n_nationkey) AS fb_region
      FROM offices GROUP BY regioncode),
    mapped AS (
      SELECT c.*, coalesce(o.zone, rc.fb_zone, 'Unknown') AS Zone,
             coalesce(o.region, rc.fb_region, 'Unknown') AS Region
      FROM capex_raw c
      LEFT JOIN offices o ON c.BranchCode = o.office
      LEFT JOIN rcodes rc
        ON o.office IS NULL AND contains(
          ' ' || regexp_replace(upper(c.UserRemarks), '[^A-Z0-9]+', ' ', 'g') || ' ',
          ' ' || rc.regioncode || ' ')),
    c1 AS (
      SELECT *,
        CASE WHEN $isOfficeFurn AND NOT $allowedHit THEN 'PLANT & MACHINERY'
             ELSE AssetCategoryName END AS acat_recode
      FROM mapped),
    c2 AS (
      SELECT *, $normRecode AS acat_norm, $normRaw AS acat_norm_raw FROM c1),
    c3 AS (
      SELECT *, $acatSplit AS acat_split FROM c2),
    c4 AS (
      SELECT *,
        ${foldedIn("UserRemarks", Remarks, t => TextMatch.Ref.anyPhraseNonNegated(t, TextMatch.TestDemoPhrases))} AS flag_test_demo,
        ${foldedIn("UserRemarks", Remarks, t => TextMatch.Ref.anyPhraseNonNegated(t, TextMatch.PersonalNonBusinessPhrases))} AS flag_personal,
        ${foldedIn("UserRemarks", Remarks, t => TextMatch.Ref.anyPhraseNonNegated(t, TextMatch.ExperimentalPhrases))} AS flag_experimental,
        ${foldedIn("UserRemarks", Remarks, t => TextMatch.Ref.anyPhraseNonNegated(t, TextMatch.DarkStorePhrases))} AS flag_dark_store,
        ${foldedIn("UserRemarks", Remarks, t => TextMatch.Ref.anyPhraseNonNegated(t, TextMatch.CounterPhrases))} AS flag_counter,
        ${foldedIn("UserRemarks", Remarks, t => TextMatch.Ref.hasToken(t, "ds"))} AS flag_ds,
        (${foldedIn("AssetItemName", Items, t => TextMatch.Ref.anyPhraseNonNegated(t, TextMatch.PersonalDeviceWords))}
         OR ${foldedIn("ItemCategory", ItemCats, t => TextMatch.Ref.anyPhraseNonNegated(t, TextMatch.PersonalDeviceWords))}
         OR ${foldedIn("acat_recode", AssetCats :+ "PLANT & MACHINERY", t => TextMatch.Ref.anyPhraseNonNegated(t, TextMatch.PersonalDeviceWords))}
         OR ${foldedIn("UserRemarks", Remarks, t => TextMatch.Ref.anyPhraseNonNegated(t, TextMatch.PersonalDeviceWords))}) AS device_hit
      FROM c3),
    c5 AS (
      SELECT *, (flag_test_demo OR flag_personal OR flag_experimental) AS nonrel FROM c4),
    c6 AS (
      SELECT *,
        (lower(trim(CurrentStatus)) = 'rejected') AS rm_r1,
        (trim(IsSelectedVendor) = '-') AS rm_r2,
        (lower(trim(RequestFunction)) IN (${RemovedFunctions.map(sq).mkString(", ")})) AS rm_r3,
        $equip AS rm_r3a,
        (lower(trim(acat_norm)) NOT IN (${AllowedCategories.map(sq).mkString(", ")})) AS rm_r5,
        device_hit AS rm_r5a,
        (flag_ds OR flag_dark_store OR (flag_counter AND NOT ${containsAny("AssetItemName", LegitimateCounterItems)})) AS rm_r6,
        (RequestFunction = 'IT' AND nonrel) AS rm_r8,
        (CurrentStatus = 'Approval in Progress' OR (CurrentStatus = 'Sent for Approval' AND nonrel)) AS rm_r9,
        flag_dark_store AS rm_r10,
        (RequestFunction = 'Admin' AND nonrel) AS rm_r11,
        (RequestFunction = 'Ops' AND nonrel) AS rm_r12,
        (RequestFunction = 'Ops through IT' AND nonrel) AS rm_r13,
        ($r18kw OR $cctvHit) AS rm_r18
      FROM c5),
    enriched AS (
      SELECT *,
        ${attribCase(e => sq(e._2), r18Label)} AS excluded_by,
        (NOT (${AllRuleFlags.mkString(" OR ")})) AS survives,
        ${attribCase(e => sq(e._3), sq("AssetItemName"))} AS trigger_column,
        ${attribCase(e => e._4, "AssetItemName")} AS trigger_value,
        $reqKey AS req_key,
        $keyStrict AS key_strict,
        $keyRobust AS key_robust,
        ((CASE WHEN CurrentStatus = 'Approved' THEN 100 ELSE 0 END)
         + (CASE WHEN CurrentStatus = 'Sent for Approval' THEN 50 ELSE 0 END)
         + (CASE WHEN IsSelectedVendor = 'Yes' THEN 10 ELSE 0 END)) AS priority,
        (CASE WHEN ${containsAny("AssetItemName", RentalKeywords)} THEN 'Rental_Opex'
              WHEN ${containsAny("AssetItemName", SorterKeywords)} THEN 'Sorter'
              WHEN ${containsAny("AssetItemName", AmcKeywords)} THEN 'AMC'
              ELSE 'Regular' END) AS category_type,
        (CASE WHEN upper(trim(Region)) IN ('MUMBAI', 'MUM')
              THEN UserRemarks || ${sq(MumComment)} ELSE UserRemarks END) AS remarks_final
      FROM c6),
    enriched_m AS MATERIALIZED (SELECT * FROM enriched),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY req_key ORDER BY priority DESC, rid ASC) AS rk
      FROM enriched_m WHERE survives),
    kept AS MATERIALIZED (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY req_key, key_strict, AssetItemAmount ORDER BY rid ASC) AS dup_rn
        FROM ranked WHERE rk <= 5) WHERE dup_rn = 1),
    failopen_keys AS (
      SELECT DISTINCT req_key, key_robust FROM enriched_m WHERE survives
      EXCEPT SELECT DISTINCT req_key, key_robust FROM kept),
    reinstated AS MATERIALIZED (
      SELECT * FROM (
        SELECT e.*, row_number() OVER (PARTITION BY e.req_key, e.key_strict, e.AssetItemAmount ORDER BY e.rid ASC) AS dup_rn
        FROM enriched_m e
        WHERE EXISTS (SELECT 1 FROM failopen_keys f
                      WHERE f.req_key = e.req_key AND f.key_robust = e.key_robust)
          AND NOT EXISTS (SELECT 1 FROM kept k
                          WHERE k.req_key = e.req_key
                            AND k.key_strict = e.key_strict
                            AND k.AssetItemAmount = e.AssetItemAmount)) WHERE dup_rn = 1),
    pipe AS MATERIALIZED (
      SELECT rid, RequestNo, AssetItemName, VendorName, key_strict AS CompositePrimaryKey,
             CurrentStatus, RequestFunction, IsSelectedVendor, ItemCategory,
             acat_recode AS AssetCategoryName, acat_split AS AssetCategoryName_2,
             remarks_final AS UserRemarks, Zone, Region, category_type AS Category_Type,
             AssetItemAmount, RequestDate, false AS ReincludedViaFailOpen,
             CAST(NULL AS VARCHAR) AS FailOpenNote
      FROM kept
      UNION ALL
      SELECT rid, RequestNo, AssetItemName, VendorName, key_strict,
             CurrentStatus, RequestFunction, IsSelectedVendor, ItemCategory,
             AssetCategoryName, acat_norm_raw, UserRemarks, Zone, Region,
             CAST(NULL AS VARCHAR), AssetItemAmount, RequestDate, true,
             ${sq(FailOpenNote)}
      FROM reinstated)"""
  }
}
