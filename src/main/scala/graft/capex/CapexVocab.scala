package graft.capex

/** Shared vocabulary for the deterministic capex-shaped derivation
  * (SURVEY.md §3). The same constants feed BOTH the Spark derivation
  * (CapexDerive) and the DuckDB oracle SQL (CapexSqlGen), so the two engines
  * see byte-identical inputs and rule vocabularies.
  *
  * The reference's capex table (process_capex.py) is derived from the
  * driver's TPC-H-ish tables: one capex row per lineitem, with every
  * attribute a pure function of (l_orderkey, l_linenumber, l_partkey,
  * l_suppkey, customer's nation). Vocab entries deliberately include the
  * case/whitespace/typo variants the reference's rules normalize.
  */
object CapexVocab {

  /** CurrentStatus by (3*l_orderkey + l_linenumber) % 8 (process_capex.py:291-301 trims+casefolds). */
  val Statuses: Seq[String] = Seq(
    "Approved", "Rejected", " rejected ", "Approval in Progress",
    "Sent for Approval", "Pending Review", "approved", "In Review")

  /** RequestFunction by (l_orderkey + 2*l_linenumber) % 12. ' it ' exercises
    * the reference's exact-match (untrimmed) IT filter vs trimmed removal set. */
  val Functions: Seq[String] = Seq(
    "IT", "Ops", "Admin", "Ops through IT", "CS", "FA",
    "Sales", "Ops", "IT", "Procurement", " it ", "Vigilance")

  /** IsSelectedVendor by (l_partkey + 7*l_linenumber) % 8 (dash rule trims: process_capex.py:503-513). */
  val VendorSel: Seq[String] = Seq("Yes", "No", "-", "No", "yes", "Yes", " - ", "No")

  /** AssetItemName by l_partkey % 24 — covers every equipment/device/tag rule. */
  val Items: Seq[String] = Seq(
    "Fire Extinguisher ABC",   // r3a fire
    "Ceiling Fan 48in",        // r3a fan
    "Split AC 2 Ton",          // r3a ac-with-context
    "CCTV - BRANCH",           // r3a + r18 cctv
    "Laptop Dell Latitude",    // r5a personal device
    "X-Ray Baggage Scanner",   // B5 split
    "DWS System",              // B5 split
    "Sorter Belt Assembly",    // B5 split + B6 Sorter
    "TBC Conveyor",            // B5 split
    "AMC for Sorter Line",     // B6 AMC+Sorter (sorter wins)
    "Rental Forklift",         // B6 Rental_Opex
    "Table Counter Unit",      // r6 counter w/ legitimate 'table' override
    "Conveyor Belt 20m",
    "Electrical Work - Hub",   // legitimate item
    "Interior Work Phase 1",   // legitimate item
    "Weighing Scale 500kg",
    "Generator 125kVA",
    "Server Rack 42U",         // contains 'ac' -> office/furniture allowed-hit
    "Projector Mount",         // allowed item
    "Office Chairs Set",       // allowed item
    "Stools Steel",            // allowed item
    "Trolley Hydraulic",
    "Air Conditioner 1.5T",    // r3a aircond
    "Steel Racking 4-Tier")

  /** ItemCategory by l_suppkey % 8. */
  val ItemCats: Seq[String] = Seq(
    "Operations Equipment", "IT Hardware", "Safety Gear", "Infrastructure",
    "MHE", "General Supplies", "Handling Systems", "Misc Items")

  /** AssetCategoryName by (l_partkey + l_suppkey) % 10 — includes the typo/
    * variant spellings the normalizer maps (process_capex.py:718-740). */
  val AssetCats: Seq[String] = Seq(
    "Computer", "PLANT & MACHINERY", "Leasehold Improvements", "FURNITURE",
    "Office Equipments", "Vehicles", "computer ", "Lease Hold",
    "FURINTURE", "OFFICE EQUIPMENT")

  /** UserRemarks by (5*l_orderkey + 3*l_linenumber) % 24 — negated and
    * non-negated phrase occurrences, region-code fallbacks, clean rows.
    * Entries 2/4 are negation-aware-clean but hit rule 18's plain substring
    * match — deliberate coverage of that reference divergence. */
  val Remarks: Seq[String] = Seq(
    "urgent requirement for hub operations",
    "test setup for new sorting line",
    "not a test deployment, production use",
    "personal use approved by manager",
    "no personal usage, shared asset",
    "for dark store operations",
    "not for dark store, main hub only",
    "install counter at front desk",
    "billing counter for DS facility",
    "replacement of old damaged unit",
    "demo equipment for client showcase",
    "fit out of mezzanine floor",
    "approved setup in ASIA warehouse",   // zone fallback regioncode
    "shift assets to EUROPE branch",      // zone fallback regioncode
    "pilot program for automation",
    "experimental conveyor retrofit",
    "laptop for site engineer usage",
    "without laptop allocation this time",
    "capacity expansion for peak season",
    "sample unit kept for inspection",
    "routine capacity augmentation",
    "skip trial phase, direct rollout",
    "branch infrastructure upgrade work",
    "standard requirement for operations")

  /** Nation whose derived region value is 'MUM' (exercises rule 17). */
  val MumNation = "NATION_7"
  val MumComment = " [MUM Region - Centrally raised for Pan-India]"

  /** Note stamped on fail-open-reinstated rows (process_capex.py:36). */
  val FailOpenNote = "Unknown exclusion; fail-open applied"

  /** Explain-side category normalization (explain_exclusion_reason,
    * process_capex.py:431-439): only the LEASEHOLD variants remap —
    * deliberately narrower than NormalizeMap (the prose echoes whatever
    * this map yields, typos included).
    */
  val ExplainNormMap: Seq[(String, String)] = Seq(
    "LEASEHOLD IMPROVEMENTS" -> "LEASEHOLD", "LEASE HOLD" -> "LEASEHOLD",
    "LEASEHOLD IMPROVEMENT" -> "LEASEHOLD")
  val ExplainAllowedCats: Seq[String] = Seq("COMPUTER", "PLANT & MACHINERY", "LEASEHOLD")

  /** Rule 3 removal set (trimmed, casefolded): process_capex.py:316-327. */
  val RemovedFunctions: Seq[String] = Seq("cs", "fa", "sales", "channel", "vigilance")

  /** Rule 5 keep set: process_capex.py:303-314. */
  val AllowedCategories: Seq[String] = Seq("computer", "plant & machinery", "leasehold")

  /** Office/Furniture allowed items (substring, case-insens): process_capex.py:747. */
  val OfficeFurnitureAllowedItems: Seq[String] =
    Seq("cctv", "fireex", "projector", "chairs", "ac", "fans", "stools")

  /** Typo map applied inside handle_office_and_furniture (process_capex.py:750-758). */
  val OfficeFurnitureTypoMap: Seq[(String, String)] = Seq(
    "FURNITURES" -> "FURNITURE", "FURINTURE" -> "FURNITURE",
    "FURINITURE" -> "FURNITURE", "OFFICE EQUIPMENT" -> "OFFICE EQUIPMENTS",
    "OFFICE-EQUIPMENTS" -> "OFFICE EQUIPMENTS",
    "OFFICE EQUIPTMENTS" -> "OFFICE EQUIPMENTS", "OFFICE EQPT" -> "OFFICE EQUIPMENTS")

  /** Variant map in normalize_asset_category_column (process_capex.py:725-738). */
  val NormalizeMap: Seq[(String, String)] = Seq(
    "LEASEHOLD IMPROVEMENTS" -> "LEASEHOLD", "LEASE HOLD" -> "LEASEHOLD",
    "LEASEHOLD IMPROVEMENT" -> "LEASEHOLD",
    "FURNITURES" -> "FURNITURE", "FURINTURE" -> "FURNITURE",
    "FURINITURE" -> "FURNITURE",
    "OFFICE EQUIPMENT" -> "OFFICE EQUIPMENTS",
    "OFFICE-EQUIPMENTS" -> "OFFICE EQUIPMENTS",
    "OFFICE EQUIPTMENTS" -> "OFFICE EQUIPMENTS", "OFFICE EQPT" -> "OFFICE EQUIPMENTS")

  /** r6 legitimate operational items kept despite 'counter' (process_capex.py:788). */
  val LegitimateCounterItems: Seq[String] = Seq(
    "table", "electrical work", "interior work", "renovation",
    "relocation", "construction", "installation")

  /** Rule 18 keywords, checked in order, substring match (process_capex.py:853-856). */
  val NonOpsKeywords: Seq[String] = Seq(
    "Personal", "Individual", "Non-operational", "Administrative only",
    "test", "demo", "sample")

  /** Category_Type tag keywords (process_capex.py:886-901); later tags win. */
  val AmcKeywords: Seq[String] = Seq("amc", "annual maintenance contract", "maintenance contract")
  val SorterKeywords: Seq[String] = Seq("sorter", "sorting machine", "sorting equipment")
  val RentalKeywords: Seq[String] = Seq("rental", "lease", "hire", "rent")

  /** P&M split keywords in pandas loop order — later assignments win (process_capex.py:704-713). */
  val PmSplitItems: Seq[String] = Seq("X-Ray", "DWS", "Sorter", "TBC")

  /** Exclusion-reason labels, pipeline order (rules.txt; process_capex.py labels). */
  val LabelR1 = "1: Rejected status"
  val LabelR2 = "2: IsSelectedVendor is '-'"
  val LabelR3 = "3: Removed RequestFunction (CS/FA/Sales/Channel/Vigilance)"
  val LabelR3a = "3a: Excluded equipment (AirCon/Fan/FireExt/CCTV/STOOL-Ops)"
  val LabelR5 = "5: Asset category not in [COMPUTER, PLANT & MACHINERY, LEASEHOLD]"
  val LabelR5a = "19: Personal devices excluded (laptop/macbook/tablet/phone)"
  val LabelR6 = "6/10: UserRemarks mention DS/dark store/counter"
  val LabelR8 = "8: IT non-relevant by UserRemarks"
  val LabelR9 = "9: Removed Approval in Progress/Sent for Approval (non-relevant)"
  val LabelR10 = "10: UserRemarks mention dark store"
  val LabelR11 = "11: Admin non-relevant by UserRemarks"
  val LabelR12 = "12: Ops non-relevant by UserRemarks"
  val LabelR13 = "13: Ops through IT non-relevant by UserRemarks"
  def labelR18(kw: String) = s"18: Non-Ops equipment keyword ('$kw')"
  val LabelR18Cctv = "18: Non-Ops equipment keyword ('CCTV/camera')"

  /** Single source of truth for exclusion attribution, in pipeline order:
    * (rule flag column, label, trigger column NAME as the reference's
    * `_record_exclusions` stores it, enriched column holding the trigger
    * VALUE). Both the Spark chains (CapexDerive) and the oracle CASEs
    * (CapexSqlGen) are generated from this table; rule 18 is appended
    * separately because its label is keyword-dependent (trigger column
    * AssetItemName, process_capex.py:865-875).
    */
  val RuleAttribution: Seq[(String, String, String, String)] = Seq(
    ("rm_r1",  LabelR1,  "CurrentStatus",       "CurrentStatus"),
    ("rm_r2",  LabelR2,  "IsSelectedVendor",    "IsSelectedVendor"),
    ("rm_r3",  LabelR3,  "RequestFunction",     "RequestFunction"),
    ("rm_r3a", LabelR3a, "AssetItemName",       "AssetItemName"),
    ("rm_r5",  LabelR5,  "AssetCategoryName_2", "acat_norm"),
    ("rm_r5a", LabelR5a, "AssetItemName",       "AssetItemName"),
    ("rm_r6",  LabelR6,  "UserRemarks",         "UserRemarks"),
    ("rm_r8",  LabelR8,  "UserRemarks",         "UserRemarks"),
    ("rm_r9",  LabelR9,  "CurrentStatus",       "CurrentStatus"),
    ("rm_r10", LabelR10, "UserRemarks",         "UserRemarks"),
    ("rm_r11", LabelR11, "UserRemarks",         "UserRemarks"),
    ("rm_r12", LabelR12, "UserRemarks",         "UserRemarks"),
    ("rm_r13", LabelR13, "UserRemarks",         "UserRemarks"))

  /** Every rule flag including r18 — the `survives` predicate's domain. */
  val AllRuleFlags: Seq[String] = RuleAttribution.map(_._1) :+ "rm_r18"
}
