package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Relational

/** Temporal / interval relational queries (SURVEY.md §2.E8-E10) over the
  * events stream table: backward as-of enrichment, banded interval join,
  * and a skew-safe exact distinct. Each instantiates a generic operator
  * from graft.operators.Relational.
  */
object Temporal {

  /** E8: as-of join — each purchase event annotated with the latest error
    * event (id/ts/value) of the same user at or before the purchase time.
    * Each side shuffles once by user_id (disjoint row subsets — together
    * the volume of ONE full shuffle) and the window reuses that
    * clustering; per-key sort inside the window (see Relational.asofJoin).
    */
  def asofJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.spread(Tables.events(spark, dir), "user_id")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    Relational.asofJoin(purchases, errors, keys = Seq("user_id"), tsCol = "ts",
      tieBreak = "event_id", payload = Seq("event_id", "ts", "value"),
      prefix = "err_")
  }

  /** Oracle mirrors the same union + sorted-window construction (ANSI,
    * deterministic: within one (user_id, ts) the error side sorts first,
    * errors tie-break by event_id — identical in both engines; the relative
    * order of same-ts purchases does not affect any carried value).
    *
    * The carried payload is ONE composite struct (non-null exactly on error
    * rows), matching the engine's atomic struct carry: per-column
    * last_value(... IGNORE NULLS) would back-fill a genuinely-NULL payload
    * field from an OLDER error row, silently diverging on data with null
    * payload fields (round-2 ADVICE).
    */
  val asofJoinSql: String =
    """WITH u AS (
      SELECT user_id, ts, 1 AS side, event_id, value,
             CAST(NULL AS BIGINT) AS p_event_id,
             CAST(NULL AS STRUCT(e BIGINT, t TIMESTAMP, v DOUBLE)) AS p_row
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, 0 AS side, event_id, value, event_id,
             {'e': event_id, 't': ts, 'v': value}
      FROM events WHERE event_type = 'error'),
    w AS (
      SELECT *, last_value(p_row IGNORE NULLS) OVER win AS err_row
      FROM u
      WINDOW win AS (PARTITION BY user_id ORDER BY ts ASC, side ASC, p_event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, ts, value,
           err_row.e AS err_event_id, err_row.t AS err_ts, err_row.v AS err_value
    FROM w WHERE side = 1"""

  /** E33: point-in-time (PIT) join — the feature-store correctness op:
    * each purchase reads the SCD2 state version (here: the user's click
    * history as versioned state, valid_from = click ts, valid_to = next
    * click ts) whose validity interval contains the purchase time, and
    * NEVER a later one (no training-serving leakage). Built as backward
    * as-of on valid_from (one user_id shuffle, no join — the E8 union +
    * window machinery) + a valid_to guard that nulls the match if the
    * picked version had already been superseded at ts (impossible on
    * gapless SCD2 intervals like these, load-bearing on dims with
    * deleted/expired versions — semantic completeness, not dead code).
    */
  def pitJoin(spark: SparkSession, dir: String): DataFrame =
    pitJoinOf(Tables.spread(Tables.events(spark, dir), "user_id"))

  private[graft] def pitJoinOf(ev: DataFrame): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts").asc, col("version_id").asc)
    val scd = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("version_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("state_cents"))
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
    val facts = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val m = Relational.asofJoin(facts, scd, keys = Seq("user_id"), tsCol = "ts",
      tieBreak = "version_id", payload = Seq("version_id", "state_cents", "valid_to"),
      prefix = "pit_")
    val live = col("pit_valid_to").isNull || col("ts") < col("pit_valid_to")
    m.select(col("event_id"), col("user_id"), col("ts"),
      when(live, col("pit_version_id")).as("version_id"),
      when(live, col("pit_state_cents")).as("state_cents"))
  }
  /** Oracle states the same semantics declaratively: latest version with
    * valid_from ≤ ts (version order = (valid_from, version_id)), then the
    * valid_to containment guard. The row_number inequality join is the
    * oracle's shape only — the engine never joins.
    */
  val pitJoinSql: String =
    """WITH dim AS (
      SELECT user_id, ts AS valid_from, event_id AS version_id,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS state_cents,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS valid_to
      FROM events WHERE event_type = 'click'),
    f AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    m AS (
      SELECT f.event_id, f.user_id, f.ts, d.version_id, d.state_cents, d.valid_to,
        row_number() OVER (PARTITION BY f.event_id
          ORDER BY d.valid_from DESC, d.version_id DESC) AS rn
      FROM f LEFT JOIN dim d ON f.user_id = d.user_id AND d.valid_from <= f.ts)
    SELECT event_id, user_id, ts,
      CASE WHEN valid_to IS NULL OR ts < valid_to THEN version_id END AS version_id,
      CASE WHEN valid_to IS NULL OR ts < valid_to THEN state_cents END AS state_cents
    FROM m WHERE rn = 1"""

  /** Price bands for the interval join: [lo, hi) covering the value domain. */
  val Bands: Seq[(String, Double, Double)] =
    (0 until 10).map(i => (f"B$i%02d", i * 50.0, (i + 1) * 50.0))

  /** E9: banded interval join — events mapped to the value band containing
    * them (broadcast nested-loop against the 10-row band dim; zero shuffle
    * of the fact side), then aggregated per band with exact cents sums.
    */
  def rangeJoinBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Bands.toDF("band", "lo", "hi")
    val ev = Tables.events(spark, dir).select(col("value"))
    Relational.bandedJoin(ev, bands, "value")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("bigint")).as("value_cents"))
  }

  val rangeJoinBandsSql: String = {
    val values = Bands.map { case (b, lo, hi) => s"('$b', $lo, $hi)" }.mkString(", ")
    s"""WITH bands(band, lo, hi) AS (VALUES $values)
    SELECT band, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY band"""
  }

  /** E10: skew-safe exact count-distinct, written as its explicit two-stage
    * expansion: stage 1 distinct on (group, value) shuffles by BOTH columns
    * so a hot group's values spread across all partitions; stage 2 counts
    * per group. This is the shape Spark's own count(DISTINCT) planner
    * expands to — stated explicitly here as the pattern to reach for when a
    * non-expandable aggregate (collect_set, exact UDAF) meets a skewed key.
    */
  def distinctUsersSkewsafe(spark: SparkSession, dir: String): DataFrame =
    Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id")
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))

  val distinctUsersSkewsafeSql: String =
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type"""

  val DigestSalts = 32

  /** E12: salted two-phase set aggregation — the pattern for a
    * NON-EXPANDABLE aggregate (collect_set here, any exact UDAF in
    * general) on a skewed group key. Phase 1 groups by (key, salt) where
    * salt = hash(value) % DigestSalts, so a hot key's set builds across
    * DigestSalts partitions; phase 2 merges the per-salt partial sets —
    * disjoint by construction (same value → same salt), so the union is
    * still a set and counts stay exact. Emitted as a scalar digest
    * (count + md5 of the '|'-joined sorted members) so the result is
    * hash-checkable and column types stay flat.
    */
  def distinctUserDigest(spark: SparkSession, dir: String): DataFrame = {
    val salt = pmod(col("user_id"), lit(DigestSalts))
    val partials = Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id")
      .select(col("event_type"), col("user_id"), salt.as("salt"))
      .groupBy(col("event_type"), col("salt"))
      .agg(collect_set(col("user_id")).as("part"))
    partials.groupBy(col("event_type"))
      .agg(flatten(collect_list(col("part"))).as("users"))
      .select(col("event_type"),
        size(col("users")).cast("bigint").as("n_users"),
        md5(concat_ws("|",
          transform(sort_array(col("users")), x => x.cast("string"))).cast("binary"))
          .as("users_digest"))
  }

  val distinctUserDigestSql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
      md5(string_agg(CAST(user_id AS VARCHAR), '|' ORDER BY user_id)) AS users_digest
    FROM (SELECT DISTINCT event_type, user_id FROM events)
    GROUP BY event_type"""

  val OverlapGridMs: Long = 60L * 60 * 1000 // 1 h cells ≈ session scale

  /** Per-(type, user) gap sessions with epoch-ms bounds — E6's construction
    * with event_type in the clustering, feeding the interval join below.
    * Output columns carry `pfx` so the self-join's two sides stay distinct.
    */
  private def typedSessions(spark: SparkSession, dir: String,
                            pfx: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.spread(Tables.events(spark, dir), "user_id")
      .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byKey))
      .withColumn("is_new",
        when(col("prev_ms").isNull ||
          col("ms") - col("prev_ms") > graft.queries.Events.SessionGapMinutes * 60L * 1000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("is_new")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("event_type"), col("user_id"), col("sid"))
      .agg(min(col("ms")).as(s"${pfx}start"), max(col("ms")).as(s"${pfx}end"))
      .select(col("event_type"), col("user_id").as(s"${pfx}uid"),
        col("sid").as(s"${pfx}sid"), col(s"${pfx}start"), col(s"${pfx}end"))
  }
  // (pfx = "" yields the generic column names the self-join renames per side)

  /** E20: interval-overlap join — concurrent sessions: pairs of DIFFERENT
    * users' same-type sessions that overlap in time (closed intervals),
    * via `Relational.intervalJoin`: sessions explode onto a 1 h grid,
    * candidates come from one equality join on (event_type, cell), the
    * exact predicate prunes, the canonical-cell rule emits each pair
    * exactly once (no dedup pass), a < b orders the pair. The
    * interval×interval class E9's point-in-band join can't express —
    * stated without the unbounded inequality join a naive formulation
    * would nest. Cell occupancy here IS the concurrency being measured:
    * a hot hour costs that hour's candidate pairs, not the cross of the
    * whole session tables.
    */
  def sessionOverlap(spark: SparkSession, dir: String): DataFrame = {
    // sessionize ONCE, materialize, and join the table with itself — the
    // same checkpointed-self-join pattern the dedup bucket joins use (both
    // sides read the computed sessions instead of re-running the windows)
    val s = graft.Checkpoints.cp(typedSessions(spark, dir, ""))
    def side(p: String) = s.select(col("event_type"), col("uid").as(s"${p}uid"),
      col("sid").as(s"${p}sid"), col("start").as(s"${p}start"),
      col("end").as(s"${p}end"))
    Relational.intervalJoin(side("a_"), side("b_"), Seq("event_type"),
      "a_start", "a_end", "b_start", "b_end", OverlapGridMs)
      .filter(col("a_uid") < col("b_uid"))
      .select(col("event_type"), col("a_uid"), col("a_sid"),
        col("b_uid"), col("b_sid"),
        (least(col("a_end"), col("b_end")) -
          greatest(col("a_start"), col("b_start"))).as("overlap_ms"))
  }
  val sessionOverlapSql: String = {
    val gapMs = graft.queries.Events.SessionGapMinutes * 60L * 1000L
    s"""WITH s AS MATERIALIZED (
      SELECT event_type, user_id, sid, min(ms) AS s_start, max(ms) AS s_end
      FROM (
        SELECT event_type, user_id, epoch_ms(ts) AS ms,
          CAST(sum(is_new) OVER (PARTITION BY event_type, user_id
            ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        FROM (
          SELECT event_type, user_id, event_id, ts,
            CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                      OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > $gapMs
                 THEN 1 ELSE 0 END AS is_new
          FROM events
          WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts ASC, event_id ASC)))
      GROUP BY event_type, user_id, sid)
    SELECT a.event_type, a.user_id AS a_uid, a.sid AS a_sid,
      b.user_id AS b_uid, b.sid AS b_sid,
      CAST(least(a.s_end, b.s_end) - greatest(a.s_start, b.s_start) AS BIGINT) AS overlap_ms
    FROM s a JOIN s b ON a.event_type = b.event_type AND a.user_id < b.user_id
      AND a.s_start <= b.s_end AND b.s_start <= a.s_end"""
  }

  val SkewTopK = 10

  /** E19: key-skew diagnostics — the report run BEFORE choosing a skew
    * remedy (salting, AQE hints, broadcast): the top-K heaviest join/group
    * keys and each one's share of the table. Per-key counts are one
    * map-side-combinable aggregate; the top-K is orderBy+limit (planned as
    * TakeOrderedAndProject — per-partition local top-K, no global sort);
    * the total arrives as a one-row scalar subquery; the rank window runs
    * over K rows. Nothing in the plan is corpus-sorted or collected.
    */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val total = counts.agg(sum(col("n_events")).cast("double").as("t"))
    counts.orderBy(col("n_events").desc, col("user_id").asc).limit(SkewTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_events").desc, col("user_id").asc)).cast("bigint"))
      .withColumn("pct", round(col("n_events") / total.scalar() * 100, 6))
      .select(col("rank"), col("user_id"), col("n_events"), col("pct"))
  }
  val skewReportSql: String =
    s"""WITH counts AS (
      SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
    t AS (SELECT CAST(sum(n_events) AS DOUBLE) AS t FROM counts),
    topk AS (SELECT * FROM counts
             ORDER BY n_events DESC, user_id ASC LIMIT $SkewTopK)
    SELECT row_number() OVER (ORDER BY n_events DESC, user_id ASC) AS rank,
      user_id, CAST(n_events AS BIGINT) AS n_events,
      round(n_events / (SELECT t FROM t) * 100, 6) AS pct
    FROM topk"""

  val SkewSalts = 8

  /** E18: salted-join enrichment — events joined to the customer dim
    * through `Relational.saltedJoin` (replicate-right, content-salted
    * left), then aggregated per nation. Stated with the dim REPLICATED
    * 8× instead of broadcast to exercise the skew shape: a hot user's
    * events spread across SkewSalts reducers instead of pinning one.
    * (At this dim size broadcast is what production would pick — the
    * query exists to keep the pattern oracle-checked end to end.)
    */
  def eventsSaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id")
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("bigint").as("cents"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_nationkey").as("nationkey"))
    Relational.saltedJoin(ev, cust, Seq("user_id"), SkewSalts, col("event_id"))
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
  }
  val eventsSaltedJoinSql: String =
    """SELECT c.c_nationkey AS nationkey, count(*) AS n_events,
      CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1"""

  /** E11's sketch twin (mirrors E10's approx-quantile pattern): HLL++
    * approximate count-distinct — the 100 TB path when even the two-stage
    * exact expansion shuffles too much. The sketch is a fixed-size,
    * partially-aggregable state per group: one map-side pass, no distinct
    * stage, exchange bounded by groups×sketch bytes. Sketch estimates are
    * implementation-defined → rows-only driver check by design; the
    * relative error against the exact operator is spec-asserted.
    */
  def distinctUsersApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_users_approx"))

  /** Gate-emitted form of the HLL twin (same pattern as E19b's CMS form):
    * the exact per-type count hash-checks directly, and the
    * implementation-defined HLL estimate is emitted as its CONTRACT — the
    * 5σ relative-error bound the spec asserts numerically — which the
    * oracle asserts as literal TRUE. Deterministic for a fixed drop (HLL
    * hashing has no RNG), so the gray `no_oracle` row turns fully green
    * while raw estimates stay on the library form above.
    */
  def distinctUsersApproxQuery(spark: SparkSession, dir: String): DataFrame = {
    // null-safe (<=>) join: a NULL event_type group must meet its exact
    // twin, not silently drop (the oracle's GROUP BY keeps the NULL group)
    val a = distinctUsersApprox(spark, dir)
    val e = distinctUsersSkewsafe(spark, dir)
    a.join(e, a("event_type") <=> e("event_type"))
      .select(e("event_type"), col("n_users"),
        (abs(col("n_users_approx") - col("n_users")).cast("double")
          <= greatest(lit(1.0), lit(5 * 0.02) * col("n_users"))).as("within_rel_err"))
  }
  val distinctUsersApproxSql: String =
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      TRUE AS within_rel_err
    FROM events GROUP BY event_type"""

  /** CMS error bound: eps = over-count ≤ eps·N per probe (w.p. ≥ conf). */
  val CmsEps = 0.001
  val CmsConf = 0.99
  val CmsSeed = 42

  /** E19b: count-min-sketch twin of the skew report — per-key frequency
    * estimates from ONE fixed-size, partially-aggregable sketch instead of
    * the exact per-key count table. The 100 TB contract: the sketch is a
    * few KB of mergeable state regardless of key cardinality (map-side
    * partials merge cell-wise, exactly like the HLL/bloom/quantile
    * sketches in E10/E11/D20b — this completes the classic sketch family),
    * and any key's count is then served WITHOUT rescanning the fact.
    * Instantiated over the exact report's top-K keys so the spec can
    * assert the CMS guarantee (est ≥ exact, est ≤ exact + eps·N) key by
    * key. Estimates are implementation-defined → rows-only driver check
    * by design, same as the other sketch twins.
    */
  def skewReportSketch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id")
    val skBytes = ev.agg(expr(
        s"count_min_sketch(user_id, CAST($CmsEps AS DOUBLE), " +
          s"CAST($CmsConf AS DOUBLE), $CmsSeed)"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(skBytes)
    val keys = skewReport(spark, dir)
      .select(col("rank"), col("user_id"), col("n_events")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    import spark.implicits._
    keys.toSeq.map { case (rank, uid, exact) =>
      (rank, uid, exact, cms.estimateCount(java.lang.Long.valueOf(uid)),
        cms.totalCount())
    }.toDF("rank", "user_id", "n_events", "n_events_est", "n_total")
  }

  /** Gate-emitted form of E19b: the deterministic columns (rank, user_id,
    * exact n_events — identical to E19's top-K) hash-check against the
    * oracle directly, and the implementation-defined CMS estimate is
    * emitted as its CONTRACT instead of its value: `est_ge_exact`
    * (CMS never under-counts — deterministic, always true) and
    * `est_within_eps` (over-count ≤ eps·N — deterministic for the fixed
    * seed on a fixed drop; the spec asserts the same bound numerically).
    * The oracle asserts both as literal TRUE, turning the r4 `no_oracle`
    * gray row fully green without pretending DuckDB can recompute sketch
    * internals. Raw estimates stay on the library form above.
    */
  def skewReportSketchQuery(spark: SparkSession, dir: String): DataFrame =
    skewReportSketch(spark, dir).select(
      col("rank"), col("user_id"), col("n_events"),
      (col("n_events_est") >= col("n_events")).as("est_ge_exact"),
      (col("n_events_est") <= col("n_events")
        + ceil(lit(CmsEps) * col("n_total")).cast("bigint")).as("est_within_eps"))
  val skewReportSketchSql: String =
    s"""WITH counts AS (
      SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
    topk AS (SELECT * FROM counts
             ORDER BY n_events DESC, user_id ASC LIMIT $SkewTopK)
    SELECT row_number() OVER (ORDER BY n_events DESC, user_id ASC) AS rank,
      user_id, CAST(n_events AS BIGINT) AS n_events,
      TRUE AS est_ge_exact, TRUE AS est_within_eps
    FROM topk"""
}
