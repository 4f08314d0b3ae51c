package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** User-behavior analytics over the events stream: ordered funnels, cohort
  * retention, statistical anomaly flagging, and rate-limit throttling.
  * These are the classic product-analytics shapes a warehouse engine serves
  * (reference scope: the capex app's events have no behavioral queries, so
  * these extend SURVEY.md §2.E with the standard event-analytics family).
  *
  * Scale posture: every operator shuffles only on user_id (funnel,
  * retention, throttle — the natural clustering a 100 TB event table is
  * already bucketed by) or aggregates to a tiny stats table that broadcasts
  * back (anomaly). No windows partitioned by low-cardinality keys, no
  * driver-side state.
  */
object Behavior {

  /** E21: three-step ordered funnel (view → click after the first view →
    * purchase after that click), counted per stage. Each stage is a
    * per-user min-timestamp aggregate; stages chain through co-partitioned
    * user_id joins, so the whole funnel is ONE user_id clustering reused by
    * three aggregations and two joins — the scalable alternative to the
    * per-user sort a sequence-match window would force.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame =
    funnelStepsOf(Tables.spread(Tables.events(spark, dir), "user_id"))

  /** Per-user funnel milestones (t_view; t_click, t_purchase nullable
    * until reached) — the intermediate both funnelSteps and the streaming
    * twin's parity spec consume.
    */
  private[graft] def funnelMilestonesOf(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
  }

  /** Core over any (user_id, event_type, ts) frame (spec harnesses feed
    * synthetic events): stage counts are the non-null milestone counts,
    * reshaped to rows by one stack (Expand) over the single-row aggregate.
    */
  private[graft] def funnelStepsOf(ev0: DataFrame): DataFrame =
    funnelMilestonesOf(ev0)
      .agg(count(col("t_view")).as("n1"), count(col("t_click")).as("n2"),
        count(col("t_purchase")).as("n3"))
      .select(expr(
        "stack(3, 1, 'view', n1, 2, 'click_after_view', n2," +
          " 3, 'purchase_after_click', n3) AS (step, stage, n_users)"))
  val funnelStepsSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
         WHERE event_type = 'view' GROUP BY user_id),
       c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
         JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
         WHERE e.event_type = 'click' GROUP BY e.user_id),
       p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
         JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
         WHERE e.event_type = 'purchase' GROUP BY e.user_id)
     SELECT 1 AS step, 'view' AS stage, (SELECT count(*) FROM v) AS n_users
     UNION ALL
     SELECT 2, 'click_after_view', (SELECT count(*) FROM c)
     UNION ALL
     SELECT 3, 'purchase_after_click', (SELECT count(*) FROM p)"""

  /** E22: weekly cohort retention — users bucketed by first-seen week
    * (days-since-epoch/7, not date_trunc, so week boundaries are
    * engine-agnostic), counted distinct per (cohort_week, week_offset).
    * First-seen is a user_id aggregate; the join back is co-partitioned on
    * the spread key; the final count_distinct is Spark's two-phase expand
    * (partials keyed by (cohort, offset, user) — no single-reducer
    * distinct).
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame =
    retentionCohortsOf(Tables.spread(Tables.events(spark, dir), "user_id"))

  private[graft] def retentionCohortsOf(ev0: DataFrame): DataFrame = {
    val epoch = to_date(lit("2024-01-01"))
    val ev = ev0.select(col("user_id"), to_date(col("ts")).as("d"))
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("d0"))
    ev.join(first, Seq("user_id"))
      .select(
        col("user_id"),
        floor(datediff(col("d0"), epoch) / 7).cast("int").as("cohort_week"),
        floor(datediff(col("d"), col("d0")) / 7).cast("int").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }
  val retentionCohortsSql: String =
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d0
         FROM events GROUP BY user_id),
       x AS (SELECT e.user_id,
         CAST(floor(date_diff('day', DATE '2024-01-01', f.d0) / 7) AS INT) AS cohort_week,
         CAST(floor(date_diff('day', f.d0, CAST(e.ts AS DATE)) / 7) AS INT) AS week_offset
         FROM events e JOIN f USING (user_id))
     SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_users
     FROM x GROUP BY cohort_week, week_offset"""

  val AnomalyZ = 3.0

  /** E23: per-type z-score anomaly flags. Two passes over the facts — a
    * partial-agg stats pass (count + exact-decimal sum/sum-of-squares, so
    * mean/variance are bit-identical across engines) and a broadcast-stats
    * scoring pass — instead of a window partitioned by the 5-value
    * event_type (which would funnel 100 TB through 5 reducers). z is
    * reported quantized to 1e-4 (floor(z·1e4 + 0.5)): every arithmetic step
    * below is IEEE-deterministic from the exact decimal stats, and the
    * quantization keeps the gate independent of display formatting.
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame =
    eventsAnomalyOf(Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id"))

  private[graft] def eventsAnomalyOf(ev0: DataFrame): DataFrame =
    anomalyScoreOn(ev0, anomalyStats(ev0))

  /** The per-type stats table (count + exact-decimal sum / sum-of-squares). */
  private[graft] def anomalyStats(ev0: DataFrame): DataFrame = {
    val dec = col("value").cast("decimal(18,2)")
    ev0.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec).cast("double").as("s"),
        sum(dec * dec).cast("double").as("ssq"))
  }

  /** Stateless scoring pass against a precomputed stats table — the same
    * projection runs unchanged over a STREAM with static (batch-built)
    * stats: the standard model-scoring-on-a-stream shape (stream-static
    * broadcast join + codegen'd arithmetic, no state), spec-matched to the
    * batch operator in StreamingSpec.
    */
  private[graft] def anomalyScoreOn(ev: DataFrame, stats: DataFrame): DataFrame = {
    val mean = col("s") / col("n")
    val variance = col("ssq") / col("n") - mean * mean
    val z = (col("value") - mean) / sqrt(variance)
    ev.select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(stats), Seq("event_type"))
      .withColumn("z", z)
      .filter(abs(col("z")) > AnomalyZ)
      .select(col("event_id"), col("event_type"), col("value"),
        floor(col("z") * 10000 + 0.5).cast("bigint").as("z_e4"))
  }
  val eventsAnomalySql: String =
    s"""WITH st AS (
       SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
         CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ssq
       FROM events GROUP BY event_type),
     sc AS (
       SELECT e.event_id, e.event_type, e.value,
         (e.value - st.s / st.n)
           / sqrt(st.ssq / st.n - (st.s / st.n) * (st.s / st.n)) AS z
       FROM events e JOIN st USING (event_type))
     SELECT event_id, event_type, value,
       CAST(floor(z * 10000 + 0.5) AS BIGINT) AS z_e4
     FROM sc WHERE abs(z) > $AnomalyZ"""

  /** E26: p99 winsorization — clamp outlier values to the per-type 99th
    * percentile. The threshold comes from the D28 bounded-cardinality
    * pattern, NOT a per-type sort: values are 2-decimal money (distinct
    * cents ≪ rows by contract), so one partial-agg shuffle builds the
    * (type, cents) frequency table, a window over that TINY table finds
    * the type-1 p99 (smallest value with 100·cum ≥ 99·n — exact integer
    * arithmetic), and the per-type thresholds broadcast back onto one
    * scan. No 5-reducer per-type sort of the fact table at any point.
    */
  def eventsWinsorize(spark: SparkSession, dir: String): DataFrame =
    eventsWinsorizeOf(Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id"))

  private[graft] def eventsWinsorizeOf(ev0: DataFrame): DataFrame = {
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
    val ev = ev0.select(col("event_id"), col("event_type"), cents.as("cents"))
    val freq = ev.groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    val byType = Window.partitionBy(col("event_type")).orderBy(col("cents").asc)
    val overType = Window.partitionBy(col("event_type"))
    val thr = freq
      .withColumn("cum", sum(col("cnt")).over(
        byType.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(overType))
      .filter(col("cum") * 100 >= col("n") * 99)
      .groupBy(col("event_type")).agg(min(col("cents")).as("p99_cents"))
    ev.join(broadcast(thr), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("cents"),
        least(col("cents"), col("p99_cents")).as("cents_w"),
        (col("cents") > col("p99_cents")).as("clamped"))
  }
  val eventsWinsorizeSql: String =
    """WITH c AS (
       SELECT event_id, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       FROM events),
     freq AS (
       SELECT event_type, cents, count(*) AS cnt
       FROM c GROUP BY event_type, cents),
     cum AS (
       SELECT event_type, cents,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY cents ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
       FROM freq),
     thr AS (
       SELECT event_type, min(cents) AS p99_cents FROM cum
       WHERE cum * 100 >= n * 99 GROUP BY event_type)
     SELECT c.event_id, c.event_type, c.cents,
       least(c.cents, t.p99_cents) AS cents_w,
       c.cents > t.p99_cents AS clamped
     FROM c JOIN thr t USING (event_type)"""

  /** E31: market-basket pair mining — which event types co-occur in the
    * same user's history, with support counts (the 2-itemset core of
    * association mining; items generalize to products/features). Shape:
    * ONE distinct (user, item) projection, a self-join keyed by user
    * (fan-out bounded by items²/2 per user — the item catalog, not the
    * event count), then a bounded pair aggregate. Support threshold keeps
    * the output to genuinely associated pairs.
    */
  val BasketMinSupport = 5L

  def basketPairs(spark: SparkSession, dir: String): DataFrame =
    basketPairsOf(Tables.spread(Tables.events(spark, dir), "user_id"))

  private[graft] def basketPairsOf(ev0: DataFrame): DataFrame = {
    val items = ev0.select(col("user_id"), col("event_type").as("item")).distinct()
    // 1-row population count rides along as a broadcast, no driver action
    val total = items.agg(count_distinct(col("user_id")).as("n_users_total"))
    items.select(col("user_id"), col("item").as("item_a"))
      .join(items.select(col("user_id"), col("item").as("item_b")), Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_users"))
      .filter(col("n_users") >= BasketMinSupport)
      .crossJoin(broadcast(total))
      // support in exact integer basis points of the user population
      .select(col("item_a"), col("item_b"), col("n_users"),
        expr("n_users * 10000 div n_users_total").as("support_bp"))
  }
  val basketPairsSql: String =
    s"""WITH items AS (
       SELECT DISTINCT user_id, event_type AS item FROM events),
     n AS (SELECT count(DISTINCT user_id) AS n_users_total FROM items),
     pairs AS (
       SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_users
       FROM items a JOIN items b
         ON a.user_id = b.user_id AND a.item < b.item
       GROUP BY a.item, b.item)
     SELECT item_a, item_b, n_users,
       (n_users * 10000) // (SELECT n_users_total FROM n) AS support_bp
     FROM pairs WHERE n_users >= $BasketMinSupport"""

  /** E32: robust anomaly flags via MAD (median absolute deviation) — the
    * outlier detector that survives what breaks E23's z-score: heavy tails
    * and the outliers themselves inflating the standard deviation. Both
    * the per-type median and the MAD come from the D28 bounded-cardinality
    * pattern (type-1 order statistics over the TINY (type, cents)
    * frequency table — the deviation table derives from the same frequency
    * rows, no second fact scan), and the flag is exact integer arithmetic:
    * 10000·|cents − med| > 44478·mad (3σ-equivalent under normality,
    * 1.4826·3 scaled to 1e4). No per-type sort of the facts, no floats
    * anywhere in the gate.
    */
  def eventsAnomalyMad(spark: SparkSession, dir: String): DataFrame =
    eventsAnomalyMadOf(Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id"))

  private[graft] def eventsAnomalyMadOf(ev0: DataFrame): DataFrame = {
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
    val ev = ev0.select(col("event_id"), col("event_type"), cents.as("cents"))
    val freq = ev.groupBy(col("event_type"), col("cents"))
      .agg(count(lit(1)).as("cnt"))
    def typeOneMedian(f: DataFrame, valueCol: String, out: String): DataFrame = {
      val byType = Window.partitionBy(col("event_type")).orderBy(col(valueCol).asc)
      val overType = Window.partitionBy(col("event_type"))
      f.withColumn("cum", sum(col("cnt")).over(
          byType.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum(col("cnt")).over(overType))
        .filter(col("cum") * 2 >= col("n"))
        .groupBy(col("event_type")).agg(min(col(valueCol)).as(out))
    }
    val med = typeOneMedian(freq, "cents", "med")
    val devFreq = freq.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), abs(col("cents") - col("med")).as("dev"), col("cnt"))
      .groupBy(col("event_type"), col("dev")).agg(sum(col("cnt")).as("cnt"))
    val mad = typeOneMedian(devFreq, "dev", "mad")
    ev.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .filter(abs(col("cents") - col("med")) * 10000 > col("mad") * 44478)
      .select(col("event_id"), col("event_type"), col("cents"),
        abs(col("cents") - col("med")).as("dev"), col("med"), col("mad"))
  }
  val eventsAnomalyMadSql: String =
    """WITH c AS (
       SELECT event_id, event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       FROM events),
     freq AS (
       SELECT event_type, cents, count(*) AS cnt FROM c GROUP BY 1, 2),
     medc AS (
       SELECT event_type, min(cents) AS med FROM (
         SELECT event_type, cents,
           sum(cnt) OVER (PARTITION BY event_type ORDER BY cents ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(cnt) OVER (PARTITION BY event_type) AS n
         FROM freq)
       WHERE cum * 2 >= n GROUP BY event_type),
     devfreq AS (
       SELECT f.event_type, abs(f.cents - m.med) AS dev,
         CAST(sum(f.cnt) AS BIGINT) AS cnt
       FROM freq f JOIN medc m USING (event_type)
       GROUP BY f.event_type, abs(f.cents - m.med)),
     madc AS (
       SELECT event_type, min(dev) AS mad FROM (
         SELECT event_type, dev,
           sum(cnt) OVER (PARTITION BY event_type ORDER BY dev ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(cnt) OVER (PARTITION BY event_type) AS n
         FROM devfreq)
       WHERE cum * 2 >= n GROUP BY event_type)
     SELECT c.event_id, c.event_type, c.cents,
       abs(c.cents - m.med) AS dev, m.med, d.mad
     FROM c JOIN medc m USING (event_type) JOIN madc d USING (event_type)
     WHERE abs(c.cents - m.med) * 10000 > d.mad * 44478"""

  val ThrottleMs = 60000L

  /** E24: rate-limit throttle — drop an event landing within 60 s of the
    * previous event of the same (user, type). One lag window clustered by
    * (user_id, event_type); the repartition below feeds exactly that
    * clustering so the window adds no second exchange. This is the batch
    * twin of streaming dedup-in-watermark with a time tolerance instead of
    * exact identity.
    */
  def eventsThrottle(spark: SparkSession, dir: String): DataFrame =
    eventsThrottleOf(Tables.events(spark, dir))

  private[graft] def eventsThrottleOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev.repartition(ev.sparkSession.sparkContext.defaultParallelism,
        col("user_id"), col("event_type"))
      .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .filter(col("prev_ms").isNull || col("ms") - col("prev_ms") > ThrottleMs)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
  }
  val eventsThrottleSql: String =
    s"""SELECT event_id, user_id, event_type, ts FROM (
       SELECT event_id, user_id, event_type, ts,
         epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts ASC, event_id ASC) AS gap_ms
       FROM events)
     WHERE gap_ms IS NULL OR gap_ms > $ThrottleMs"""

  /** E35: first-order Markov transition matrix over event types — the
    * "what do users do next" path-analysis primitive (feeds next-action
    * prediction and funnel design). One lag window on the user clustering
    * (the spread below feeds exactly that exchange) collapses immediately
    * into a types²-bounded aggregate; the per-source-state probability is
    * a window over that TINY (≤ types²-row) table, never the facts.
    * Probabilities in exact integer basis points so the gate is
    * engine-independent.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame =
    eventTransitionsOf(Tables.spread(Tables.events(spark, dir), "user_id"))

  /** The per-step pair extraction behind the matrix — (user, from, to, ts)
    * rows; also the batch side of the streaming-twin parity spec.
    */
  private[graft] def transitionPairsOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
  }

  private[graft] def eventTransitionsOf(ev: DataFrame): DataFrame = {
    val trans = transitionPairsOf(ev)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    trans.withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 10000 div n_from").as("p_bp"))
  }
  val eventTransitionsSql: String =
    """WITH t AS (
       SELECT user_id, event_type AS to_type,
         lag(event_type) OVER (PARTITION BY user_id
           ORDER BY ts ASC, event_id ASC) AS from_type
       FROM events),
     g AS (
       SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
       FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2)
     SELECT from_type, to_type, n,
       (n * 10000) // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_bp
     FROM g"""

  /** Conversion bar for the A/B readout: a "repeat purchaser" made ≥ this
    * many purchase events (every user in the testdata purchases at least
    * once, so plain did-purchase would have zero variance).
    */
  val AbMinPurchases = 10L

  /** E36: two-proportion z-test readout for a deterministic A/B split —
    * the experimentation primitive. Variant assignment is the same
    * content-keyed md5 bucket as Sampling (retry/partitioning/engine
    * independent — a re-run assigns every user identically); conversion =
    * user became a repeat purchaser (≥ AbMinPurchases purchase events).
    * The whole readout is one user-level aggregate (map-side combinable)
    * collapsed to a single row; z is computed from exact integer counts
    * through an identical IEEE expression tree on both engines and
    * quantized to 1e-4, with a zero-variance guard (degenerate
    * all-convert/none-convert slices yield NULL, not engine-dependent
    * NaN casts).
    */
  def abTestZtest(spark: SparkSession, dir: String): DataFrame =
    abTestZtestOf(Tables.spreadIfNarrow(Tables.events(spark, dir), "user_id"))

  private[graft] def abTestZtestOf(ev: DataFrame): DataFrame = {
    val users = ev.groupBy(col("user_id"))
      .agg(when(
        sum(when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L)))
          >= AbMinPurchases, lit(1L)).otherwise(lit(0L))
        .as("converted"))
      .withColumn("variant",
        conv(substring(md5(concat(col("user_id").cast("string"), lit(":ab"))), 1, 6), 16, 10)
          .cast("bigint") % 2)
    val agg = users.agg(
      sum(when(col("variant") === 0, lit(1L)).otherwise(lit(0L))).as("n_a"),
      sum(when(col("variant") === 1, lit(1L)).otherwise(lit(0L))).as("n_b"),
      sum(when(col("variant") === 0, col("converted")).otherwise(lit(0L))).as("conv_a"),
      sum(when(col("variant") === 1, col("converted")).otherwise(lit(0L))).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val p = (col("conv_a") + col("conv_b")).cast("double") / (col("n_a") + col("n_b"))
    val se = sqrt(p * (lit(1.0) - p) * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      when(se > 0, floor((pa - pb) / se * 10000 + 0.5).cast("bigint"))
        .otherwise(lit(null).cast("bigint")).as("z_e4"))
  }
  val abTestZtestSql: String =
    s"""WITH u AS (
       SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= $AbMinPurchases THEN 1 ELSE 0 END AS converted,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':ab'), 1, 6)
              AS BIGINT) % 2 AS variant
       FROM events GROUP BY user_id),
     a AS (
       SELECT
         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
       FROM u),
     z AS (
       SELECT n_a, n_b, conv_a, conv_b,
         sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
              * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
              * (1.0 / n_a + 1.0 / n_b)) AS se
       FROM a)
     SELECT n_a, n_b, conv_a, conv_b,
       CASE WHEN se > 0 THEN CAST(floor(
         (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
           / se * 10000 + 0.5) AS BIGINT)
       ELSE NULL END AS z_e4
     FROM z"""

  val HistBins = 20L

  /** E37: per-type equi-width value histogram — the distribution-profiling
    * pass behind data-quality dashboards and bin-packed visualizations.
    * Two passes over the facts, both map-side-combinable: a bounds
    * aggregate (types-row table, broadcast back) and the bin count
    * aggregate (output bounded by types × bins). Bin width is exact
    * integer cents arithmetic — width = ceil(span/bins) via
    * (hi−lo+bins) div bins — so edges are engine-identical; never a
    * per-type sort or a data-dependent number of passes.
    */
  def eventsHistogram(spark: SparkSession, dir: String): DataFrame =
    eventsHistogramOf(Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id"))

  private[graft] def eventsHistogramOf(ev0: DataFrame): DataFrame = {
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
    val ev = ev0.select(col("event_type"), cents.as("cents"))
    val bounds = ev.groupBy(col("event_type"))
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      .withColumn("width", expr(s"(hi - lo + $HistBins) div $HistBins"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("bin", expr("(cents - lo) div width"))
      .groupBy(col("event_type"), col("bin"), col("lo"), col("width"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("bin"),
        (col("lo") + col("bin") * col("width")).as("bin_lo"),
        (col("lo") + (col("bin") + 1) * col("width") - 1).as("bin_hi"),
        col("n"))
  }
  val eventsHistogramSql: String =
    s"""WITH c AS (
       SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
       FROM events),
     b AS (
       SELECT event_type, min(cents) AS lo, max(cents) AS hi,
         (max(cents) - min(cents) + $HistBins) // $HistBins AS width
       FROM c GROUP BY event_type)
     SELECT c.event_type, (c.cents - b.lo) // b.width AS bin,
       b.lo + ((c.cents - b.lo) // b.width) * b.width AS bin_lo,
       b.lo + ((c.cents - b.lo) // b.width + 1) * b.width - 1 AS bin_hi,
       CAST(count(*) AS BIGINT) AS n
     FROM c JOIN b USING (event_type)
     GROUP BY c.event_type, (c.cents - b.lo) // b.width, b.lo, b.width"""

  /** E39: week-over-week metric drift — per (event_type, week) volume and
    * mean value, plus the relative change vs the previous week: the
    * monitoring pass behind "did this feed shift" alerts (the time-series
    * sibling of E23's point anomalies). One map-side-combinable aggregate
    * to a types×weeks table; the lag window runs over that TINY table,
    * never the facts. Mean in integer micro-units ((cents·10⁴) div n) and
    * drift as (mean·10⁴ div prev) − 10⁴ — subtraction after a
    * non-negative division, so no engine can disagree on negative-operand
    * integer division; first week per type → NULL.
    */
  def metricDrift(spark: SparkSession, dir: String): DataFrame =
    metricDriftOf(Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id"))

  private[graft] def metricDriftOf(ev0: DataFrame): DataFrame = {
    val epoch = to_date(lit("2024-01-01"))
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
    val wk = ev0.select(col("event_type"),
        floor(datediff(to_date(col("ts")), epoch) / 7).cast("int").as("week"),
        cents.as("cents"))
      .groupBy(col("event_type"), col("week"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .withColumn("mean_micro", expr("(s * 10000) div n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("week").asc)
    wk.withColumn("prev_mean", lag(col("mean_micro"), 1).over(w))
      .select(col("event_type"), col("week"), col("n"), col("mean_micro"),
        when(col("prev_mean") > 0,
          expr("(mean_micro * 10000) div prev_mean") - 10000L)
          .otherwise(lit(null).cast("bigint")).as("delta_bp"))
  }
  val metricDriftSql: String =
    """WITH wk AS (
       SELECT event_type,
         CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7) AS INT) AS week,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS s
       FROM events GROUP BY 1, 2),
     m AS (
       SELECT event_type, week, n, (s * 10000) // n AS mean_micro,
         lag((s * 10000) // n) OVER (PARTITION BY event_type
           ORDER BY week ASC) AS prev_mean
       FROM wk)
     SELECT event_type, week, n, mean_micro,
       CASE WHEN prev_mean > 0
         THEN (mean_micro * 10000) // prev_mean - 10000
         ELSE NULL END AS delta_bp
     FROM m"""

  /** E40: per-type least-squares trend line (value vs day) — the
    * "is this metric drifting and how fast" readout behind capacity
    * planning and regression alerts, computed the way a 100 TB engine
    * must: ONE map-side-combinable aggregate collecting the OLS
    * sufficient statistics (n, Σx, Σy, Σxy, Σx²) per type — never a
    * per-type sort, never an ML-library fit, shuffle bounded by the
    * type catalog. Per-row products stay in BIGINT (day ≤ ~10³, cents
    * ≤ ~10⁶), sums and the closed-form slope/intercept run in exact
    * DECIMAL(38,0): numer = n·Σxy − Σx·Σy stays < 10³⁵ even at 10⁹
    * rows/type, so `slope_nano = numer·10⁹ div denom` is exact integer
    * arithmetic end-to-end — bit-identical across engines (DuckDB
    * mirrors in HUGEINT). Degenerate groups (single distinct day) emit
    * NULL slope/intercept rather than a divide-by-zero.
    */
  def eventsTrend(spark: SparkSession, dir: String): DataFrame =
    eventsTrendOf(Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id"))

  private[graft] def eventsTrendOf(ev0: DataFrame): DataFrame = {
    val epoch = to_date(lit("2024-01-01"))
    val d38 = "decimal(38,0)"
    val ev = ev0.select(col("event_type"),
        datediff(to_date(col("ts")), epoch).cast("long").as("x"),
        (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("y"))
    val stats = ev.groupBy(col("event_type")).agg(
      count(lit(1)).cast(d38).as("n"),
      sum(col("x")).cast(d38).as("sx"),
      sum(col("y")).cast(d38).as("sy"),
      sum((col("x") * col("y")).cast(d38)).as("sxy"),
      sum((col("x") * col("x")).cast(d38)).as("sxx"))
    stats
      .withColumn("numer", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("denom", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col("event_type"), col("n").cast("bigint").as("n"),
        when(col("denom") > 0,
          expr("(numer * 1000000000) div denom")).as("slope_nano"),
        when(col("denom") > 0,
          expr("((sy * sxx - sx * sxy) * 1000000000) div denom"))
          .as("intercept_nano"))
  }
  val eventsTrendSql: String =
    """WITH r AS (
       SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
       FROM events),
     s AS (
       SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(x * y) AS HUGEINT) AS sxy,
         CAST(sum(x * x) AS HUGEINT) AS sxx
       FROM r GROUP BY event_type)
     SELECT event_type, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx > 0
         THEN CAST(((n * sxy - sx * sy) * 1000000000)
                // (n * sxx - sx * sx) AS BIGINT) END AS slope_nano,
       CASE WHEN n * sxx - sx * sx > 0
         THEN CAST(((sy * sxx - sx * sxy) * 1000000000)
                // (n * sxx - sx * sx) AS BIGINT) END AS intercept_nano
     FROM s"""

  val RfmAnchor = "2024-02-01"

  /** E42: RFM segmentation (recency / frequency / monetary) — the classic
    * customer-scoring query: per purchasing user, days since last purchase
    * (against a fixed anchor date — a config in production, pinned here so
    * the result is reproducible), purchase count, and exact-cents spend,
    * each mapped to a quartile, concatenated into the 3-digit RFM segment.
    *
    * Quartile assignment deliberately reuses the D28 bounded-cardinality
    * pattern instead of ntile() over all users (an unpartitioned global
    * sort — the one-reducer trap at a billion users): each metric is
    * integer-quantized (days are already integral; spend quantizes to
    * WHOLE DOLLARS — the documented cardinality contract), ONE partial-agg
    * shuffle builds its value-frequency table, cumulative ranks run over
    * that TINY table, and the value→quartile maps broadcast back onto the
    * per-user frame. Ties share the quartile of the value's first rank
    * (quartile is a pure function of the value). Recency ranks DESCENDING
    * (fewer days = more recent = higher quartile); frequency and monetary
    * rank ascending. All arithmetic is exact integers; the facts shuffle
    * ONCE, by user_id.
    */
  def userRfm(spark: SparkSession, dir: String): DataFrame = {
    val anchor = to_date(lit(RfmAnchor))
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("bigint")
    val perUser = Tables.spread(Tables.events(spark, dir), "user_id")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d"), cents.as("cents"))
      .groupBy(col("user_id"))
      .agg(datediff(anchor, max(col("d"))).cast("bigint").as("r_days"),
        count(lit(1)).as("f_n"),
        sum(col("cents")).as("m_cents"))
      .withColumn("m_dollars", expr("m_cents div 100"))
      // barrier: four consumers (three quartile maps + the final join) —
      // without it each re-runs the events scan and the user aggregate
      .transform(graft.Checkpoints.cp)
    // value→quartile map from a value-frequency table (bounded by the
    // quantized domain, not by users); unpartitioned windows over the tiny
    // table are deliberate — same safety argument as quality_tiers
    def quartileMap(df: DataFrame, valueCol: String, asc: Boolean): DataFrame = {
      val ord = if (asc) col(valueCol).asc else col(valueCol).desc
      val byVal = Window.orderBy(ord)
      val all = Window.partitionBy()
      df.groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum_before", coalesce(
          sum(col("cnt")).over(byVal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum(col("cnt")).over(all))
        .select(col(valueCol),
          least(lit(4L), expr("cum_before * 4 div n") + 1).as(valueCol + "_q"))
    }
    val rq = quartileMap(perUser, "r_days", asc = false)
    val fq = quartileMap(perUser, "f_n", asc = true)
    val mq = quartileMap(perUser, "m_dollars", asc = true)
    perUser
      .join(broadcast(rq), Seq("r_days"))
      .join(broadcast(fq), Seq("f_n"))
      .join(broadcast(mq), Seq("m_dollars"))
      .select(col("user_id"), col("r_days"), col("f_n"), col("m_cents"),
        col("r_days_q"), col("f_n_q"), col("m_dollars_q"),
        (col("r_days_q") * 100 + col("f_n_q") * 10 + col("m_dollars_q")).as("rfm_segment"))
  }
  val userRfmSql: String = {
    def qm(src: String, v: String, ord: String) =
      s"""(SELECT $v, least(4, cum_before * 4 // n + 1) AS q FROM (
        SELECT $v, coalesce(sum(cnt) OVER (ORDER BY $v $ord
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
          sum(cnt) OVER () AS n
        FROM (SELECT $v, count(*) AS cnt FROM $src GROUP BY $v)))"""
    s"""WITH per_user AS (
      SELECT user_id,
        CAST(date_diff('day', max(CAST(ts AS DATE)), DATE '$RfmAnchor') AS BIGINT) AS r_days,
        count(*) AS f_n,
        CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS m_cents,
        CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) // 100 AS m_dollars
      FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    rq AS ${qm("per_user", "r_days", "DESC")},
    fq AS ${qm("per_user", "f_n", "ASC")},
    mq AS ${qm("per_user", "m_dollars", "ASC")}
    SELECT p.user_id, p.r_days, p.f_n, p.m_cents,
      CAST(rq.q AS BIGINT) AS r_days_q, CAST(fq.q AS BIGINT) AS f_n_q,
      CAST(mq.q AS BIGINT) AS m_dollars_q,
      CAST(rq.q * 100 + fq.q * 10 + mq.q AS BIGINT) AS rfm_segment
    FROM per_user p
    JOIN rq ON rq.r_days = p.r_days
    JOIN fq ON fq.f_n = p.f_n
    JOIN mq ON mq.m_dollars = p.m_dollars"""
  }
}
