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
}
