package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream analytics (SURVEY.md §2.E4-E6): JSON extraction, tumbling
  * time windows (the batch mirror of the streaming agg), and gap-based
  * sessionization. Sessionization is a lag+cumsum window — one shuffle by
  * user_id, no driver state; the streaming twin lives in
  * graft.streaming.StreamOps.
  */
object Events {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** E4: JSON property extraction + aggregation per event type. */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"),
        sum(col("k")).as("sum_k"))
  val eventsJsonSql: String =
    """SELECT event_type, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type"""

  /** E5: tumbling 1-hour window aggregation (batch mirror of the streaming
    * windowed agg — same plan shape Structured Streaming incrementalizes).
    */
  def streamWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id")
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
  val streamWindowAggSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2"""

  val SessionGapMinutes = 30

  /** E6: gap-based sessionization — a session breaks after a >30 min silence
    * per user. lag → boundary flag → running sum = session index.
    */
  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    // spread by the window's partition key: parallel parse AND the window
    // reuses the clustering instead of shuffling again
    Tables.spread(Tables.events(spark, dir), "user_id")
      .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ms").isNull ||
          col("ms") - col("prev_ms") > SessionGapMinutes * 60L * 1000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("t_start"),
        max(col("ts")).as("t_end"), dsum(col("value")).as("sum_value"))
  }
  val streamSessionizeSql: String =
    s"""WITH flagged AS (
      SELECT user_id, event_id, ts, value,
        CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                  OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > ${SessionGapMinutes * 60L * 1000L}
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
    sess AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, count(*) AS n_events, min(ts) AS t_start,
           max(ts) AS t_end,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_id"""

  /** Path prefix length and report size for the session-journey ranking. */
  val PathLen = 5
  val TopPaths = 20

  /** E46: top session journeys — the most common event-type PATHS (first
    * PathLen steps of each gap-sessionized visit), ranked by session
    * count: the "how do users actually move" report product analytics
    * runs beside the funnel (E21 counts a FIXED journey; this surfaces
    * the journeys you didn't declare).
    *
    * Scale shape: ONE shuffle by user_id serves both the session window
    * and the per-session path fold (the groupBy reuses the window's
    * clustering); the path alphabet is event-type^PathLen bounded, so the
    * count aggregate's exchange carries partially-aggregated path counts,
    * and the top-N is a TakeOrderedAndProject (per-partition heads, never
    * a global sort — D29's contract). Paths fold deterministically: the
    * per-session list sorts by (epoch-ms, event_id) — event_id is unique,
    * so the order is total — and null types coalesce to '' on both
    * engines before joining with '>'.
    */
  def eventsTopPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val sess = Tables.spread(Tables.events(spark, dir), "user_id")
      .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ms").isNull ||
          col("ms") - col("prev_ms") > SessionGapMinutes * 60L * 1000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = sess.groupBy(col("user_id"), col("session_id"))
      .agg(array_join(
        slice(
          transform(
            array_sort(collect_list(struct(col("ms"), col("event_id"),
              coalesce(col("event_type"), lit("")).as("t")))),
            x => x.getField("t")),
          1, PathLen),
        ">").as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(TopPaths)
  }

  val eventsTopPathsSql: String =
    s"""WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
        CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                  OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > ${SessionGapMinutes * 60L * 1000L}
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
    sess AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged),
    paths AS (
      SELECT user_id, session_id,
        array_to_string(
          list_slice(list(coalesce(event_type, '')
            ORDER BY epoch_ms(ts) ASC, event_id ASC), 1, $PathLen),
          '>') AS path
      FROM sess GROUP BY user_id, session_id)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path ASC LIMIT $TopPaths"""

  val HopMinutes = 15
  val HopWindowMinutes = 60

  /** E16: hopping (sliding) window aggregation — 1-hour windows advancing
    * every 15 min, the smoothing shape dashboards/alerting run. Stated as
    * the same explicit slot expansion Spark's own `window(ts, "1 hour",
    * "15 minutes")` plans (each event replicates into window/hop = 4
    * slots map-side via explode — an Expand, not a join), then ONE
    * partial-agg shuffle by (slot, type). The streaming twin
    * (StreamOps.hopWindowAgg) is the native sliding window with a
    * watermark; spec-matched to this mirror.
    */
  def hopWindowAgg(spark: SparkSession, dir: String): DataFrame = {
    val hopMs = HopMinutes * 60L * 1000L
    val nSlots = HopWindowMinutes / HopMinutes
    val ms = unix_millis(col("ts").cast("timestamp"))
    // slots whose [start, start+60min) contain ts: the nSlots hops ending
    // at the one beginning at floor(ts/hop)*hop
    val slotStarts = sequence(
      (floor(ms / hopMs) - (nSlots - 1)) * hopMs, floor(ms / hopMs) * hopMs,
      lit(hopMs))
    Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id")
      .withColumn("slot_ms", explode(slotStarts))
      .groupBy(timestamp_millis(col("slot_ms")).cast("timestamp_ntz").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
  }
  val hopWindowAggSql: String = {
    val hopMs = HopMinutes * 60L * 1000L
    val nSlots = HopWindowMinutes / HopMinutes
    s"""SELECT make_timestamp(slot_ms * 1000) AS window_start, event_type,
      count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT event_type, value,
        unnest(range((CAST(floor(epoch_ms(ts) / $hopMs) AS BIGINT) - ${nSlots - 1}) * $hopMs,
                     CAST(floor(epoch_ms(ts) / $hopMs) AS BIGINT) * $hopMs + 1,
                     $hopMs)) AS slot_ms
      FROM events)
    GROUP BY 1, 2"""
  }

  /** Modular split for the incremental-aggregation demonstration: every
    * 20th event plays "today's arrivals" (mirrors Dedup.IncrementalBatchMod).
    */
  val AggBatchMod = 20

  /** E17: incremental aggregate maintenance — refresh a per-(type, day)
    * aggregate table from a new batch WITHOUT rescanning history: the
    * stored aggregate (materialized, as a warehouse table would be) merges
    * with the batch's partial aggregate by summing the mergeable states.
    * The refresh's shuffle is bounded by |groups|, not |corpus| — the only
    * corpus-linear work ever done was the original build; each day adds
    * O(batch) scan + O(groups) merge. Works for any decomposable aggregate
    * (count/sum here; min/max/HLL/bloom states the same way) — the
    * materialized-view-maintenance twin of D22's incremental dedup.
    */
  def aggIncremental(spark: SparkSession, dir: String): DataFrame = {
    def partial(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("bigint")).as("sum_cents"))
    val ev = Tables.spreadIfNarrow(Tables.events(spark, dir), "event_id")
    val isBatch = col("event_id") % AggBatchMod === 0
    // the stored aggregate: built once, materialized (stands in for the
    // warehouse table a production refresh reads back)
    val stored = graft.Checkpoints.cp(partial(ev.filter(!isBatch)))
    val fresh = partial(ev.filter(isBatch))
    stored.unionByName(fresh)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n_events")).as("n_events"), sum(col("sum_cents")).as("sum_cents"))
  }
  /** Oracle states the aggregate directly over all events — the merged
    * refresh must be indistinguishable from a full recompute.
    */
  val aggIncrementalSql: String =
    """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events,
      CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1, 2"""

  val RollingFrame = 4 // current row + 4 preceding

  /** E14: rolling time-series features — per-user moving sum/count over the
    * last 5 events plus the delta vs the previous event. ONE shuffle by
    * user_id (the spread pre-clusters it, as sessionize does) and every
    * feature shares the same window sort; the frame is row-bounded so state
    * per key during the sort-based window evaluation is O(frame), not
    * O(history). Money stays integer cents so both engines agree bitwise
    * (a double moving sum would depend on frame addition order).
    */
  def eventsRolling(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val frame = byUser.rowsBetween(-RollingFrame, Window.currentRow)
    Tables.spread(Tables.events(spark, dir), "user_id")
      .withColumn("cents", round(col("value") * 100).cast("bigint"))
      .select(
        col("event_id"), col("user_id"), col("ts"), col("cents"),
        sum(col("cents")).over(frame).as("mov_cents"),
        count(lit(1)).over(frame).as("n_win"),
        (col("cents") - lag(col("cents"), 1).over(byUser)).as("delta_cents"))
  }
  val eventsRollingSql: String =
    s"""SELECT event_id, user_id, ts, CAST(round(value * 100, 0) AS BIGINT) AS cents,
      CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER w AS BIGINT) AS mov_cents,
      CAST(count(*) OVER w AS BIGINT) AS n_win,
      CAST(round(value * 100, 0) AS BIGINT)
        - lag(CAST(round(value * 100, 0) AS BIGINT)) OVER wo AS delta_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN $RollingFrame PRECEDING AND CURRENT ROW),
           wo AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"""

  /** E15: SCD2 interval construction — turn a change-event log into type-2
    * dimension history: each event opens a validity interval that the
    * user's next event closes (NULL valid_to = current). The standard
    * CDC→warehouse pattern stated as ONE window (lead over the user
    * clustering), no self-join, no driver state; the same shuffle the
    * sessionizer uses.
    */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.spread(Tables.events(spark, dir), "user_id")
      .select(
        col("user_id"), col("event_id"), col("event_type").as("state"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(byUser).as("valid_to"),
        lead(col("ts"), 1).over(byUser).isNull.as("is_current"))
  }
  val scd2IntervalsSql: String =
    """SELECT user_id, event_id, event_type AS state, ts AS valid_from,
      lead(ts) OVER w AS valid_to,
      lead(ts) OVER w IS NULL AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"""

  /** E3 companion already in Analytics; E2's q3/q5 likewise. */

  /** E28: time-series gap filling (sparse → dense resampling): every user
    * gets one row per hour of their active span, zero-filled where no
    * events landed — the densification step dashboards and forecasting
    * models need before windowed features make sense. Hours are integer
    * epoch-hours (engine-agnostic bucket math). Shape: per-user span
    * aggregate → map-side sequence explode (fan-out bounded by span hours,
    * not events) → co-partitioned left join of the hourly counts; all
    * three legs share the user_id clustering.
    */
  def eventsGapFill(spark: SparkSession, dir: String): DataFrame = {
    val eh = (unix_millis(col("ts").cast("timestamp")) / lit(3600000L))
      .cast("bigint")
    val h = Tables.spread(Tables.events(spark, dir), "user_id")
      .select(col("user_id"), eh.as("epoch_hour"))
    val span = h.groupBy(col("user_id"))
      .agg(min(col("epoch_hour")).as("h0"), max(col("epoch_hour")).as("h1"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("h0"), col("h1"))).as("epoch_hour"))
    val counts = h.groupBy(col("user_id"), col("epoch_hour"))
      .agg(count(lit(1)).as("n"))
    grid.join(counts, Seq("user_id", "epoch_hour"), "left")
      .select(col("user_id"), col("epoch_hour"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }
  val eventsGapFillSql: String =
    """WITH h AS (
       SELECT user_id, epoch_ms(ts) // 3600000 AS epoch_hour FROM events),
     span AS (
       SELECT user_id, min(epoch_hour) AS h0, max(epoch_hour) AS h1
       FROM h GROUP BY user_id),
     grid AS (
       SELECT user_id, unnest(range(h0, h1 + 1)) AS epoch_hour FROM span),
     c AS (
       SELECT user_id, epoch_hour, count(*) AS n
       FROM h GROUP BY user_id, epoch_hour)
     SELECT g.user_id, g.epoch_hour, coalesce(c.n, 0) AS n_events
     FROM grid g LEFT JOIN c USING (user_id, epoch_hour)"""

  /** E29: time-weighted average value per user (TWAP): each value holds
    * until the next event; weights are whole seconds (integer floor of the
    * gap), the weighted sum runs in exact integer cents·seconds (bounded
    * by max_cents · span_seconds — long-safe for any realistic span), and
    * the result is integer micro-value units ((Σ cents·dt)·10⁴ div Σ dt).
    * One lead window over the user clustering; single-event users (zero
    * total hold time) are excluded by contract.
    */
  def eventsTwap(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.spread(Tables.events(spark, dir), "user_id")
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast("decimal(18,2)") * 100).cast("bigint").as("cents"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
      .withColumn("dt_s",
        ((lead(col("ms"), 1).over(byUser) - col("ms")) / lit(1000L)).cast("bigint"))
      .filter(col("dt_s").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("cents") * col("dt_s")).as("sum_cd"),
        sum(col("dt_s")).as("sum_dt"))
      .filter(col("sum_dt") > 0)
      .select(col("user_id"), col("sum_dt"),
        expr("sum_cd * 10000 div sum_dt").as("twap_micro"))
  }
  val eventsTwapSql: String =
    """WITH x AS (
       SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         (lead(epoch_ms(ts)) OVER (PARTITION BY user_id
            ORDER BY ts ASC, event_id ASC) - epoch_ms(ts)) // 1000 AS dt_s
       FROM events),
     agg AS (
       -- DuckDB sums integers into HUGEINT; pin BIGINT to match Spark
       SELECT user_id, CAST(sum(cents * dt_s) AS BIGINT) AS sum_cd,
              CAST(sum(dt_s) AS BIGINT) AS sum_dt
       FROM x WHERE dt_s IS NOT NULL GROUP BY user_id)
     SELECT user_id, sum_dt,
       CAST((sum_cd * 10000) // sum_dt AS BIGINT) AS twap_micro
     FROM agg WHERE sum_dt > 0"""

  /** E34: click attribution — every (click, purchase) pair of the same
    * user with the purchase inside the click's 1-hour attribution window.
    * Batch twin of `StreamOps.clickAttributionStream` (spec-matched
    * set-equal): ONE equality shuffle on user_id (the exact key the
    * streaming join's state store uses), range predicate applied inside
    * the co-partitioned join — never an unbounded inequality join. Pair
    * fan-out is bounded by a user's clicks×purchases inside one hour;
    * corpora with pathological hot users route through
    * `Relational.saltedJoin` (E18) with the same predicate.
    */
  def clickAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.spread(Tables.events(spark, dir), "user_id")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").cast("timestamp").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").cast("timestamp").as("purchase_ts"))
    clicks.join(purchases, Seq("user_id"))
      .filter(col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }
  val clickAttributionSql: String =
    """WITH c AS (SELECT event_id AS click_id, user_id,
         CAST(ts AS TIMESTAMP) AS click_ts FROM events WHERE event_type = 'click'),
     p AS (SELECT event_id AS purchase_id, user_id,
         CAST(ts AS TIMESTAMP) AS purchase_ts FROM events WHERE event_type = 'purchase')
     SELECT c.user_id, click_id, purchase_id, click_ts, purchase_ts
     FROM c JOIN p ON c.user_id = p.user_id
      AND purchase_ts >= click_ts
      AND purchase_ts <= click_ts + INTERVAL 1 HOUR"""
}
