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

  /** E3 companion already in Analytics; E2's q3/q5 likewise. */
}
