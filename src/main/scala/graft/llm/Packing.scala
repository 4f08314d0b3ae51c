package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deterministic sequence packing for pretraining-corpus assembly
  * (SURVEY.md §2.D18): concatenate documents in a fixed order and index
  * which fixed-size token window each document starts in — the standard
  * "concat then chunk" layout (documents may cross chunk boundaries).
  *
  * Scale posture: a single global order would serialize into one
  * partition, so packing runs per SHARD — a content-keyed md5 bucket
  * (same idiom as Sampling.bucket) — and the window's running sum
  * clusters by shard: one exchange, PackShards-way parallel, each shard's
  * state is a running long. Sequence ids are (shard, chunk) pairs so
  * shards never coordinate; at 100 TB you raise PackShards to the write
  * parallelism you want and the plan is unchanged.
  */
object Packing {

  val PackBudget = 128L
  val PackShards = 16

  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val shard =
      conv(substring(md5(concat(col("doc_id").cast("string"), lit(":pack"))), 1, 6), 16, 10)
        .cast("bigint") % PackShards
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.spreadIfNarrow(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("bigint").as("n_tokens"))
      .withColumn("shard", shard)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // the chunk this document STARTS in, and its offset within the chunk
      // (integer `div`, not `/`: Column / is double division and would
      // lose exactness once per-shard running totals pass 2^53)
      .withColumn("seq_id", expr(s"(cum - n_tokens) div $PackBudget"))
      .withColumn("seq_offset", (col("cum") - col("n_tokens")) % PackBudget)
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("seq_id"), col("seq_offset"))
  }

  val packSequencesSql: String =
    s"""SELECT doc_id, shard, n_tokens,
      CAST((cum - n_tokens) // $PackBudget AS BIGINT) AS seq_id,
      CAST((cum - n_tokens) % $PackBudget AS BIGINT) AS seq_offset
    FROM (
      SELECT doc_id, shard, n_tokens,
             sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pack'), 1, 6)
                    AS BIGINT) % $PackShards AS shard,
               CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
        FROM documents))"""
}
