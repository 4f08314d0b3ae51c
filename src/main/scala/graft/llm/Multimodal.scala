package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.D, D12): media payloads travel
  * as opaque `binary` columns with typed metadata; decode/feature-extract
  * runs partition-batched over a typed Dataset. The decode itself is a
  * STUB (no image/audio libs in this environment — it derives features
  * deterministically from the payload bytes), but the Spark-side plumbing —
  * schema, encoders, batch shape, partition iteration — is real and the
  * output is fully oracle-checkable because the stub is deterministic.
  *
  * At 100 TB: payloads stay columnar (parquet binary), metadata predicates
  * push down, and the batched mapPartitions is the same shape a real
  * decoder (or GPU feature extractor) would use.
  */
object Multimodal {

  case class MediaRow(media_id: Long, payload: Array[Byte], width: Int, height: Int)
  case class MediaFeatures(media_id: Long, n_bytes: Int, first_byte: Int,
                           area: Long, batch_size: Int)

  val BatchSize = 64

  /** Media frame derived from documents: text bytes as the opaque payload,
    * metadata from deterministic fields.
    */
  def mediaFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir), "doc_id").select(
      col("doc_id").as("media_id"),
      coalesce(col("text"), lit("")).cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      ((col("n_chars") * 7) % 480).cast("int").as("height"))

  /** Batched "decode": groups each partition's rows into fixed-size batches
    * (the shape a vectorized decoder needs) and emits per-row features.
    * Deterministic stand-in for the real decoder.
    */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // a real implementation would hand `batch` to a vectorized decoder
        batch.map { r =>
          MediaFeatures(
            media_id = r.media_id,
            n_bytes = r.payload.length,
            first_byte = if (r.payload.nonEmpty) r.payload(0) & 0xff else -1,
            area = r.width.toLong * r.height,
            batch_size = batch.size)
        }
      }
    }
  }

  /** D12 query: end-to-end binary→features pipeline. batch_size depends on
    * partitioning, so it is dropped from the comparable output.
    */
  def mmPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaFrame(spark, dir).as[MediaRow]
    decodeFeatures(media).toDF()
      .select(col("media_id"), col("n_bytes"), col("first_byte"), col("area"))
  }

  /** The decode stub is deterministic over the payload, so the oracle can
    * recompute it relationally. first_byte is byte-derived on both sides
    * (hex of the UTF-8 encoding, not the Unicode codepoint) so parity holds
    * for non-ASCII leading characters too.
    */
  val mmPipelineSql: String =
    """SELECT doc_id AS media_id,
      octet_length(encode(coalesce(text, ''))) AS n_bytes,
      CASE WHEN octet_length(encode(coalesce(text, ''))) > 0
           THEN CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT) ELSE -1 END AS first_byte,
      CAST(n_chars % 640 AS BIGINT) * CAST((n_chars * 7) % 480 AS BIGINT) AS area
    FROM documents"""
}
