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
    *
    * spreadIfNarrow, not spread: everything downstream is map-only
    * (mapPartitions decode / resize projection / frame explode) with no
    * clustering requirement, so an unconditional repartition would shuffle
    * the binary payload column — the heaviest bytes in the table — for
    * nothing. On a cluster the scan arrives multi-split and no exchange is
    * added; only the single-file local testdata gets spread for core use.
    */
  def mediaFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.spreadIfNarrow(Tables.documents(spark, dir), "doc_id").select(
      col("doc_id").as("media_id"),
      coalesce(col("text"), lit("")).cast("binary").as("payload"),
      // null metadata degrades to a zero-area frame (fail-open, same
      // posture as the CSV/JSONL sources), never a null in the typed row
      (coalesce(col("n_chars"), lit(0L)) % 640).cast("int").as("width"),
      ((coalesce(col("n_chars"), lit(0L)) * 7) % 480).cast("int").as("height"))

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

  val ResizeBox = 224

  /** D12b: metadata-side resize — fit (width, height) into a 224-box
    * preserving aspect (the real image op would also transform the payload;
    * the dimension math IS the schema contract a resize stage exports).
    * Pure integer-exact Column math, mirrored in the oracle.
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    val m = greatest(col("width"), col("height"), lit(1))
    // floor division on both sides: DuckDB CAST(double AS INT) rounds
    // half-to-even while Spark truncates, so the int cast must land on an
    // integral double
    mediaFrame(spark, dir).select(
      col("media_id"), col("width"), col("height"),
      greatest(lit(1), floor(col("width") * ResizeBox / m).cast("int")).as("out_w"),
      greatest(lit(1), floor(col("height") * ResizeBox / m).cast("int")).as("out_h"))
  }
  val mmResizeSql: String =
    s"""SELECT media_id, width, height,
      greatest(1, CAST(floor(width * $ResizeBox / m) AS INT)) AS out_w,
      greatest(1, CAST(floor(height * $ResizeBox / m) AS INT)) AS out_h
    FROM (SELECT doc_id AS media_id,
        CAST(coalesce(n_chars, 0) % 640 AS INT) AS width,
        CAST((coalesce(n_chars, 0) * 7) % 480 AS INT) AS height,
        greatest(CAST(coalesce(n_chars, 0) % 640 AS INT),
                 CAST((coalesce(n_chars, 0) * 7) % 480 AS INT), 1) AS m
      FROM documents)"""

  val FrameBytes = 100
  val MaxFrames = 4

  /** D12c: frame sampling — treat the payload as a "video" of
    * ceil-ish n_bytes/100 frames and sample ≤4 evenly-spaced frame indices,
    * one output row per sampled frame with the frame's leading byte as the
    * stub feature. The explode shape (media row → frame rows) is exactly
    * what a real frame extractor feeds downstream.
    */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val base = mediaFrame(spark, dir)
      .withColumn("n_bytes", length(col("payload")).cast("int"))
      .withColumn("n_frames", floor(col("n_bytes") / FrameBytes).cast("int") + 1)
      .withColumn("hx", hex(col("payload")))
    base
      .withColumn("frame_idx", explode(array_distinct(
        transform(sequence(lit(0), lit(MaxFrames - 1)),
          i => floor(i * (col("n_frames") - 1) / (MaxFrames - 1)).cast("int")))))
      .select(col("media_id"), col("n_frames"), col("frame_idx"),
        when(col("frame_idx") * FrameBytes < col("n_bytes"),
          conv(substring(col("hx"), col("frame_idx") * FrameBytes * 2 + 1, lit(2)), 16, 10)
            .cast("int"))
          .otherwise(-1).as("frame_byte"))
  }
  val mmFrameSampleSql: String =
    s"""WITH m AS (
      SELECT doc_id AS media_id,
             octet_length(encode(coalesce(text, ''))) AS n_bytes,
             CAST(floor(octet_length(encode(coalesce(text, ''))) / $FrameBytes) AS INT) + 1 AS n_frames,
             hex(encode(coalesce(text, ''))) AS hx
      FROM documents),
    fr AS (
      SELECT media_id, n_bytes, n_frames, hx,
             unnest(list_distinct(list_transform(range(0, $MaxFrames),
               i -> CAST(floor(i * (n_frames - 1) / ${MaxFrames - 1}) AS INT)))) AS frame_idx
      FROM m)
    SELECT media_id, n_frames, frame_idx,
           CASE WHEN frame_idx * $FrameBytes < n_bytes
                THEN CAST('0x' || substr(hx, frame_idx * $FrameBytes * 2 + 1, 2) AS INT)
                ELSE -1 END AS frame_byte
    FROM fr"""
  val mmPipelineSql: String =
    """SELECT doc_id AS media_id,
      octet_length(encode(coalesce(text, ''))) AS n_bytes,
      CASE WHEN octet_length(encode(coalesce(text, ''))) > 0
           THEN CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT) ELSE -1 END AS first_byte,
      CAST(coalesce(n_chars, 0) % 640 AS BIGINT)
        * CAST((coalesce(n_chars, 0) * 7) % 480 AS BIGINT) AS area
    FROM documents"""

  /** D12d: media exact dedup — content-hash dedup over the opaque binary
    * payload, the first dedup every multimodal ingest runs (byte-identical
    * images re-crawled under different ids; run BEFORE any decode because
    * it needs none). One md5 projection over the payload column + ONE
    * partial-agg shuffle keyed by the 16-byte digest — the shuffle carries
    * digests, never payload bytes, and is bounded by distinct contents.
    * Keeper = min media_id (same deterministic rule as D1). Unlike the
    * decode stages this op is fully REAL (no stub): the digest is over
    * the actual payload bytes.
    */
  def mmDedup(spark: SparkSession, dir: String): DataFrame =
    mediaFrame(spark, dir)
      .select(col("media_id"), md5(col("payload")).as("payload_md5"),
        length(col("payload")).cast("bigint").as("n_bytes"))
      .groupBy(col("payload_md5"))
      .agg(min(col("media_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"),
        max(col("n_bytes")).as("n_bytes"))
  val mmDedupSql: String =
    // md5(VARCHAR) hashes the string's UTF-8 bytes — the exact bytes the
    // Spark side's binary payload carries (DuckDB's md5 has no BLOB overload)
    """SELECT md5(coalesce(text, '')) AS payload_md5,
      min(doc_id) AS keeper_id,
      CAST(count(*) AS BIGINT) AS n_copies,
      CAST(max(octet_length(encode(coalesce(text, '')))) AS BIGINT) AS n_bytes
    FROM documents GROUP BY 1"""
}
