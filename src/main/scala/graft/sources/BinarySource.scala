package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F10: raw media ingestion via Spark's `binaryFile` source — the step that
  * turns a directory of image/audio/video files into the opaque-binary
  * media frame graft.llm.Multimodal consumes. Each file arrives as ONE row
  * (path, modificationTime, length, content) with the payload untouched;
  * metadata predicates (length, path glob) prune at the listing level via
  * pathGlobFilter / the length column, so oversized or foreign files never
  * reach an executor.
  *
  * At 100 TB: binaryFile splits by file (payloads are indivisible), so
  * parallelism = file count — the right model for media corpora (many
  * small-to-medium objects). The maxBytesPerFile-style batching a custom
  * reader would add is unnecessary: the decode step is already
  * partition-batched (Multimodal.decodeFeatures).
  */
object BinarySource {

  /** Read a directory of media files; optional glob keeps the scan to the
    * intended extensions (pushed into the file listing, not a post-filter).
    */
  def readMediaDir(spark: SparkSession, path: String,
                   glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** Adapt binaryFile rows to the Multimodal media-frame shape: a stable
    * 63-bit id from the file path (deterministic re-ingest), the payload
    * as-is, metadata derived from the byte length the same way
    * Multimodal.mediaFrame derives it from n_chars.
    */
  def toMediaFrame(files: DataFrame): DataFrame =
    files.select(
      (xxhash64(col("path")).bitwiseAND(lit(Long.MaxValue))).as("media_id"),
      col("content").as("payload"),
      (coalesce(col("length"), lit(0L)) % 640).cast("int").as("width"),
      ((coalesce(col("length"), lit(0L)) * 7) % 480).cast("int").as("height"))
}
