package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction}

/** CSV ingestion with encoding fallback (reference app.py:11-60: utf-8 →
  * utf-8-sig → cp1252 → latin1, then permissive last resort).
  *
  * Spark-native shape: encoding detection strictly decodes a bounded head
  * sample of each file (Spark's own decoder silently replaces bad bytes, so
  * a probe must be a strict java.nio decode); the chosen encoding then
  * drives one ordinary distributed CSV scan. Nothing but the ≤64 KiB probe
  * ever touches the driver.
  */
object CsvSource {

  /** Reference fallback order. latin1 accepts any byte sequence, making it
    * the terminal structural fallback, like the reference's errors=replace. */
  val Encodings: Seq[String] = Seq("UTF-8", "windows-1252", "ISO-8859-1")

  val ProbeBytes = 64 * 1024

  def strictlyDecodes(bytes: Array[Byte], charset: String): Boolean = {
    val dec = Charset.forName(charset).newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try { dec.decode(ByteBuffer.wrap(bytes)); true }
    catch { case _: Exception => false }
  }

  /** First encoding in the chain that strictly decodes the head sample of
    * ONE file. A trailing probe byte may split a multi-byte sequence, so
    * when the probe stops before EOF the last 4 bytes are dropped before
    * decoding (probe >= file length means the whole file was seen).
    */
  private def probeFile(fs: org.apache.hadoop.fs.FileSystem,
                        file: org.apache.hadoop.fs.Path): String = {
    val fileLen = fs.getFileStatus(file).getLen
    val in = fs.open(file)
    val buf = new Array[Byte](ProbeBytes)
    // read() may legally return short of EOF — loop to readFully semantics
    val n = try {
      var off = 0
      var r = 0
      while (off < ProbeBytes && r >= 0) {
        r = in.read(buf, off, ProbeBytes - off)
        if (r > 0) off += r
      }
      off
    } finally in.close()
    val head = buf.take(if (n.toLong < fileLen) math.max(0, n - 4) else n)
    Encodings.find(strictlyDecodes(head, _)).getOrElse("ISO-8859-1")
  }

  /** Data files under `path` (one file → itself), minus the `_`/`.`-prefixed
    * metadata files Spark's own file index skips.
    */
  private def dataFiles(spark: SparkSession,
                        path: String): (org.apache.hadoop.fs.FileSystem,
                                        Seq[org.apache.hadoop.fs.Path]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath)
          .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
          .sortBy(_.getName).toSeq
      else Seq(p)
    (fs, files)
  }

  /** Per-file probe of every file under `path`, grouped by detected
    * encoding (reference decodes per uploaded file, app.py:25-38 — a
    * directory mixing cp1252 and utf-8 parts must not mojibake the
    * minority files). Driver work is bounded: one ≤64 KiB strict decode
    * per file, no row data.
    */
  def detectEncodings(spark: SparkSession, path: String): Map[String, Seq[String]] = {
    val (fs, files) = dataFiles(spark, path)
    files.map(f => probeFile(fs, f) -> f.toString)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
  }

  /** Majority single-encoding view (kept for single-file callers): the
    * encoding of the first file under `path`.
    */
  def detectEncoding(spark: SparkSession, path: String): String = {
    val (fs, files) = dataFiles(spark, path)
    files.headOption.map(probeFile(fs, _)).getOrElse("UTF-8")
  }

  /** CSV export matching the reference's download path (app.py:117-123,
    * `df.to_csv(index=False)`): header row, UTF-8, no index column.
    * `singleFile = true` coalesces to one part (the reference emits one
    * downloadable file); leave false at scale for a distributed write.
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** Read a CSV with the reference's encoding-fallback chain: per-file
    * head probes, files grouped by detected encoding, ONE distributed scan
    * per encoding, unioned — so a directory mixing cp1252 and utf-8 parts
    * round-trips losslessly (the uniform-directory common case stays a
    * single scan). BOM ("utf-8-sig") is handled by Spark's UTF-8 CSV path.
    * With no explicit schema, the first (alphabetically-first-file) group's
    * inferred schema anchors the union and the other groups cast to it —
    * the same type unification the reference's per-file decode + concat
    * performs.
    */
  def readWithFallback(spark: SparkSession, path: String,
                       schema: Option[StructType] = None): DataFrame = {
    // Spark 4 limits CSV charsets to a small allow-list unless this is set;
    // windows-1252 needs the full JVM charset registry.
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    def scan(enc: String, sch: Option[StructType], files: Seq[String]): DataFrame = {
      val base = spark.read
        .option("header", "true")
        .option("encoding", enc)
        .option("inferSchema", sch.isEmpty.toString)
        .option("mode", "PERMISSIVE")
      sch.map(base.schema).getOrElse(base).csv(files: _*)
    }
    val groups = detectEncodings(spark, path).toSeq
      .sortBy { case (_, files) => files.min } // deterministic anchor group
    groups match {
      case Seq() => scan("UTF-8", schema, Seq(path))
      case Seq((enc, _)) => scan(enc, schema, Seq(path)) // uniform: one scan of the dir
      case (enc0, files0) +: rest =>
        val head = scan(enc0, schema, files0)
        rest.foldLeft(head) { case (acc, (enc, files)) =>
          val part = scan(enc, schema.orElse(Some(head.schema)), files)
          acc.unionByName(part)
        }
    }
  }
}
