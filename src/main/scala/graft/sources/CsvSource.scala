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
    * the first file under `path`. A trailing probe byte may split a
    * multi-byte sequence, so the last 4 bytes are dropped before decoding.
    */
  def detectEncoding(spark: SparkSession, path: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath).sortBy(_.getName).headOption.getOrElse(p)
      else p
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
    // a probe that stops before EOF may cut a multi-byte sequence mid-way —
    // trim the tail only then (probe >= file length means we saw it whole)
    val head = buf.take(if (n.toLong < fileLen) math.max(0, n - 4) else n)
    Encodings.find(strictlyDecodes(head, _)).getOrElse("ISO-8859-1")
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

  /** Read a CSV with the reference's encoding-fallback chain: detect on a
    * bounded head probe, then one lazy distributed scan. BOM ("utf-8-sig")
    * is handled by Spark's UTF-8 CSV path.
    */
  def readWithFallback(spark: SparkSession, path: String,
                       schema: Option[StructType] = None): DataFrame = {
    val enc = detectEncoding(spark, path)
    // Spark 4 limits CSV charsets to a small allow-list unless this is set;
    // windows-1252 needs the full JVM charset registry.
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    val base = spark.read
      .option("header", "true")
      .option("encoding", enc)
      .option("inferSchema", schema.isEmpty.toString)
      .option("mode", "PERMISSIVE")
    schema.map(base.schema).getOrElse(base).csv(path)
  }
}
