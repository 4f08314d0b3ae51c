package graft

import java.nio.file.Files
import java.nio.charset.Charset
import graft.sources.CsvSource

/** CSV encoding-fallback specs (reference app.py:11-60). */
class CsvSourceSpec extends SparkSpecBase {

  private def write(bytes: Array[Byte]): String = {
    val dir = Files.createTempDirectory("graft-csv")
    Files.write(dir.resolve("data.csv"), bytes)
    dir.toString
  }

  test("plain utf-8 csv detected and read") {
    val path = write("id,name\n1,café\n2,plain\n".getBytes("UTF-8"))
    assert(CsvSource.detectEncoding(spark, path) == "UTF-8")
    val df = CsvSource.readWithFallback(spark, path)
    assert(df.count() == 2)
    assert(df.filter(df("name") === "café").count() == 1)
  }

  test("cp1252 bytes fall back past utf-8") {
    // 0xE9 = é in cp1252/latin1; invalid as a standalone UTF-8 byte
    val content = "id,name\n1,café\n".getBytes(Charset.forName("windows-1252"))
    val path = write(content)
    assert(CsvSource.detectEncoding(spark, path) != "UTF-8")
    val df = CsvSource.readWithFallback(spark, path)
    assert(df.count() == 1)
    assert(df.filter(df("name") === "café").count() == 1)
  }

  test("mixed-encoding directory: per-file probe, lossless union (cp1252 + utf-8)") {
    // one cp1252 part and one utf-8 part in the SAME directory — the
    // reference decodes per uploaded file (app.py:25-38); a whole-dir
    // single-encoding scan would mojibake the minority file
    val dir = Files.createTempDirectory("graft-csv-mixed")
    Files.write(dir.resolve("part-a.csv"),
      "id,name\n1,naïve café\n".getBytes(Charset.forName("windows-1252")))
    Files.write(dir.resolve("part-b.csv"),
      "id,name\n2,café ☕\n".getBytes("UTF-8")) // ☕ not encodable in cp1252
    Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray) // must be skipped
    val groups = CsvSource.detectEncodings(spark, dir.toString)
    assert(groups.size == 2, groups)
    val df = CsvSource.readWithFallback(spark, dir.toString)
    val names = df.collect().map(r => r.get(0).toString -> r.getString(1)).toMap
    assert(names == Map("1" -> "naïve café", "2" -> "café ☕"), names)
  }

  test("strict decode probe rejects invalid utf-8 and accepts latin1") {
    val bad = Array[Byte]('a', 0xE9.toByte, 'b')
    assert(!CsvSource.strictlyDecodes(bad, "UTF-8"))
    assert(CsvSource.strictlyDecodes(bad, "ISO-8859-1"))
  }

  test("csv export round-trips the capex pipeline output (app.py download path)") {
    import org.apache.spark.sql.functions._
    val p = graft.capex.CapexDerive.pipeline(spark, sfDir)
      // CSV has no types: compare over a stable string projection
      .select(col("rid"), col("RequestNo"), col("CompositePrimaryKey"),
        col("AssetItemAmount").cast("string").as("amount"))
    val dir = Files.createTempDirectory("graft-csv-out").resolve("out").toString
    CsvSource.writeCsv(p, dir, singleFile = true)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(parts.length == 1) // single downloadable file, like to_csv
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == p.count())
    assert(back.exceptAll(p).count() == 0)
    graft.capex.CapexDerive.clearCache()
  }
}
