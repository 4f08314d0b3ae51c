package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.JsonlSource

/** JSONL source/sink specs: lossless round-trip of the documents corpus and
  * fail-open handling of corrupt lines under a locked schema.
  */
class JsonlSourceSpec extends SparkSpecBase {

  test("documents round-trip through JSONL losslessly") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, sfDir)
    JsonlSource.writeJsonl(docs, dir)
    val back = JsonlSource.readJsonl(spark, dir, Some(docs.schema))
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("corrupt lines land in _corrupt_record, good lines survive") {
    val dir = Files.createTempDirectory("graft-jsonl-bad")
    Files.write(dir.resolve("data.jsonl"),
      """{"doc_id": 1, "text": "ok"}
        |this is not json
        |{"doc_id": 2, "text": "also ok"}
        |""".stripMargin.getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    // Spark disallows filtering the raw scan on ONLY the corrupt-record
    // column — materialize the parse first (its own documented contract)
    val df = JsonlSource.readJsonl(spark, dir.toString, Some(schema)).cache()
    try {
      assert(df.filter(col("_corrupt_record").isNull).count() == 2)
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    } finally df.unpersist()
  }
}
