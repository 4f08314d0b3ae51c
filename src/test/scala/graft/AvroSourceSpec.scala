package graft

import org.apache.spark.sql.functions._
import graft.sources.AvroSource

/** Avro round-trip + the scan contracts a row-major format can honor:
  * ReadSchema pruning (only requested fields deserialize) and operator
  * parity — every engine operator must run unchanged over an Avro table.
  */
class AvroSourceSpec extends SparkSpecBase {

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft-test-avro")
      .resolve("documents").toString
    AvroSource.writeAvro(Tables.documents(spark, sfDir), p)
    p
  }
  private def ensureWritten(): Unit = { val _ = path }

  test("avro round-trip preserves rows and values") {
    ensureWritten()
    val src = Tables.documents(spark, sfDir)
    val back = AvroSource.readAvro(spark, path)
    assert(back.count() == src.count())
    assert(back.select("doc_id", "lang", "n_chars")
      .exceptAll(src.select("doc_id", "lang", "n_chars")).count() == 0)
  }

  test("avro scan prunes the read schema to the projection") {
    ensureWritten()
    val q = AvroSource.readAvro(spark, path)
      .filter(col("n_chars") > 100)
      .select("doc_id", "n_chars")
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("doc_id") && read.contains("n_chars") && !read.contains("text"), read)
  }

  test("operators run unchanged over the avro table") {
    ensureWritten()
    val agg = AvroSource.readAvro(spark, path).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables.documents(spark, sfDir).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == expect)
    // a window op too (sort-sensitive path, not just hash-agg)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id").asc)
    val top = AvroSource.readAvro(spark, path)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("lang", "doc_id").collect().map(_.toSeq.mkString(",")).toSet
    val topP = Tables.documents(spark, sfDir)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select("lang", "doc_id").collect().map(_.toSeq.mkString(",")).toSet
    assert(top == topP)
  }

  test("embeddings (float array column) survive avro round-trip") {
    val p = java.nio.file.Files.createTempDirectory("graft-test-avro")
      .resolve("embeddings").toString
    AvroSource.writeAvro(Tables.embeddings(spark, sfDir), p)
    val back = AvroSource.readAvro(spark, p)
    val src = Tables.embeddings(spark, sfDir)
    assert(back.count() == src.count())
    val a = back.select(col("vec_id"), element_at(col("embedding"), 1))
      .collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    val b = src.select(col("vec_id"), element_at(col("embedding"), 1))
      .collect().map(r => r.getLong(0) -> r.getFloat(1)).toMap
    assert(a == b)
  }
}
