package graft

import org.apache.spark.sql.functions._
import graft.sources.OrcSource

/** ORC round-trip + the same scan contracts the parquet plans are audited
  * for: pushed filters and pruned read schema.
  */
class OrcSourceSpec extends SparkSpecBase {

  // per-run temp dir: a fixture from an older code/schema version must
  // never be reused across runs (it would validate against stale files)
  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft-test-orc")
      .resolve("documents").toString
    OrcSource.writeOrc(Tables.documents(spark, sfDir), p)
    p
  }

  private def ensureWritten(): Unit = { val _ = path }

  test("orc round-trip preserves rows and values") {
    ensureWritten()
    val src = Tables.documents(spark, sfDir)
    val back = OrcSource.readOrc(spark, path)
    assert(back.count() == src.count())
    assert(back.select("doc_id", "lang", "n_chars")
      .exceptAll(src.select("doc_id", "lang", "n_chars")).count() == 0)
  }

  test("orc scan pushes filters and prunes columns like parquet") {
    ensureWritten()
    val q = OrcSource.readOrc(spark, path)
      .filter(col("n_chars") > 100)
      .select("doc_id", "n_chars")
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("GreaterThan(n_chars"), pushed)
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("doc_id") && read.contains("n_chars") && !read.contains("text"), read)
    // and an operator runs unchanged over the ORC table
    val agg = OrcSource.readOrc(spark, path).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = Tables.documents(spark, sfDir).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == expect)
  }
}
