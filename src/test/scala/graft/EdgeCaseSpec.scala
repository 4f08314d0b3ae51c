package graft

/** Degenerate-input robustness: a pipeline that 19 rules, window ranks,
  * iterative label propagation, and integer rate arithmetic all run over
  * must not explode when a partition/day/language slice is EMPTY — at
  * 100 TB empty slices are routine (a new source with no docs yet, a
  * filter that matches nothing). Every listed query must evaluate on an
  * all-empty dataset without throwing; row counts are whatever the
  * operator's semantics say (0 for per-row ops, 1 for global aggregates).
  */
class EdgeCaseSpec extends SparkSpecBase {

  private lazy val emptyDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty-sf").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // limit(0) of the RAW reads keeps physical schemas identical (events.ts
    // stays nanos-long so Tables.events' normalization applies unchanged)
    Tables.all.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  // Every declared query must survive the all-empty dataset — the battery
  // is the full SparkEntry catalog, not a curated subset, so a newly added
  // operator is robustness-covered by construction.
  private val fullBattery: Seq[String] = SparkEntry.queries.keys.toSeq.sorted


  test("every operator evaluates on an all-empty dataset without throwing") {
    fullBattery.foreach { name =>
      val n = try SparkEntry.queries(name)(spark, emptyDir).count()
      catch {
        case e: Throwable =>
          graft.capex.CapexDerive.clearCache()
          Checkpoints.releaseAll()
          fail(s"$name threw on empty input: $e")
      }
      assert(n >= 0)
      graft.capex.CapexDerive.clearCache()
      Checkpoints.releaseAll()
    }
  }

  // Keys/timestamps/embeddings survive; every other column is NULL — the
  // realistic "feed with missing fields" slice (a crawler that lost its
  // text extractor, an events topic with null payloads). Null payloads
  // must degrade to empty/zero results, never throw.
  private val keepCols: Map[String, Set[String]] = Map(
    "region"    -> Set("r_regionkey"),
    "nation"    -> Set("n_nationkey", "n_regionkey"),
    "customer"  -> Set("c_custkey", "c_nationkey"),
    "supplier"  -> Set("s_suppkey", "s_nationkey"),
    "part"      -> Set("p_partkey"),
    "orders"    -> Set("o_orderkey", "o_custkey", "o_orderdate"),
    "lineitem"  -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_shipdate"),
    "events"    -> Set("event_id", "ts", "user_id"),
    "documents" -> Set("doc_id", "source"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  private lazy val nullDir: String = {
    import org.apache.spark.sql.functions.{col, lit}
    val tmp = java.nio.file.Files.createTempDirectory("graft-null-sf").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      val keep = keepCols(t)
      val projected = df.schema.fields.map { f =>
        if (keep(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }
      df.select(projected.toIndexedSeq: _*)
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  test("every operator evaluates on null payload columns without throwing") {
    fullBattery.foreach { name =>
      val n = try SparkEntry.queries(name)(spark, nullDir).count()
      catch {
        case e: Throwable =>
          graft.capex.CapexDerive.clearCache()
          Checkpoints.releaseAll()
          fail(s"$name threw on null payloads: $e")
      }
      assert(n >= 0)
      graft.capex.CapexDerive.clearCache()
      Checkpoints.releaseAll()
    }
  }
}
