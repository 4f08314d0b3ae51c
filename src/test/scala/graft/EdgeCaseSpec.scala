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

  // Mega-key skew battery (r6): at 100 TB a handful of keys owning most of
  // a table is routine (a bot user, a crawler-dominant source, a default
  // part id). One user owns ~50% of events, one source ~90% of documents,
  // one part ~50% of lineitems; every catalog query must still complete —
  // no OOM, no hash-explosion — on the test heap.
  private lazy val skewDir: String = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val tmp = java.nio.file.Files.createTempDirectory("graft-skew-sf").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      val out = t match {
        case "events" =>
          df.withColumn("user_id",
            when(col("event_id") % 2 === 0, lit(7L)).otherwise(col("user_id")))
        case "documents" =>
          df.withColumn("source",
            when(col("doc_id") % 10 =!= 0, lit("megasource")).otherwise(col("source")))
        case "lineitem" =>
          df.withColumn("l_partkey",
            when(col("l_linenumber") % 2 === 0, lit(1L)).otherwise(col("l_partkey")))
        case _ => df
      }
      // multi-file layout (8 splits → 8 map tasks): AQE can only split a
      // skewed reduce partition along MAPPER boundaries, so a single-file
      // table is unsplittable regardless of how skewed the key is — and a
      // 100 TB table is never one split
      out.repartition(8).write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  test("every operator evaluates on a mega-key skewed dataset without throwing") {
    fullBattery.foreach { name =>
      val n = try SparkEntry.queries(name)(spark, skewDir).count()
      catch {
        case e: Throwable =>
          graft.capex.CapexDerive.clearCache()
          Checkpoints.releaseAll()
          fail(s"$name threw on mega-key skew: $e")
      }
      assert(n >= 0)
      graft.capex.CapexDerive.clearCache()
      Checkpoints.releaseAll()
    }
  }

  // AQE's skew-split is the engine's runtime answer for mega-key SHUFFLE
  // joins (the planned answer is salting — events_salted_join). Prove it
  // fires on this data, under the rule's real applicability envelope
  // (established against the Spark 4.1 OptimizeSkewedJoin source):
  //  - the join's BOTH inputs must be direct shuffle outputs — the rule
  //    matches SMJ(Sort(stage), Sort(stage)) only, so an aggregate between
  //    sort and shuffle (e.g. a groupBy'd dim side) disqualifies the join;
  //  - exchanges must be planner-inserted (ENSURE_REQUIREMENTS) — AQE
  //    refuses to split user-requested repartitions, so the exhibit must
  //    not use Tables.spread (the planned answer for skew under explicit
  //    layouts is salting);
  //  - a skewed reduce partition splits along MAPPER boundaries, so the
  //    scan must arrive as multiple splits (skewDir writes 8 files; the
  //    file confs below stop Spark packing those small files into one map
  //    task — at real scale a table is never one split);
  //  - thresholds are scaled to the spec-sized input.
  test("AQE splits the mega-user shuffle partition (skew=true observable)") {
    import org.apache.spark.sql.functions.col
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.files.maxPartitionBytes",
      "spark.sql.files.openCostInBytes")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1024")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val ev = Tables.events(spark, skewDir).select(col("user_id"), col("ts"))
      val purchases = Tables.events(spark, skewDir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("value"))
      val joined = ev.join(purchases, Seq("user_id"))
      // collect() (not count()) — count builds a SEPARATE QueryExecution,
      // so the inspected plan would never have run; collect finalizes the
      // very QueryExecution we assert on (spec-sized rows, bounded)
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "expected AQE skew-split marker in:\n" + plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
