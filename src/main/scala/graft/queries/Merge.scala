package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MERGE INTO / CDC-apply semantics: apply a change batch (inserts,
  * updates, deletes) to a keyed snapshot in one pass — the warehouse
  * maintenance operator behind every "apply the day's CDC feed" job.
  *
  * Scale posture: ONE full-outer equality join on the key — co-partitioned
  * with a key-bucketed target table (SURVEY §5), and AQE broadcasts the
  * delta when a day's changes are ≪ the snapshot (no hard hint: delta size
  * is data-dependent, same policy as dedup_incremental). No windows, no
  * driver state; the rewritten snapshot lands via the F-family sinks.
  */
object Merge {

  val InsertKeyOffset = 1000000L

  /** The deterministic change batch, synthesized from the target itself so
    * the operator is self-contained on the testdata (in production the
    * delta arrives from the CDC feed): deletes (key ≡ 0 mod 13), updates
    * (key ≡ 0 mod 7, not deleted → status 'X', price + 1.00), inserts
    * (key ≡ 0 mod 11 re-keyed past the keyspace → status 'N'). Conditions
    * are mutually exclusive per delta key, as MERGE requires.
    */
  private def delta(t: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    val updates = t.filter(k % 7 === 0 && k % 13 =!= 0).select(
      k.as("d_key"), lit("U").as("op"), col("o_custkey").as("d_custkey"),
      lit("X").as("d_status"), (col("o_totalprice") + 1.0).as("d_totalprice"),
      col("o_orderdate").as("d_date"), col("o_orderpriority").as("d_priority"))
    val deletes = t.filter(k % 13 === 0).select(
      k.as("d_key"), lit("D").as("op"), lit(null).cast("bigint").as("d_custkey"),
      lit(null).cast("string").as("d_status"), lit(null).cast("double").as("d_totalprice"),
      lit(null).cast(t.schema("o_orderdate").dataType).as("d_date"),
      lit(null).cast("string").as("d_priority"))
    val inserts = t.filter(k % 11 === 0).select(
      (k + InsertKeyOffset).as("d_key"), lit("I").as("op"),
      col("o_custkey").as("d_custkey"), lit("N").as("d_status"),
      col("o_totalprice").as("d_totalprice"), col("o_orderdate").as("d_date"),
      col("o_orderpriority").as("d_priority"))
    updates.unionByName(deletes).unionByName(inserts)
  }

  /** E25: the merged snapshot — matched deletes drop, matched updates take
    * the delta payload, unmatched delta rows insert, everything else passes
    * through.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.spreadIfNarrow(Tables.orders(spark, dir), "o_orderkey")
    val applied = when(col("op") === "U" || col("op") === "I", true).otherwise(false)
    t.join(delta(t), col("o_orderkey") === col("d_key"), "full")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("o_orderkey"), col("d_key")).as("o_orderkey"),
        when(applied, col("d_custkey")).otherwise(col("o_custkey")).as("o_custkey"),
        when(applied, col("d_status")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
        when(applied, col("d_totalprice")).otherwise(col("o_totalprice")).as("o_totalprice"),
        when(applied, col("d_date")).otherwise(col("o_orderdate")).as("o_orderdate"),
        when(applied, col("d_priority")).otherwise(col("o_orderpriority")).as("o_orderpriority"))
  }
  val mergeUpsertSql: String =
    s"""WITH u AS (
      SELECT o_orderkey AS d_key, 'U' AS op, o_custkey AS d_custkey,
             'X' AS d_status, o_totalprice + 1.0 AS d_totalprice,
             o_orderdate AS d_date, o_orderpriority AS d_priority
      FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 != 0),
    d AS (
      SELECT o_orderkey AS d_key, 'D' AS op, CAST(NULL AS BIGINT) AS d_custkey,
             CAST(NULL AS VARCHAR) AS d_status, CAST(NULL AS DOUBLE) AS d_totalprice,
             CAST(NULL AS TIMESTAMP) AS d_date, CAST(NULL AS VARCHAR) AS d_priority
      FROM orders WHERE o_orderkey % 13 = 0),
    i AS (
      SELECT o_orderkey + $InsertKeyOffset AS d_key, 'I' AS op,
             o_custkey AS d_custkey, 'N' AS d_status,
             o_totalprice AS d_totalprice, o_orderdate AS d_date,
             o_orderpriority AS d_priority
      FROM orders WHERE o_orderkey % 11 = 0),
    delta AS (SELECT * FROM u UNION ALL SELECT * FROM d UNION ALL SELECT * FROM i)
    SELECT coalesce(t.o_orderkey, dl.d_key) AS o_orderkey,
      CASE WHEN dl.op IN ('U','I') THEN dl.d_custkey ELSE t.o_custkey END AS o_custkey,
      CASE WHEN dl.op IN ('U','I') THEN dl.d_status ELSE t.o_orderstatus END AS o_orderstatus,
      CASE WHEN dl.op IN ('U','I') THEN dl.d_totalprice ELSE t.o_totalprice END AS o_totalprice,
      CASE WHEN dl.op IN ('U','I') THEN dl.d_date ELSE t.o_orderdate END AS o_orderdate,
      CASE WHEN dl.op IN ('U','I') THEN dl.d_priority ELSE t.o_orderpriority END AS o_orderpriority
    FROM orders t FULL JOIN delta dl ON t.o_orderkey = dl.d_key
    WHERE dl.op IS NULL OR dl.op != 'D'"""

  /** E30: snapshot diff — the INVERSE of E25: given yesterday's and
    * today's keyed snapshots, emit the change feed (op ∈ I/U/D) that
    * turns one into the other. One full-outer key join; unchanged rows
    * (null-safe full-payload struct equality) are dropped, so the output
    * is bounded by the churn, not the table. Self-verifying on the
    * testdata: diffing the base snapshot against E25's merged snapshot
    * must recover exactly the delta E25 synthesized (spec-asserted).
    * Deletes carry the key with null payload (the CDC-feed convention).
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val oldS = Tables.spreadIfNarrow(Tables.orders(spark, dir), "o_orderkey")
      .select(col("o_orderkey").as("k"),
        struct(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority")).as("o"))
    val newS = mergeUpsert(spark, dir)
      .select(col("o_orderkey").as("k"),
        struct(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority")).as("n"))
    oldS.join(newS, Seq("k"), "full")
      .filter(!(col("o") <=> col("n")))
      .select(
        when(col("o").isNull, "I").when(col("n").isNull, "D").otherwise("U").as("op"),
        col("k").as("o_orderkey"),
        col("n.o_custkey").as("o_custkey"),
        col("n.o_orderstatus").as("o_orderstatus"),
        col("n.o_totalprice").as("o_totalprice"),
        col("n.o_orderdate").as("o_orderdate"),
        col("n.o_orderpriority").as("o_orderpriority"))
  }
  val snapshotDiffSql: String =
    s"""WITH merged AS ($mergeUpsertSql)
    SELECT
      CASE WHEN o.o_orderkey IS NULL THEN 'I'
           WHEN n.o_orderkey IS NULL THEN 'D' ELSE 'U' END AS op,
      coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      n.o_custkey, n.o_orderstatus, n.o_totalprice, n.o_orderdate,
      n.o_orderpriority
    FROM orders o FULL JOIN merged n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR (o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate,
           o.o_orderpriority)
          IS DISTINCT FROM
          (n.o_custkey, n.o_orderstatus, n.o_totalprice, n.o_orderdate,
           n.o_orderpriority)"""
}
