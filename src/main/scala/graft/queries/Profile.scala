package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-profiling operators — the ANALYZE-style table statistics and
  * referential-integrity audits an operator fleet runs before trusting a
  * new 100 TB drop. The reference pipeline implicitly assumes both (its
  * validation pass joins facts to the office dim and reports mismatches,
  * process_capex.py:1029-1090); these make the checks first-class and
  * table-generic.
  */
object Profile {

  /** Code-time column spec for the profiled fact: (name, kind). Kind picks
    * the engine-stable min/max rendering — int/str cast directly, doubles
    * go through DECIMAL(18,2) (both engines print '949.50'; a raw
    * double→string would diverge on scientific-notation thresholds), and
    * timestamps truncate to DATE (ISO text in both engines; sub-day
    * precision stays inside n_distinct, which hashes the full value).
    * Scala aggregate and DuckDB oracle are generated from this one list,
    * so the two engines can't drift column-wise.
    */
  private val LineitemCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
    "l_linenumber" -> "int", "l_quantity" -> "dbl",
    "l_extendedprice" -> "dbl", "l_discount" -> "dbl", "l_tax" -> "dbl",
    "l_returnflag" -> "str", "l_linestatus" -> "str", "l_shipdate" -> "ts")

  private def fmt(c: Column, kind: String): Column = kind match {
    case "dbl" => c.cast("decimal(18,2)").cast("string")
    case "ts"  => c.cast("date").cast("string")
    case _     => c.cast("string")
  }

  /** E43: per-column table profile of the lineitem fact — row count,
    * non-null count, exact distinct count, engine-stable min/max text.
    * The ingest-acceptance gate: a feed that suddenly ships 40% null
    * partkeys or a new enum value shows up as a diff of this frame, not
    * as a downstream incident.
    *
    * Plan: TWO column-pruned scans instead of one 12-way Expand. A
    * multi-column exact-distinct aggregate plans as Spark's grouping-set
    * Expand — every row replicated |cols|+1 times at FULL width through
    * one shuffle (measured 3.5 s at sf0.1). Here the base stats
    * (count/non-null/min/max) are one plain aggregate pass, and the NDV
    * pass stacks the columns into NARROW (col_name, value-as-text) pairs
    * map-side — the same |cols|× replication but 2 columns wide, and the
    * partial distinct dedups before the exchange, so the shuffle carries
    * ~distinct pairs, not 12× the table (measured 1.4 s — 2.5×). The
    * text mapping is injective per kind (ints/dates/strings trivially;
    * doubles via shortest-repr with −0.0 normalized to 0.0 by `+ 0.0` so
    * text distinctness matches SQL's 0.0 = −0.0), so counts equal the
    * native NDV the oracle computes. At 100 TB the second scan is the
    * cheap part (columnar, pruned); the documented cheaper-still path is
    * the E12 HLL digest at the cost of the oracle's exactness.
    */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.spreadIfNarrow(Tables.lineitem(spark, dir), "l_orderkey")
    val aggs: Seq[Column] = LineitemCols.flatMap { case (c, k) => Seq(
      count(col(c)).as(s"nn_$c"),
      fmt(min(col(c)), k).as(s"mn_$c"),
      fmt(max(col(c)), k).as(s"mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = LineitemCols.map { case (c, _) =>
      s"'$c', nn_$c, mn_$c, mx_$c"
    }.mkString(", ")
    val base = row.select(col("n_rows"), expr(
      s"stack(${LineitemCols.size}, $stackArgs)" +
        " AS (col_name, n_nonnull, min_str, max_str)"))
    val ndvArgs = LineitemCols.map { case (c, k) =>
      val v = if (k == "dbl") s"CAST(($c + 0.0) AS STRING)" else s"CAST($c AS STRING)"
      s"'$c', $v"
    }.mkString(", ")
    val ndv = df
      .select(expr(s"stack(${LineitemCols.size}, $ndvArgs) AS (col_name, v)"))
      .filter(col("v").isNotNull)
      .groupBy(col("col_name"), col("v")).agg(count(lit(1)))
      .groupBy(col("col_name")).agg(count(lit(1)).as("n_distinct"))
    base.join(ndv, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_str"), col("max_str"))
  }

  val tableStatsSql: String = {
    def sqlFmt(expr: String, kind: String): String = kind match {
      case "dbl" => s"CAST(CAST($expr AS DECIMAL(18,2)) AS VARCHAR)"
      case "ts"  => s"CAST(CAST($expr AS DATE) AS VARCHAR)"
      case _     => s"CAST($expr AS VARCHAR)"
    }
    val rows = LineitemCols.map { case (c, k) =>
      s"""SELECT '$c' AS col_name, (SELECT count(*) FROM lineitem) AS n_rows,
        CAST(count($c) AS BIGINT) AS n_nonnull,
        CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
        ${sqlFmt(s"min($c)", k)} AS min_str,
        ${sqlFmt(s"max($c)", k)} AS max_str
      FROM lineitem"""
    }
    rows.mkString("\nUNION ALL\n")
  }

  /** HLL relative standard deviation for the approx NDV twin — same 0.02
    * the E11 HLL twin uses; the gate bound is 5σ (10%) with an absolute
    * floor of 1.
    */
  val TsRsd = 0.02

  /** E43b (r7): the documented 100 TB NDV path as a first-class query —
    * the SAME per-column profile as E43 but with HLL++ approximate
    * distinct counts folded into the ONE base aggregate pass: a single
    * column-pruned scan computes count / non-null / min / max / NDV-sketch
    * per column with zero joins and zero extra scans (E43's exact form
    * pays a second scan whose shuffle carries Σ per-column distinct
    * pairs; here the sketch is fixed-size, partially-aggregable map-side
    * state — the same trade as E10/E11/E19b). This is the library form a
    * 100 TB ingest gate actually runs; estimates are
    * implementation-defined, so the driver gate runs the
    * `tableStatsApproxQuery` contract form below and the numeric bound is
    * spec-asserted against the exact twin.
    */
  def tableStatsApprox(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.spreadIfNarrow(Tables.lineitem(spark, dir), "l_orderkey")
    val aggs: Seq[Column] = LineitemCols.flatMap { case (c, k) => Seq(
      count(col(c)).as(s"nn_$c"),
      fmt(min(col(c)), k).as(s"mn_$c"),
      fmt(max(col(c)), k).as(s"mx_$c"),
      approx_count_distinct(col(c), TsRsd).as(s"nd_$c"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = LineitemCols.map { case (c, _) =>
      s"'$c', nn_$c, mn_$c, mx_$c, nd_$c"
    }.mkString(", ")
    row.select(col("n_rows"), expr(
      s"stack(${LineitemCols.size}, $stackArgs)" +
        " AS (col_name, n_nonnull, min_str, max_str, n_distinct_approx)"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct_approx"), col("min_str"), col("max_str"))
  }

  /** Gate-emitted form of E43b (the E10/E11/E19b sketch-twin pattern):
    * the deterministic profile columns hash-check against the exact
    * oracle, and the implementation-defined HLL estimate is emitted as
    * its CONTRACT — the 5σ relative-error boolean — which the oracle
    * asserts as literal TRUE. The exact twin joins in ONLY for the gate;
    * the library form above never rescans.
    */
  def tableStatsApproxQuery(spark: SparkSession, dir: String): DataFrame = {
    val a = tableStatsApprox(spark, dir)
      .select(col("col_name").as("ac"), col("n_distinct_approx"))
    tableStats(spark, dir).join(a, col("col_name") === col("ac"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_str"), col("max_str"),
        (abs(col("n_distinct_approx") - col("n_distinct")).cast("double")
          <= greatest(lit(1.0), lit(5 * TsRsd) * col("n_distinct")))
          .as("ndv_within_rel_err"))
  }

  val tableStatsApproxSql: String =
    s"""SELECT col_name, n_rows, n_nonnull, n_distinct, min_str, max_str,
      TRUE AS ndv_within_rel_err
    FROM ($tableStatsSql)"""

  /** Code-time relationship spec: (child table, fk col, parent table, pk
    * col). Both engines generate from this list.
    */
  private val Relationships: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** E44: referential-integrity audit across the star schema — per
    * relationship: child rows carrying a non-null FK, orphans (FK value
    * absent from the parent), and the orphan rate in exact basis points.
    * The join-health gate: a partial dim load or a fact feed running
    * ahead of its dimension shows up as a non-zero orphan_bp BEFORE a
    * downstream inner join silently drops the rows.
    *
    * Plan (r7 rewrite): ONE scan per child TABLE, not per relationship.
    * The pre-r7 form planned the 7 relationships as 7 independent joins,
    * so lineitem was scanned 3× (orderkey/partkey/suppkey) — at 100 TB
    * the three fact passes dominate the whole audit. Now each child
    * table's FK columns stack map-side into narrow (relationship, key)
    * pairs in a single pruned scan (lineitem reads its 3 key columns
    * once), a keyed partial aggregate collapses the pairs to
    * (relationship, key, cnt) BEFORE the exchange — the shuffle carries
    * ~distinct FK values, where the old form shuffled every child row —
    * and one left join against the union of per-relationship distinct
    * parent keys (each dim scanned pruned to its pk) settles orphanhood
    * for all 7 relationships in a single keyed join. No broadcast hint:
    * parent key sets are catalog-sized (they scale with the dataset), so
    * AQE sizes the join at runtime — the part_triangles lesson. A static
    * 7-row relationship frame left-joins the aggregate so a zero-child
    * relationship still reports (0, 0, 0) exactly as the oracle does.
    */
  def fkIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def relName(r: (String, String, String, String)): String =
      s"${r._1}.${r._2}->${r._3}.${r._4}"
    // relationships travel as INT ids through the wide shuffle (a 40-char
    // relationship string per fact row doubled the r7 rewrite's shuffle
    // bytes — measured 2.1 s vs 1.0 s at sf0.1); the id → name map is a
    // 7-row frame joined onto the final report only
    val relId: Map[(String, String, String, String), Int] =
      Relationships.zipWithIndex.toMap
    // one stacked scan per child table: (rel_id, fk-as-bigint)
    val children = Relationships.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (ct, rels) =>
        val stackArgs = rels.map { r =>
          s"${relId(r)}, CAST(${r._2} AS BIGINT)"
        }.mkString(", ")
        // spread before the CPU-bound stack+partial-agg: the local
        // single-file scan would otherwise run the whole child's work on
        // one core (no-op on a pre-split cluster scan; the shuffle is
        // pruned to the FK columns)
        Tables.spreadIfNarrow(Tables.table(spark, dir, ct), rels.head._2)
          .select(expr(s"stack(${rels.size}, $stackArgs) AS (rel_id, k)"))
          .filter(col("k").isNotNull)
      }.reduce(_.unionAll(_))
      .groupBy(col("rel_id"), col("k")).agg(count(lit(1)).as("cnt"))
    val parents = Relationships.map { case r @ (_, _, pt, pk) =>
      Tables.table(spark, dir, pt)
        .filter(col(pk).isNotNull)
        .select(lit(relId(r)).as("rel_id"), col(pk).cast("bigint").as("k"))
        .distinct()
        .withColumn("hit", lit(1))
    }.reduce(_.unionAll(_))
    val perRel = children.join(parents, Seq("rel_id", "k"), "left")
      .groupBy(col("rel_id"))
      .agg(sum(col("cnt")).as("c_child"),
        sum(when(col("hit").isNull, col("cnt")).otherwise(0L)).as("c_orphans"))
    Relationships.map(r => (relId(r), relName(r))).toDF("rid", "relationship")
      .join(perRel, col("rid") === col("rel_id"), "left")
      .select(col("relationship"),
        coalesce(col("c_child"), lit(0L)).as("n_child"),
        coalesce(col("c_orphans"), lit(0L)).as("n_orphans"))
      .withColumn("orphan_bp",
        when(col("n_child") === 0, lit(0L))
          .otherwise(expr("(10000 * n_orphans) div n_child")))
  }

  val fkIntegritySql: String = {
    val rows = Relationships.map { case (ct, fk, pt, pk) =>
      s"""SELECT '$ct.$fk->$pt.$pk' AS relationship,
        CAST(count(*) AS BIGINT) AS n_child,
        CAST(count(*) FILTER (WHERE p.pk IS NULL) AS BIGINT) AS n_orphans,
        CASE WHEN count(*) = 0 THEN 0
             ELSE CAST((10000 * count(*) FILTER (WHERE p.pk IS NULL))
                       // count(*) AS BIGINT) END AS orphan_bp
      FROM (SELECT $fk AS fk FROM $ct WHERE $fk IS NOT NULL) c
      LEFT JOIN (SELECT DISTINCT $pk AS pk FROM $pt WHERE $pk IS NOT NULL) p
        ON c.fk = p.pk"""
    }
    rows.mkString("\nUNION ALL\n")
  }
}
