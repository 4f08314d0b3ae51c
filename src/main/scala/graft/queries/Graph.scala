package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over relationship graphs derived from the fact tables.
  * The engine's second iterative-propagation family beside the dedup
  * connected components (Dedup.dedupComponents): numeric mass propagation
  * instead of min-label spreading.
  *
  * Scale posture: the co-order edge list is bounded by Σ per-order
  * (items choose 2) — linear in lineitem because order width is bounded
  * by contract (TPC-H ≤ 7) — and every PageRank round is one equality
  * join of the rank table onto the edges plus a map-side-combinable sum,
  * shuffling only by the item catalog key. Rounds are checkpointed so the
  * plan stays flat (same discipline as the CC loop). All rank arithmetic
  * is exact integer micro-units with explicit `div`, so the fixed-point
  * result is bit-identical across engines and the oracle can unroll the
  * identical computation.
  */
object Graph {

  /** Fixed iteration count: plenty for rank mass to mix on the dense
    * co-order graph (the spec asserts round-8 vs round-7 movement is
    * tiny); the oracle unrolls exactly this many rounds.
    */
  val PrIters = 8
  /** Rank mass scale: 1e12 micro-units spread over the node set keeps
    * per-node ranks ≫ rounding loss at any realistic catalog size while
    * (rank · 85) stays far inside a long.
    */
  val PrScale = 1000000000000L

  /** E38: PageRank over the part co-purchase graph — "which items anchor
    * the catalog": nodes are parts, an edge connects two parts that ever
    * appear in the same order (both directions, distinct). Damping 0.85
    * as exact integer arithmetic: each round
    * r'(v) = (15·(SCALE div N)) div 100 + Σ_{u→v} (r(u)·85) div (100·deg(u)).
    * Parts never co-ordered have no edges and drop from the node set (no
    * dangling-mass correction needed — the symmetric graph has no sinks).
    */
  def partPagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.spreadIfNarrow(Tables.lineitem(spark, dir), "l_orderkey")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = graft.Checkpoints.cp(
      li.select(col("ok"), col("pk").as("src"))
        .join(li.select(col("ok"), col("pk").as("dst")), Seq("ok"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct())
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    var ranks = deg.select(col("src").as("pk"), col("deg"))
      .crossJoin(broadcast(nNodes))
      .withColumn("rank", expr(s"$PrScale div n_nodes"))
    for (_ <- 1 to PrIters) {
      val contrib = ranks
        .join(edges, ranks("pk") === edges("src"))
        .select(col("dst"), expr("(rank * 85) div (100 * deg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      ranks = graft.Checkpoints.cp(
        ranks.join(contrib, ranks("pk") === contrib("dst"), "left")
          .select(col("pk"), col("deg"), col("n_nodes"),
            (expr(s"(15 * ($PrScale div n_nodes)) div 100")
              + coalesce(col("cin"), lit(0L))).as("rank")))
    }
    ranks.select(col("pk").as("partkey"), col("deg"), col("rank"))
  }

  val partPagerankSql: String = {
    val base = s"(15 * ($PrScale // n_nodes)) // 100"
    val iters = (1 to PrIters).map { i =>
      s"""r$i AS (
        SELECT p.pk, p.deg, p.n_nodes, $base + COALESCE(c.cin, 0) AS rank
        FROM r${i - 1} p LEFT JOIN (
          SELECT e.dst AS pk, CAST(sum((r.rank * 85) // (100 * r.deg)) AS BIGINT) AS cin
          FROM r${i - 1} r JOIN edges e ON r.pk = e.src
          GROUP BY e.dst) c USING (pk))"""
    }.mkString(",\n")
    s"""WITH li AS (SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    edges AS (
      SELECT DISTINCT a.pk AS src, b.pk AS dst
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk != b.pk),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
    r0 AS (SELECT src AS pk, deg, n_nodes, $PrScale // n_nodes AS rank FROM deg, n),
    $iters
    SELECT pk AS partkey, deg, rank FROM r$PrIters"""
  }
}
