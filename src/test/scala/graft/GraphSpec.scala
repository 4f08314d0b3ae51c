package graft

import graft.queries.Graph

/** Semantic tests for the graph-analytics family: the integer PageRank is
  * recomputed driver-side with identical arithmetic (brute force) and
  * compared exactly, plus structural invariants (node set = co-ordered
  * parts, near-stationarity at the fixed iteration bound).
  */
class GraphSpec extends SparkSpecBase {

  test("part pagerank matches brute-force integer propagation exactly") {
    val out = Graph.partPagerank(spark, sfDir).collect()
      .map(r => r.getAs[Long]("partkey") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("rank")))).toMap
    Checkpoints.releaseAll()
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges: Set[(Long, Long)] = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).toSet
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSet
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size
    assert(n > 0 && out.size === n, "node set = parts with >=1 co-order partner")
    var rank: Map[Long, Long] = deg.keys.map(_ -> Graph.PrScale / n).toMap
    var prev = rank
    for (_ <- 1 to Graph.PrIters) {
      prev = rank
      val in = edges.toSeq.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => rank(u) * 85 / (100 * deg(u)) }.sum).toMap
      rank = rank.map { case (v, _) =>
        v -> (15L * (Graph.PrScale / n) / 100 + in.getOrElse(v, 0L))
      }
    }
    rank.foreach { case (v, r) =>
      assert(out(v)._1 === deg(v), s"deg($v)")
      assert(out(v)._2 === r, s"rank($v)")
    }
    // near-stationary at the fixed bound: the last round moved < 0.5% of
    // total mass (the iteration count is a convergence claim, not a guess)
    val moved = rank.map { case (v, r) => math.abs(r - prev(v)) }.sum.toDouble
    val mass = rank.values.sum.toDouble
    assert(moved / mass < 0.005, f"last round moved ${moved / mass}%.4f of mass")
  }
}
