package graft

import graft.queries.Graph

/** Semantic tests for the graph-analytics family: the integer PageRank is
  * recomputed driver-side with identical arithmetic (brute force) and
  * compared exactly, plus structural invariants (node set = co-ordered
  * parts, near-stationarity at the fixed iteration bound).
  */
class GraphSpec extends SparkSpecBase {

  test("part pagerank matches brute-force integer propagation exactly") {
    val rows = Graph.partPagerank(spark, sfDir).collect()
    val out = rows
      .map(r => r.getAs[Long]("partkey") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("rank")))).toMap
    val outStop = rows.map(_.getAs[Int]("stop_round")).distinct
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
    // replay the convergence contract exactly: stop after the first round
    // that moved < PrScale/PrEpsInv of total mass, cap at PrIters
    var stop = Graph.PrIters
    var round = 1
    var converged = false
    var lastMoved = 0L
    while (round <= Graph.PrIters && !converged) {
      val prev = rank
      val in = edges.toSeq.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => rank(u) * 85 / (100 * deg(u)) }.sum).toMap
      rank = rank.map { case (v, _) =>
        v -> (15L * (Graph.PrScale / n) / 100 + in.getOrElse(v, 0L))
      }
      lastMoved = rank.map { case (v, r) => math.abs(r - prev(v)) }.sum
      if (lastMoved * Graph.PrEpsInv < Graph.PrScale) { converged = true; stop = round }
      round += 1
    }
    assert(outStop.toSeq === Seq(stop), s"stop_round: got ${outStop.toSeq}, want $stop")
    rank.foreach { case (v, r) =>
      assert(out(v)._1 === deg(v), s"deg($v)")
      assert(out(v)._2 === r, s"rank($v)")
    }
    // the stop rule IS the stationarity claim: the emitted round moved
    // < 0.1% of total mass (or the cap was hit with < 0.5% residual)
    val mass = rank.values.sum.toDouble
    assert(lastMoved / mass < 0.005, f"last round moved ${lastMoved / mass}%.4f of mass")
  }

  test("part communities match driver-side union-find on the thresholded graph") {
    val out = Graph.partCommunities(spark, sfDir).collect()
      .map(r => r.getAs[Long]("partkey") ->
        ((r.getAs[Long]("community_id"), r.getAs[Long]("community_size")))).toMap
    Checkpoints.releaseAll()
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // canonical a<b pairs with co-order support >= TriMinSupport
    val support = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= Graph.TriMinSupport).keys.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    support.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comps = parent.keys.toSeq.groupBy(find)
    assert(out.size === parent.keys.size, "node set = support-thresholded parts")
    comps.foreach { case (_, members) =>
      val lbl = members.min
      members.foreach { v =>
        assert(out(v)._1 === lbl, s"community($v)")
        assert(out(v)._2 === members.size.toLong, s"size($v)")
      }
    }
  }

  test("triangle census: hand-built graph with known triangles and support cut") {
    import spark.implicits._
    // orders 1,2 both contain {p1,p2,p3} (every pair support 2 → kept);
    // order 3 adds {p4,p5} once (support 1 → cut); orders 4,5 contain
    // {p1,p4} twice (kept edge, but p4 closes no triangle)
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 4L), (3L, 5L),
      (4L, 1L), (4L, 4L),
      (5L, 1L), (5L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val out = Graph.partTrianglesOf(li).collect()
      .map(r => r.getAs[Long]("partkey") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_triangles"),
          r.getAs[Long]("clustering_bp")))).toMap
    Checkpoints.releaseAll()
    // node set: p5 has no surviving edge and drops; p4 survives via (p1,p4)
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(2L) === ((2L, 1L, 10000L)), "p2: closed pair → coeff 1.0")
    assert(out(3L) === ((2L, 1L, 10000L)))
    // p1: deg 3 (p2,p3,p4), one triangle → 2·1·10⁴ div (3·2) = 3333
    assert(out(1L) === ((3L, 1L, 3333L)))
    assert(out(4L) === ((1L, 0L, 0L)), "p4: no triangle, deg 1 → coeff 0")
  }

  test("triangle census matches brute force on the testdata co-order graph") {
    val out = Graph.partTriangles(spark, sfDir).collect()
      .map(r => r.getAs[Long]("partkey") -> r.getAs[Long]("n_triangles")).toMap
    Checkpoints.releaseAll()
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val support = li.groupBy(_._1).values.toSeq.flatMap { rows =>
      val ps = rows.map(_._2).toSeq
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).toMap
    // iterator first: .collect on a Map of pair-valued results would
    // rebuild a Map keyed by the pair's first element, collapsing edges
    val edges = support.iterator.collect {
      case (e, s) if s >= Graph.TriMinSupport => e
    }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val bruteTri = adj.map { case (v, nb) =>
      v -> nb.toSeq.combinations(2).count {
        case Seq(a, b) => edges((a min b, a max b))
      }.toLong
    }
    assert(out.keySet === adj.keySet)
    bruteTri.foreach { case (v, t) => assert(out(v) === t, s"triangles($v)") }
    assert(bruteTri.values.sum > 0, "testdata graph should contain triangles")
  }

  test("ccLabelsOf: iteration-cap hit is observable, convergence clears it") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a path graph whose min-id vertex has eccentricity > MaxCcIters:
    // one-hop min-label spreading CANNOT finish inside the cap, and the
    // r7 contract is that this is REPORTED (ccCapHit), not silent
    val n = graft.llm.Dedup.MaxCcIters + 5
    val chain = (0L until n.toLong).sliding(2).map(s => (s(0), s(1))).toSeq
    val sym = chain ++ chain.map(_.swap)
    val labels = graft.llm.Dedup.ccLabelsOf(
      sym.toDF("src", "dst").repartition(2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(graft.llm.Dedup.ccCapHit,
      "a chain longer than the cap must set the cap-hit flag")
    // labels are k-hop-ball minima: vertex i holds max(0, i - cap)
    val cap = graft.llm.Dedup.MaxCcIters
    (0L until n.toLong).foreach { i =>
      assert(labels(i) === math.max(0L, i - cap), s"label($i)")
    }
    Checkpoints.releaseAll()
    // boundary: eccentricity EXACTLY the cap converges in the final
    // permitted round — the loop exits on the round budget, but the
    // labels ARE the component minima and the probe must clear the flag
    val bn = cap + 1
    val bchain = (0L until bn.toLong).sliding(2).map(s => (s(0), s(1))).toSeq
    val blabels = graft.llm.Dedup.ccLabelsOf(
      (bchain ++ bchain.map(_.swap)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!graft.llm.Dedup.ccCapHit,
      "exact-boundary convergence must NOT report a cap hit")
    (0L until bn.toLong).foreach(i => assert(blabels(i) === 0L))
    Checkpoints.releaseAll()
    // a dense graph converges inside the cap and clears the flag
    val clique = (for (a <- 0L until 5L; b <- 0L until 5L if a != b)
      yield (a, b)).toDF("src", "dst")
    val cl = graft.llm.Dedup.ccLabelsOf(clique).collect()
    assert(!graft.llm.Dedup.ccCapHit, "converged run must clear the flag")
    assert(cl.forall(_.getLong(1) === 0L))
    Checkpoints.releaseAll()
  }
}
